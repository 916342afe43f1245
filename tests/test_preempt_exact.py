"""Exact preempt→resume (VERDICT r2 #7): a SIGTERM landing MID-epoch and
a subsequent --resume must produce BIT-IDENTICAL parameters to an
uninterrupted run — the checkpoint records a batch cursor, resume replays
only the unseen remainder, the engine's global step (and with it the
step-rng folding and step-based schedules) is restored, and a partial
epoch never contributes to the SWA average.

Preemption is injected deterministically via BRATS21_PREEMPT_AT_STEP
(cli/main_train.py fault hook) instead of a racy timed SIGTERM."""

import glob
import os

import jax
import numpy as np
import pytest

from brats21_tpu.cli.main_train import main as train_main
from brats21_tpu.learning.checkpoint import load_checkpoint


def _argv(data, save, swa):
    argv = [
        "--train_data_path", data, "--save_path", save,
        "--model", "equiunet", "--width", "4", "--criterion", "dice",
        "--optimizer", "ranger", "--decay_type", "flat_cosine",
        "--learning_rate", "1e-3",
        "--epochs", "2", "--val_frequency", "1",
        "--patch_size", "16", "16", "16", "--batch_size", "1",
        "--num_workers", "0", "--fold", "0",
        "--no_tensorboard", "--no_amp", "--no_full_name", "-v",
    ]
    if swa:
        argv += ["--swa_start", "1"]
    return argv


@pytest.mark.parametrize("swa", [False, True])
def test_mid_epoch_preempt_resume_bit_identical(tmp_path, synthetic_case,
                                                monkeypatch, swa):
    # ---- uninterrupted run
    save_a = str(tmp_path / f"uninterrupted_{swa}")
    monkeypatch.delenv("BRATS21_PREEMPT_AT_STEP", raising=False)
    train_main(_argv(synthetic_case, save_a, swa))
    last_a = load_checkpoint(os.path.join(save_a, "last_model"))

    # ---- preempted mid-epoch-2 (4 train cases/epoch; stop at step 6 =
    # epoch 2, batch 2), then resume
    save_b = str(tmp_path / f"preempted_{swa}")
    monkeypatch.setenv("BRATS21_PREEMPT_AT_STEP", "6")
    train_main(_argv(synthetic_case, save_b, swa))
    run_b = save_b
    mid = load_checkpoint(os.path.join(run_b, "last_model"))
    assert int(np.asarray(mid["epoch"])) == 1
    assert int(np.asarray(mid["batch_cursor"])) == 2
    assert int(np.asarray(mid["step"])) == 6

    monkeypatch.delenv("BRATS21_PREEMPT_AT_STEP", raising=False)
    train_main(_argv(synthetic_case, run_b, swa)
               + ["--resume", os.path.join(run_b, "last_model")])
    last_b = load_checkpoint(os.path.join(run_b, "last_model"))

    # ---- bit-identical: params, optimizer state, step count, SWA params
    assert int(np.asarray(last_a["step"])) == int(np.asarray(last_b["step"]))
    for key in ("params", "opt_state") + (("swa_params",) if swa else ()):
        la = jax.tree_util.tree_leaves(last_a[key])
        lb = jax.tree_util.tree_leaves(last_b[key])
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{key} differs after preempt+resume (swa={swa})")
    if swa:
        assert int(np.asarray(last_a["swa_n"])) \
            == int(np.asarray(last_b["swa_n"]))


def test_stop_after_completed_epoch_counts_in_full(tmp_path, synthetic_case,
                                                   monkeypatch):
    """A stop landing exactly at an epoch boundary (ADVICE r2 #4): the
    completed epoch is recorded as done (no cursor), so resume does not
    replay it."""
    save = str(tmp_path / "boundary")
    # 4 train cases/epoch; the flag turns true at global step 4, which the
    # per-batch check only observes at the FIRST batch of epoch 2
    monkeypatch.setenv("BRATS21_PREEMPT_AT_STEP", "4")
    train_main(_argv(synthetic_case, save, swa=False))
    ckpt = load_checkpoint(os.path.join(save, "last_model"))
    # stop observed at epoch 2 batch 0 → epoch 1 done, cursor 0
    assert int(np.asarray(ckpt["epoch"])) == 1
    assert int(np.asarray(ckpt.get("batch_cursor", 0))) == 0
    assert int(np.asarray(ckpt["step"])) == 4
