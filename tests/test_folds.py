"""Fold-parallel training on the virtual CPU mesh."""

import glob
import os

import jax
import numpy as np
import pytest

from brats21_tpu.cli.main_train_folds import main as folds_main


def test_parallel_folds_e2e(tmp_path, synthetic_case):
    save = str(tmp_path / "folds_runs")
    argv = [
        "--train_data_path", synthetic_case,
        "--save_path", save,
        "--model", "equiunet",
        "--width", "4",
        "--criterion", "dice",
        "--optimizer", "adam",
        "--learning_rate", "1e-3",
        "--epochs", "1",
        "--val_frequency", "1",
        "--patch_size", "16", "16", "16",
        "--batch_size", "1",
        "--num_workers", "1",
        "--no_tensorboard",
        "--no_amp",
    ]
    folds_main(argv)
    base = glob.glob(os.path.join(save, "*_folds"))[0]
    fold_dirs = sorted(glob.glob(os.path.join(base, "fold_*")))
    assert len(fold_dirs) == 5
    for d in fold_dirs:
        assert os.path.exists(os.path.join(d, "config.yaml"))
        assert os.path.isdir(os.path.join(d, "best_model"))

    # per-fold checkpoints differ (independent folds, different rngs/data)
    from brats21_tpu.learning.checkpoint import load_checkpoint
    p0 = load_checkpoint(os.path.join(fold_dirs[0], "best_model"))["params"]
    p1 = load_checkpoint(os.path.join(fold_dirs[1], "best_model"))["params"]
    l0 = jax.tree_util.tree_leaves(p0)
    l1 = jax.tree_util.tree_leaves(p1)
    assert any(not np.allclose(a, b) for a, b in zip(l0, l1))
