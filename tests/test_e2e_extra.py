"""E2E coverage of the remaining engine/CLI branches: boundary loss, SWA,
end-of-training eval, STAPLE ensemble fusion, sliding-window inference."""

import glob
import os

import numpy as np
import pytest

from brats21_tpu.cli.main_inference import main as infer_main
from brats21_tpu.cli.main_train import main as train_main


def _base_argv(data, save_root, **over):
    args = {
        "--train_data_path": data,
        "--save_path": save_root,
        "--model": "equiunet",
        "--width": "4",
        "--criterion": "dice",
        "--optimizer": "adam",
        "--learning_rate": "1e-3",
        "--epochs": "1",
        "--val_frequency": "1",
        "--batch_size": "1",
        "--num_workers": "1",
        "--fold": "0",
    }
    args.update(over)
    argv = []
    for k, v in args.items():
        argv.append(k)
        if v is not None:
            argv.extend(v if isinstance(v, list) else [v])
    argv += ["--no_tensorboard", "--no_amp"]
    return argv


def _patch16():
    return {"--patch_size": ["16", "16", "16"]}


def test_boundary_loss_training(tmp_path, synthetic_case):
    save = str(tmp_path / "runs_boundary")
    train_main(_base_argv(synthetic_case, save,
                          **{"--criterion": "dice_boundary"}, **_patch16()))
    run = glob.glob(os.path.join(save, "*"))[0]
    assert os.path.isdir(os.path.join(run, "best_model"))


def test_swa_and_end_training_eval(tmp_path, synthetic_case):
    save = str(tmp_path / "runs_swa")
    argv = _base_argv(synthetic_case, save,
                      **{"--epochs": "2", "--swa_start": "1"}, **_patch16())
    argv += ["--evaluate_end_training"]
    train_main(argv)
    run = glob.glob(os.path.join(save, "*"))[0]
    # end-of-training eval writes segmentations ±TTA + Evaluation reports
    assert glob.glob(os.path.join(run, "segmentations", "*.nii.gz"))
    assert glob.glob(os.path.join(run, "segmentations_tta", "*.nii.gz"))
    assert glob.glob(os.path.join(run, "Evaluation_swa*.xlsx"))


@pytest.fixture(scope="module")
def quick_run(tmp_path_factory, synthetic_case):
    save = str(tmp_path_factory.mktemp("runs_quick"))
    train_main(_base_argv(synthetic_case, save, **_patch16()))
    return glob.glob(os.path.join(save, "*"))[0]


def test_staple_ensemble(quick_run, tmp_path, synthetic_case):
    os.environ["SYNTH_CASE_DIR"] = synthetic_case
    out = str(tmp_path / "staple_out")
    argv = [
        "--config", os.path.join(quick_run, "config.yaml"),
        os.path.join(quick_run, "config.yaml"),   # 2-member ensemble
        "--on", "val", "--val_data_path", os.environ["SYNTH_CASE_DIR"],
        "--output", out,
        "--perform_staple", "--staple_threshold", "0.5",
        "--num_workers", "1",
    ]
    infer_main(argv)
    segs = glob.glob(os.path.join(out, "Inference_segmentations_val",
                                  "*.nii.gz"))
    assert len(segs) == 5  # explicit val_data_path -> all cases


def test_sliding_window_inference_cli(quick_run, tmp_path):
    out = str(tmp_path / "sw_out")
    argv = [
        "--config", os.path.join(quick_run, "config.yaml"),
        "--on", "val", "--output", out,
        "--sliding_window_inference",
        "--sliding_window_size", "16", "16", "16",
        "--num_workers", "1",
    ]
    infer_main(argv)
    segs = glob.glob(os.path.join(out, "Inference_segmentations_val",
                                  "*.nii.gz"))
    assert len(segs) == 1


def test_create_patient_dir(quick_run, tmp_path):
    out = str(tmp_path / "pdir_out")
    argv = [
        "--config", os.path.join(quick_run, "config.yaml"),
        "--on", "val", "--output", out,
        "--create_patient_dir", "--num_workers", "1",
    ]
    infer_main(argv)
    segs = glob.glob(os.path.join(out, "Inference_segmentations_val",
                                  "*", "*.nii.gz"))
    assert len(segs) == 1


def test_training_is_deterministic(tmp_path, synthetic_case):
    # same seed -> bit-identical checkpoints (set_determinism parity,
    # definer.py:507-508)
    import jax
    from brats21_tpu.learning.checkpoint import load_checkpoint
    runs = []
    for i in range(2):
        save = str(tmp_path / f"det_{i}")
        train_main(_base_argv(synthetic_case, save, **_patch16()))
        runs.append(glob.glob(os.path.join(save, "*"))[0])
    p0 = load_checkpoint(os.path.join(runs[0], "best_model"))["params"]
    p1 = load_checkpoint(os.path.join(runs[1], "best_model"))["params"]
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
