"""End-to-end: CLI train on synthetic cases → checkpoints → CLI ensemble
inference with TTA + post-processing → NIfTI segs + Evaluation report.
The integration test the reference never had (SURVEY.md §4)."""

import glob
import os

import numpy as np
import pytest

from brats21_tpu.cli.main_inference import main as infer_main
from brats21_tpu.cli.main_train import main as train_main
from brats21_tpu.data.nifti import read_nifti


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory, synthetic_case):
    save_root = str(tmp_path_factory.mktemp("runs"))
    argv = [
        "--train_data_path", synthetic_case,
        "--save_path", save_root,
        "--model", "equiunet",
        "--width", "4",
        "--norm", "group",
        "--criterion", "dice",
        "--optimizer", "ranger",
        "--learning_rate", "1e-3",
        "--epochs", "2",
        "--val_frequency", "1",
        "--patch_size", "32", "32", "32",
        "--batch_size", "1",
        "--num_workers", "1",
        "--fold", "0",
        "--no_tensorboard",
        "--no_amp",
    ]
    train_main(argv)
    run_dirs = [d for d in glob.glob(os.path.join(save_root, "*"))
                if os.path.isdir(d)]
    assert len(run_dirs) == 1
    return run_dirs[0]


def test_train_artifacts(trained_run):
    assert os.path.exists(os.path.join(trained_run, "config.yaml"))
    assert os.path.isdir(os.path.join(trained_run, "best_model"))
    assert os.path.isdir(os.path.join(trained_run, "last_model"))
    assert os.path.exists(os.path.join(trained_run, "logfile.log"))


def test_inference_on_val(trained_run, synthetic_case, tmp_path):
    out = str(tmp_path / "inference")
    argv = [
        "--config", os.path.join(trained_run, "config.yaml"),
        "--on", "val",
        "--output", out,
        "--tta",
        "--cleaning_areas", "--cleaning_areas_threshold", "2",
        "--replace_value", "--replace_value_threshold", "3",
        "--num_workers", "1",
    ]
    infer_main(argv)
    segs = glob.glob(os.path.join(out, "Inference_segmentations_val",
                                  "*.nii.gz"))
    assert len(segs) == 1  # 5 cases, fold 0 → 1 val case
    seg = read_nifti(segs[0])
    assert seg.data.shape == (48, 48, 32)
    assert set(np.unique(seg.data)) <= {0, 1, 2, 4}
    reports = glob.glob(os.path.join(out, "Evaluation_inference_val*.xlsx"))
    assert reports


def test_inference_on_test_split(trained_run, synthetic_case, tmp_path):
    out = str(tmp_path / "inference_test")
    argv = [
        "--config", os.path.join(trained_run, "config.yaml"),
        "--on", "test",
        "--input", synthetic_case,
        "--output", out,
        "--num_workers", "1",
    ]
    infer_main(argv)
    segs = glob.glob(os.path.join(out, "Inference_segmentations_test",
                                  "*.nii.gz"))
    assert len(segs) == 5


def test_resume_training(trained_run, synthetic_case):
    argv = [
        "--train_data_path", synthetic_case,
        "--resume", os.path.join(trained_run, "last_model"),
    ]
    # resume reloads config.yaml; epochs=2 already done → immediately exits
    train_main(argv)
