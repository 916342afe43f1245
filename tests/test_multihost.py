"""Multi-host (multi-process) distributed runtime — VERDICT round-1
next-steps #4. Both tests spawn REAL subprocesses (2 processes × 4 virtual
CPU devices, gloo collectives) — no mocks."""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(extra):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "BRATS21_COORDINATOR",
                        "BRATS21_NUM_PROCESSES", "BRATS21_PROCESS_ID")}
    env["PYTHONPATH"] = REPO
    env.update(extra)
    return env


def test_multiprocess_train_step_lockstep():
    """2 procs × 4 devices: sharded train steps over the spanning mesh end
    with bit-identical parameters on every process."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "from brats21_tpu.parallel.multihost import run_multiprocess_dryrun;"
         "run_multiprocess_dryrun(2, 4, port=9741)"],
        env=_clean_env({}), capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "params identical" in proc.stdout


@pytest.mark.slow
def test_multiprocess_cli_training(tmp_path, synthetic_case_12):
    """The full main_train CLI across 2 processes: per-process record
    stripes, global-mesh train steps, primary-only artifacts."""
    save = str(tmp_path / "runs")
    argv = ["-m", "brats21_tpu.cli.main_train",
            "--train_data_path", synthetic_case_12,
            "--save_path", save,
            "--model", "equiunet_assp_evo", "--width", "4",
            "--criterion", "dice", "--optimizer", "adam",
            "--epochs", "1", "--val_frequency", "1",
            "--patch_size", "32", "32", "32", "--batch_size", "4",
            "--num_workers", "1", "--fold", "0", "--no_tensorboard",
            "--no_full_name"]
    procs = []
    for pid in range(2):
        env = _clean_env({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "BRATS21_COORDINATOR": "127.0.0.1:9763",
            "BRATS21_NUM_PROCESSES": "2",
            "BRATS21_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable] + argv, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    if any(p.returncode != 0 for p in procs):
        msg = "\n\n".join(
            f"=== proc {pid} rc={p.returncode} ===\n{o[-3000:]}"
            for pid, (p, o) in enumerate(zip(procs, outs)))
        raise AssertionError(msg)
    # both report the identical global loss (lock-step training)
    assert "process 0/2" in outs[0] and "process 1/2" in outs[1]
    # primary-only artifacts
    assert os.path.exists(os.path.join(save, "config.yaml"))
    assert os.path.isdir(os.path.join(save, "best_model"))
    assert os.path.exists(os.path.join(save, "logfile.log"))


@pytest.fixture(scope="module")
def synthetic_case_12(tmp_path_factory):
    from brats21_tpu.data.synthetic import generate_synthetic_dataset
    root = tmp_path_factory.mktemp("brats_mh")
    generate_synthetic_dataset(str(root), num_cases=12, shape=(48, 48, 32),
                               seed=1)
    return str(root)
