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


def test_watch_mode_serves_new_cases(quick_run, tmp_path):
    """--watch (serving mode): the CLI keeps the compiled model warm,
    polls the input dir, and segments cases that arrive AFTER startup;
    --watch_stop_file ends the loop cleanly."""
    import shutil
    import threading
    import time

    from brats21_tpu.data.synthetic import generate_synthetic_dataset

    data = tmp_path / "watch_data"
    data.mkdir()
    staging = tmp_path / "staging"
    generate_synthetic_dataset(str(staging), num_cases=2, shape=(16, 16, 16),
                               seed=3)
    cases = sorted(os.listdir(staging))
    # case 1 present at startup
    shutil.move(str(staging / cases[0]), str(data / cases[0]))

    out = str(tmp_path / "watch_out")
    stop = tmp_path / "stop_now"
    argv = [
        "--config", os.path.join(quick_run, "config.yaml"),
        "--on", "test", "--input", str(data), "--output", out,
        "--num_workers", "1",
        "--watch", "--watch_interval", "0.3",
        "--watch_stop_file", str(stop),
    ]
    t = threading.Thread(target=infer_main, args=(argv,), daemon=True)
    t.start()

    seg_dir = os.path.join(out, "Inference_segmentations_test")

    def wait_for(n, timeout=300):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if len(glob.glob(os.path.join(seg_dir, "*.nii.gz"))) >= n:
                return True
            time.sleep(0.3)
        return False

    assert wait_for(1), "initial case never segmented"
    # case 2 lands atomically (rename) while the server is running
    shutil.move(str(staging / cases[1]), str(data / cases[1]))
    assert wait_for(2), "watched case never segmented"
    stop.touch()
    t.join(timeout=120)
    assert not t.is_alive(), "watch loop did not stop on the stop file"
    segs = sorted(os.path.basename(s)
                  for s in glob.glob(os.path.join(seg_dir, "*.nii.gz")))
    assert segs == [f"{c}.nii.gz" for c in cases]


def test_watch_mode_poison_isolation(quick_run, tmp_path, monkeypatch):
    """One corrupt upload landing in the same poll as two healthy cases:
    both healthy cases get segmented (per-case isolation), the server
    stays up, and the corrupt case is permanently quarantined after its
    bounded retries (VERDICT round-2 #6)."""
    import shutil
    import threading
    import time

    from brats21_tpu.data.synthetic import generate_synthetic_dataset

    monkeypatch.setenv("BRATS21_WATCH_MAX_ATTEMPTS", "2")
    data = tmp_path / "watch_data"
    data.mkdir()
    staging = tmp_path / "staging"
    generate_synthetic_dataset(str(staging), num_cases=3, shape=(16, 16, 16),
                               seed=5)
    cases = sorted(os.listdir(staging))
    bad = cases[1]
    # all four modality files exist (so discovery accepts the case) but one
    # is garbage bytes — the NIfTI decode fails at load time
    with open(staging / bad / f"{bad}_t1.nii.gz", "wb") as f:
        f.write(b"this is not a nifti")

    out = str(tmp_path / "watch_out")
    stop = tmp_path / "stop_now"
    argv = [
        "--config", os.path.join(quick_run, "config.yaml"),
        "--on", "test", "--input", str(data), "--output", out,
        "--num_workers", "1",
        "--watch", "--watch_interval", "0.5",
        "--watch_stop_file", str(stop),
    ]
    t = threading.Thread(target=infer_main, args=(argv,), daemon=True)
    t.start()
    time.sleep(1.0)
    # the three cases land atomically between polls — the poison shares
    # its poll with the healthy ones
    for c in cases:
        shutil.move(str(staging / c), str(data / c))

    seg_dir = os.path.join(out, "Inference_segmentations_test")
    healthy = [cases[0], cases[2]]

    def wait_for(pred, timeout=300):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if pred():
                return True
            time.sleep(0.3)
        return False

    assert wait_for(lambda: all(
        os.path.exists(os.path.join(seg_dir, f"{c}.nii.gz"))
        for c in healthy)), "healthy cases never segmented"

    logfile = os.path.join(out, "logfile_inference.log")

    def quarantined():
        with open(logfile) as f:
            return "permanently quarantined" in f.read()

    assert wait_for(quarantined), \
        "corrupt case never reached permanent quarantine"
    stop.touch()
    t.join(timeout=120)
    assert not t.is_alive(), "watch loop did not stop on the stop file"
    segs = sorted(os.path.basename(s)
                  for s in glob.glob(os.path.join(seg_dir, "*.nii.gz")))
    assert segs == [f"{c}.nii.gz" for c in healthy]


def test_watch_mode_poison_at_startup(quick_run, tmp_path, monkeypatch):
    """A corrupt case already on disk when the server STARTS must not
    crash the process before the watch loop begins (the old code ran the
    initial pass unguarded and crash-looped on every restart): the
    initial snapshot goes through the same per-case isolation, the
    healthy sibling present at startup is segmented, and the server then
    keeps serving cases that land later."""
    import shutil
    import threading
    import time

    from brats21_tpu.data.synthetic import generate_synthetic_dataset

    monkeypatch.setenv("BRATS21_WATCH_MAX_ATTEMPTS", "2")
    data = tmp_path / "watch_data"
    data.mkdir()
    staging = tmp_path / "staging"
    generate_synthetic_dataset(str(staging), num_cases=3, shape=(16, 16, 16),
                               seed=7)
    cases = sorted(os.listdir(staging))
    bad = cases[1]
    with open(staging / bad / f"{bad}_t1.nii.gz", "wb") as f:
        f.write(b"this is not a nifti")
    # healthy case 0 AND the corrupt case are both present at startup
    shutil.move(str(staging / cases[0]), str(data / cases[0]))
    shutil.move(str(staging / bad), str(data / bad))

    out = str(tmp_path / "watch_out")
    stop = tmp_path / "stop_now"
    argv = [
        "--config", os.path.join(quick_run, "config.yaml"),
        "--on", "test", "--input", str(data), "--output", out,
        "--num_workers", "1",
        "--watch", "--watch_interval", "0.3",
        "--watch_stop_file", str(stop),
    ]
    t = threading.Thread(target=infer_main, args=(argv,), daemon=True)
    t.start()

    seg_dir = os.path.join(out, "Inference_segmentations_test")

    def wait_for(pred, timeout=300):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if pred():
                return True
            time.sleep(0.3)
        return False

    assert wait_for(lambda: os.path.exists(
        os.path.join(seg_dir, f"{cases[0]}.nii.gz"))), \
        "healthy startup case never segmented"
    assert t.is_alive(), "server died on the corrupt startup case"
    # a case landing later is still served
    shutil.move(str(staging / cases[2]), str(data / cases[2]))
    assert wait_for(lambda: os.path.exists(
        os.path.join(seg_dir, f"{cases[2]}.nii.gz"))), \
        "case landing after startup never segmented"

    logfile = os.path.join(out, "logfile_inference.log")

    def quarantined():
        with open(logfile) as f:
            return "permanently quarantined" in f.read()

    assert wait_for(quarantined), \
        "corrupt startup case never reached permanent quarantine"
    stop.touch()
    t.join(timeout=120)
    assert not t.is_alive(), "watch loop did not stop on the stop file"
    segs = sorted(os.path.basename(s)
                  for s in glob.glob(os.path.join(seg_dir, "*.nii.gz")))
    assert segs == sorted(f"{c}.nii.gz" for c in (cases[0], cases[2]))


def test_sigterm_graceful_checkpoint(tmp_path, synthetic_case):
    """Preemption contract: SIGTERM mid-training writes a resumable
    last_model and exits 0 (the reference only has manual --resume)."""
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    save = str(tmp_path / "runs_preempt")
    argv = [sys.executable, "-m", "brats21_tpu.cli.main_train",
            "--train_data_path", synthetic_case, "--save_path", save,
            "--model", "equiunet", "--width", "4", "--criterion", "dice",
            "--optimizer", "adam", "--epochs", "500",
            "--val_frequency", "1000", "--patch_size", "16", "16", "16",
            "--batch_size", "1", "--num_workers", "1", "--fold", "0",
            "--no_tensorboard", "--no_amp", "--no_full_name", "-v"]
    env = {k: v for k, v in os.environ.items()}
    env.update({"PYTHONPATH": repo, "JAX_PLATFORMS": "cpu",
                "PYTHONUNBUFFERED": "1",
                # the conftest's 8-device XLA_FLAGS would leak in and make
                # the subprocess compile the GSPMD-partitioned step (slow)
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1"})
    proc = subprocess.Popen(argv, env=env, cwd=repo,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        # the SIGTERM handler installs before the (minutes-long, machine-
        # load-dependent) startup compiles, and a flag set during them is
        # honored at the first training batch — so signalling shortly
        # after launch exercises the graceful path without depending on
        # compile speed
        logfile = os.path.join(save, "logfile.log")
        t0 = time.time()
        while time.time() - t0 < 300 and not os.path.exists(logfile):
            time.sleep(1)
        assert os.path.exists(logfile), "run never started"
        time.sleep(10)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=1800)
    finally:
        if proc.poll() is None:   # never leak the 500-epoch trainer
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, out[-3000:]
    assert "exiting cleanly" in out
    assert os.path.isdir(os.path.join(save, "last_model"))

    # and the checkpoint resumes
    resume_argv = argv[:2] + argv[2:] + [
        "--resume", os.path.join(save, "last_model")]
    resume_argv[resume_argv.index("--epochs") + 1] = "2"
    r = subprocess.run(resume_argv, env=env, cwd=repo, capture_output=True,
                       text=True, timeout=1800)
    # resume epoch may already exceed --epochs 2; either way it must exit 0
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]


def test_watch_warmup_precompiles(quick_run, tmp_path):
    """--watch_warmup: the server compiles the serving executables at
    startup on a synthetic nonzero-everywhere case of the declared cropped
    shape (crop = identity -> padded shape = bucketize(declared)), logs the
    warmup, writes NO warmup artifact, and still serves real cases."""
    import shutil
    import threading
    import time

    from brats21_tpu.data.synthetic import generate_synthetic_dataset

    data = tmp_path / "warm_data"
    data.mkdir()
    staging = tmp_path / "warm_staging"
    generate_synthetic_dataset(str(staging), num_cases=1, shape=(16, 16, 16),
                               seed=5)
    case = sorted(os.listdir(staging))[0]

    out = str(tmp_path / "warm_out")
    stop = tmp_path / "warm_stop"
    argv = [
        "--config", os.path.join(quick_run, "config.yaml"),
        "--on", "test", "--input", str(data), "--output", out,
        "--num_workers", "1",
        "--watch", "--watch_interval", "0.3",
        "--watch_stop_file", str(stop),
        "--watch_warmup", "16", "16", "16",
    ]
    t = threading.Thread(target=infer_main, args=(argv,), daemon=True)
    t.start()

    def wait_for(pred, timeout=300):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if pred():
                return True
            time.sleep(0.3)
        return False

    # warmup completes BEFORE any real case exists (empty input dir);
    # the framework logger doesn't propagate to pytest's caplog, so
    # observe it through the CLI's own logfile
    logfile = os.path.join(out, "logfile_inference.log")

    def warmup_logged():
        if not os.path.exists(logfile):
            return False
        with open(logfile) as f:
            return "warmup compile" in f.read()

    assert wait_for(warmup_logged), "warmup never logged"

    seg_dir = os.path.join(out, "Inference_segmentations_test")
    shutil.move(str(staging / case), str(data / case))
    assert wait_for(lambda: os.path.exists(
        os.path.join(seg_dir, f"{case}.nii.gz"))), \
        "case after warmup never segmented"
    stop.touch()
    t.join(timeout=120)
    assert not t.is_alive()
    # the warmup case leaves no trace in the output
    assert not glob.glob(os.path.join(out, "**", "*Warmup*"),
                         recursive=True)
