"""Multi-host (multi-process) distributed runtime — VERDICT round-1
next-steps #4. Both tests spawn REAL subprocesses (2 processes × 4 virtual
CPU devices, gloo collectives) — no mocks."""

import glob
import os
import subprocess
import sys

import pytest

from brats21_tpu.parallel.multihost import free_port

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(extra):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "BRATS21_COORDINATOR",
                        "BRATS21_NUM_PROCESSES", "BRATS21_PROCESS_ID")}
    env["PYTHONPATH"] = REPO
    # 1-core CI hosts serialize the two workers' compiles: the shutdown
    # barrier must outlive the skew (multihost.maybe_initialize_distributed)
    env["BRATS21_SHUTDOWN_TIMEOUT"] = "1500"
    env.update(extra)
    return env


def test_multiprocess_train_step_lockstep():
    """2 procs × 4 devices: sharded train steps over the spanning mesh end
    with bit-identical parameters on every process.

    One retry: under heavy host load the 30 s Gloo rendezvous deadline
    (hardcoded in XLA's gloo collectives) can expire before the second
    worker joins — an environment flake, not a code failure."""
    for attempt in range(2):
        proc = subprocess.run(
            [sys.executable, "-c",
             "from brats21_tpu.parallel.multihost import "
             "run_multiprocess_dryrun; run_multiprocess_dryrun(2, 4)"],
            env=_clean_env({}), capture_output=True, text=True, timeout=900)
        if proc.returncode == 0 or \
                "DEADLINE_EXCEEDED" not in proc.stdout + proc.stderr:
            break
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "params identical" in proc.stdout


_MERGE_WORKER = r"""
import os, sys
import numpy as np
pid = int(os.environ["BRATS21_PROCESS_ID"])
from brats21_tpu.parallel.multihost import (maybe_initialize_distributed,
    gather_objects, merge_meters, merge_report_rows)
assert maybe_initialize_distributed()
from brats21_tpu.utils.meter import AverageMeter
from brats21_tpu.utils.reporting import EvaluationReport

# gather_objects: arbitrary JSON payloads, ordered by process id
got = gather_objects({"pid": pid, "cases": ["a", "b"] if pid == 0 else ["c"]})
assert [g["pid"] for g in got] == [0, 1], got

# merge_meters: exact global average incl. vector sums and count-0 keys
m = AverageMeter("dice", ":.4f")
if pid == 0:
    m.update(np.array([1.0, 0.5, 0.0])); m.update(np.array([0.0, 0.5, 1.0]))
else:
    m.update(np.array([0.5, 0.5, 0.5]))
empty = AverageMeter("hd95", ":.4f")  # only proc 1 scores this one
if pid == 1:
    empty.update(np.array([7.0, 8.0, 9.0]))
meters = {"dice": m, "hd95": empty}
merge_meters(meters)
assert meters["dice"].count == 3
np.testing.assert_allclose(np.asarray(meters["dice"].avg), [0.5, 0.5, 0.5])
assert meters["hd95"].count == 1
np.testing.assert_allclose(np.asarray(meters["hd95"].avg), [7.0, 8.0, 9.0])

# merge_report_rows: union of per-process case rows on every process
rep = EvaluationReport()
rep.add(f"case_{pid}", {"dice": np.array([0.1 * (pid + 1)] * 3)})
merge_report_rows(rep)
assert sorted(rep.rows) == ["case_0", "case_1"], rep.rows
print("MERGE_OK", flush=True)
"""


def test_multiprocess_gather_and_merge():
    """2 procs: gather_objects ordering, exact meter merging (vector sums,
    count-0 keys unioned), report-row union — the primitives behind
    multi-host case-striped evaluation."""
    port = free_port()
    procs = []
    for pid in range(2):
        env = _clean_env({
            "JAX_PLATFORMS": "cpu",
            "BRATS21_COORDINATOR": f"127.0.0.1:{port}",
            "BRATS21_NUM_PROCESSES": "2",
            "BRATS21_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _MERGE_WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{o[-3000:]}"
        assert "MERGE_OK" in o


def _run_two_procs(argv, extra_env, timeout=1800, attempts=2):
    """Spawn the same command as 2 coordinated processes; one retry when
    the only failure signature is the load-flaky coordination-service
    DEADLINE (see test_multiprocess_train_step_lockstep)."""
    for attempt in range(attempts):
        port = free_port()
        procs = []
        for pid in range(2):
            env = _clean_env({
                "BRATS21_COORDINATOR": f"127.0.0.1:{port}",
                "BRATS21_NUM_PROCESSES": "2",
                "BRATS21_PROCESS_ID": str(pid),
                **extra_env,
            })
            procs.append(subprocess.Popen(
                [sys.executable] + argv, env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        try:
            outs = [p.communicate(timeout=timeout)[0] for p in procs]
        finally:
            for p in procs:           # never leak a hung trainer
                if p.poll() is None:
                    p.kill()
                    p.communicate()
        ok = all(p.returncode == 0 for p in procs)
        if ok or (attempt + 1 < attempts
                  and any("DEADLINE_EXCEEDED" in o for o in outs)):
            if ok:
                return outs
            continue
        break
    msg = "\n\n".join(
        f"=== proc {pid} rc={p.returncode} ===\n{o[-3000:]}"
        for pid, (p, o) in enumerate(zip(procs, outs)))
    raise AssertionError(msg)


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
            "--no_full_name", "--evaluate_end_training"]
    outs = _run_two_procs(argv, {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    # both report the identical global loss (lock-step training)
    assert "process 0/2" in outs[0] and "process 1/2" in outs[1]
    # primary-only artifacts
    assert os.path.exists(os.path.join(save, "config.yaml"))
    assert os.path.isdir(os.path.join(save, "best_model"))
    assert os.path.exists(os.path.join(save, "logfile.log"))
    # end-of-training eval was case-striped across both processes and the
    # merged report holds EVERY val-fold case (fold 0 of 12 via KFold(5))
    from brats21_tpu.data.discovery import kfold_split
    n_val = len(kfold_split(list(range(12)), fold=0, n_splits=5,
                            seed=123)[1])
    for suffix in ("", "_tta"):
        csv = os.path.join(save, f"Evaluation{suffix}.csv")
        assert os.path.exists(csv), os.listdir(save)
        with open(csv) as f:
            rows = [l for l in f.read().splitlines() if l.strip()]
        assert len(rows) - 1 == n_val, (csv, rows)
    # every case's segmentation got saved (each process wrote its stripe)
    segs = glob.glob(os.path.join(save, "segmentations", "*.nii.gz"))
    assert len(segs) == n_val, segs

    # ---- 2-process main_inference over the trained run: cases striped,
    # report rows merged to the primary (reference is single-GPU)
    out = str(tmp_path / "inf")
    argv_inf = ["-m", "brats21_tpu.cli.main_inference",
                "--config", os.path.join(save, "config.yaml"),
                "--on", "val", "--output", out,
                "--num_workers", "1"]
    _run_two_procs(argv_inf, {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    csvs = glob.glob(os.path.join(out, "Evaluation_inference_val*.csv"))
    merged = [c for c in csvs if ".proc" not in c]
    assert merged, csvs
    with open(merged[0]) as f:
        rows = [l for l in f.read().splitlines() if l.strip()]
    assert len(rows) - 1 == n_val, rows
    segs = glob.glob(os.path.join(out, "Inference_segmentations_val",
                                  "*.nii.gz"))
    assert len(segs) == n_val, segs


@pytest.mark.slow
def test_multiprocess_empty_eval_stripe(tmp_path, tmp_path_factory):
    """2 processes, ONE val case: process 1's eval stripe is empty. It must
    still join the merge_meters / merge_report_rows collectives (count-0
    meters) instead of skipping validation — the skip deadlocked the
    scoring peer (ADVICE round-2 #1). Covers both the in-training
    validation and the end-of-training eval."""
    from brats21_tpu.data.synthetic import generate_synthetic_dataset
    data = tmp_path_factory.mktemp("brats_mh5")
    # 5 cases, KFold(5) fold 0 -> exactly 1 val case, 4 train cases
    generate_synthetic_dataset(str(data), num_cases=5, shape=(48, 48, 32),
                               seed=2)
    save = str(tmp_path / "runs")
    argv = ["-m", "brats21_tpu.cli.main_train",
            "--train_data_path", str(data),
            "--save_path", save,
            "--model", "equiunet", "--width", "4",
            "--criterion", "dice", "--optimizer", "adam",
            "--epochs", "1", "--val_frequency", "1",
            "--patch_size", "16", "16", "16", "--batch_size", "4",
            "--num_workers", "1", "--fold", "0", "--no_tensorboard",
            "--no_full_name", "--no_amp", "--evaluate_end_training"]
    _run_two_procs(argv, {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    assert os.path.isdir(os.path.join(save, "best_model"))
    # the merged end-of-training report holds the single val case
    for suffix in ("", "_tta"):
        csv = os.path.join(save, f"Evaluation{suffix}.csv")
        assert os.path.exists(csv), os.listdir(save)
        with open(csv) as f:
            rows = [l for l in f.read().splitlines() if l.strip()]
        assert len(rows) - 1 == 1, rows
    segs = glob.glob(os.path.join(save, "segmentations", "*.nii.gz"))
    assert len(segs) == 1, segs


@pytest.fixture(scope="module")
def synthetic_case_12(tmp_path_factory):
    from brats21_tpu.data.synthetic import generate_synthetic_dataset
    root = tmp_path_factory.mktemp("brats_mh")
    generate_synthetic_dataset(str(root), num_cases=12, shape=(48, 48, 32),
                               seed=1)
    return str(root)


def test_process_shard_pads_instead_of_trims():
    """Every record appears in some process's stripe (nothing is silently
    dropped — code-review round-2 finding #3), stripes are equal-length
    ceil(n/count), and eval striping stays untrimmed-exact."""
    from brats21_tpu.parallel.multihost import (process_shard,
                                                shard_eval_records)
    records = [f"r{i}" for i in range(11)]
    stripes = [process_shard(records, index=i, count=4) for i in range(4)]
    assert all(len(s) == 3 for s in stripes)          # ceil(11/4)
    union = set().union(*stripes)
    assert union == set(records)                      # nothing dropped
    # eval stripes: exact partition, no duplicates, unequal lengths OK
    estripes = [shard_eval_records(records, index=i, count=4)
                for i in range(4)]
    flat = [r for s in estripes for r in s]
    assert sorted(flat) == sorted(records)
    # single process: identity
    assert process_shard(records, index=0, count=1) == records
