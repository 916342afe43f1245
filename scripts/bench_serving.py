"""Watch-mode serving latency benchmark (VERDICT r4 #6).

The reference has no serving mode — its closest analog is the one-shot
Docker batch entrypoint (reference Dockerfile / README.md:134-170). This
framework's ``main_inference --watch`` is a persistent TPU server: new
cases dropped into the watched directory are discovered, segmented and
written back. This script measures that path's case-arrival→seg-on-disk
latency, the number that previously lived only as prose in
docs/BENCHMARKS.md ("6.5-9.2 s"):

  * start the real ``main_inference --watch`` server on an empty dir
    (flagship equiunet_assp_evo w48 config, random weights — synthetic
    serving measures the pipeline, not the DSC);
  * inject N full-size 240×240×155 synthetic cases one at a time via
    ATOMIC rename (the discovery contract: a case appears only when all
    four modality files are present);
  * per case, poll for ``<pid>.nii.gz`` in the output dir and record
    arrival→visible latency; the first case is reported separately
    (it pays the jit compile) and excluded from the statistics.

Prints ONE JSON line:
  {"metric": "serving_watch_latency", "p50_s": ..., "p95_s": ...,
   "mean_s": ..., "cases": N, "first_case_s": compile-inclusive, ...}

Knobs: BENCH_SERVING_CASES (default 10), BENCH_SERVING_SHAPE,
BENCH_SERVING_TIMEOUT (per-case wait, default 600 s),
BENCH_SERVING_WARMUP=1 (start the server with ``--watch_warmup`` at the
expected cropped shape and wait for the warmup compile BEFORE injecting —
the first case then demonstrates steady-state latency instead of paying
the compile; reported as "warmup": true + "warmup_s").

Runs on whatever backend is up (TPU via the axon relay; JAX_PLATFORMS=cpu
for smoke). Usable standalone or as the bench_suite 'serving' row.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_suite import write_flagship_run_dir  # noqa: E402

N_CASES = int(os.environ.get("BENCH_SERVING_CASES", "10"))
SHAPE = tuple(int(s) for s in os.environ.get(
    "BENCH_SERVING_SHAPE", "240,240,155").split(","))
CASE_TIMEOUT = float(os.environ.get("BENCH_SERVING_TIMEOUT", "600"))
WARMUP = os.environ.get("BENCH_SERVING_WARMUP", "0") == "1"


def _expected_crop_shape() -> list:
    """Cropped-foreground shape of the first injected case (seed 1) —
    what an operator would pass to --watch_warmup as the expected brain
    extent."""
    import numpy as np

    from brats21_tpu.data.synthetic import make_case
    img, _ = make_case(SHAPE, seed=1)
    nz = np.argwhere(img.any(axis=-1))
    return (nz.max(axis=0) + 1 - nz.min(axis=0)).tolist()


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _make_case(stage_dir: str, index: int) -> str:
    """Generate one 4-modality case under a staging dir (same filesystem
    as the watched dir, so the final rename is atomic)."""
    from brats21_tpu.data.synthetic import generate_synthetic_dataset
    generate_synthetic_dataset(stage_dir, num_cases=1, shape=SHAPE,
                               seed=index, with_seg=False,
                               first_case=index)
    case_dir = os.path.join(stage_dir, f"BraTS2021_{index:05d}")
    assert os.path.isdir(case_dir), sorted(os.listdir(stage_dir))
    return case_dir


def main() -> None:
    work = tempfile.mkdtemp(prefix="bench_serving_")
    data = os.path.join(work, "data")
    stage = os.path.join(work, "stage")
    out = os.path.join(work, "out")
    run_dir = os.path.join(work, "run")
    stop_file = os.path.join(work, "stop")
    os.makedirs(data)
    os.makedirs(stage)
    server = None
    server_log = open(os.path.join(work, "server.log"), "w")
    try:
        write_flagship_run_dir(run_dir)
        seg_dir = os.path.join(out, "Inference_segmentations_test")

        cmd = [sys.executable, "-m", "brats21_tpu.cli.main_inference",
               "--config", os.path.join(run_dir, "config.yaml"),
               "--on", "test", "--input", data, "--output", out,
               "--watch", "--watch_interval", "0.25",
               "--watch_stop_file", stop_file, "--num_workers", "1", "-v"]
        warmup_s = None
        if WARMUP:
            warm = _expected_crop_shape()
            cmd += ["--watch_warmup", *map(str, warm)]
            log(f"warmup enabled: --watch_warmup {warm}")
        server = subprocess.Popen(cmd, cwd=REPO, stdout=server_log,
                                  stderr=subprocess.STDOUT)
        if WARMUP:
            # block until the server logs the warmup compile, so case 1's
            # latency measures steady-state serving, not the compile
            t0 = time.time()
            logfile = os.path.join(work, "server.log")
            while True:
                if server.poll() is not None:
                    raise RuntimeError(f"server died rc={server.returncode}")
                with open(logfile) as f:
                    txt = f.read()
                if "warmup compile" in txt:
                    break
                if "warmup failed" in txt:
                    raise RuntimeError("server warmup failed — see log")
                if time.time() - t0 > CASE_TIMEOUT:
                    raise TimeoutError("warmup never completed")
                time.sleep(0.5)
            warmup_s = time.time() - t0
            log(f"warmup compile done in {warmup_s:.1f}s")

        latencies = []
        first_case_s = None
        for i in range(1, N_CASES + 2):      # +1: case 1 pays the compile
            pid = f"BraTS2021_{i:05d}"
            case_dir = _make_case(stage, i)
            t0 = time.time()
            os.rename(case_dir, os.path.join(data, pid))   # atomic arrival
            seg_path = os.path.join(seg_dir, f"{pid}.nii.gz")
            deadline = t0 + CASE_TIMEOUT
            while not os.path.exists(seg_path):
                if server.poll() is not None:
                    raise RuntimeError(
                        f"server died rc={server.returncode} — see "
                        f"{server_log.name}")
                if time.time() > deadline:
                    raise TimeoutError(f"case {pid} not segmented within "
                                       f"{CASE_TIMEOUT:.0f}s")
                time.sleep(0.02)
            dt = time.time() - t0
            if i == 1:
                first_case_s = dt           # compile-inclusive, excluded
                log(f"case {pid}: {dt:.2f}s (first case: jit compile, "
                    "excluded from stats)")
            else:
                latencies.append(dt)
                log(f"case {pid}: {dt:.2f}s")

        lat = sorted(latencies)
        n = len(lat)
        rec = {
            "metric": "serving_watch_latency",
            "unit": "s/case",
            "cases": n,
            "p50_s": round(lat[n // 2], 2),
            "p95_s": round(lat[min(n - 1, int(0.95 * n))], 2),
            "mean_s": round(sum(lat) / n, 2),
            "min_s": round(lat[0], 2),
            "max_s": round(lat[-1], 2),
            "first_case_s": round(first_case_s, 2),
            "shape": list(SHAPE),
            "poll_interval_s": 0.25,
            "warmup": WARMUP,
        }
        if warmup_s is not None:
            rec["warmup_s"] = round(warmup_s, 1)
        print(json.dumps(rec), flush=True)
    finally:
        open(stop_file, "w").close()
        if server is not None:
            try:
                server.wait(timeout=30)
            except subprocess.TimeoutExpired:
                server.kill()
                server.wait()
        server_log.close()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
