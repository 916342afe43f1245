"""Multi-row benchmark artifact (VERDICT r3 #5).

Captures the perf surface that previously lived only in docs/BENCHMARKS.md
prose as ONE re-runnable script + JSON artifact:

    {w48_sparse, w48_dense, w64_sparse, w48_tta16, w48_train, cli_e2e}

Each device row is a child `python bench.py` run with env knobs (so a
backend poisoning or relay outage in one row can't kill the rest; bench.py
itself retries per row). The cli_e2e row generates synthetic NIfTI cases
and measures the full serving pipeline (decode → device → save) through
the real main_inference CLI.

    python scripts/bench_suite.py [--out BENCH_SUITE.json]
                                  [--rows w48_sparse,cli_e2e,...]

Runs on whatever backend is up (TPU via the axon relay, or JAX_PLATFORMS=cpu
for smoke). Writes the artifact only with at least one green row.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEVICE_ROWS = {
    # name -> env knobs for bench.py
    "w48_sparse": {},
    "w48_dense": {"BENCH_WIRE": "dense"},
    "w64_sparse": {"BENCH_WIDTH": "64"},
    "w48_tta16": {"BENCH_TTA": "1",
                  "BENCH_VOLUMES": os.environ.get("BENCH_TTA_VOLUMES", "8")},
    "w48_train": {"BENCH_TRAIN": "1"},
    # the TPU-native recommended sizing (docs/BENCHMARKS.md): its train
    # step vs its OWN w64 torch-CPU baseline completes the w64 story
    # alongside the w64_sparse inference row
    "w64_train": {"BENCH_TRAIN": "1", "BENCH_WIDTH": "64"},
}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def merge_row(rows: dict, name: str, new_row: dict) -> dict:
    """A red recapture must not destroy an existing green row — --merge
    exists to IMPROVE rows. The failed attempt is recorded alongside for
    transparency."""
    old = rows.get(name)
    if old and old.get("rc") == 0 and new_row.get("rc") != 0:
        log(f"[suite] {name}: recapture failed "
            f"(rc={new_row.get('rc')}) — keeping existing green row")
        return {**old, "failed_recapture": {
            "rc": new_row.get("rc"),
            "error": str(new_row.get("error", ""))[:200]}}
    return new_row


def run_device_row(name: str, knobs: dict) -> dict:
    env = dict(os.environ)
    env.update(knobs)
    env.setdefault("BENCH_RETRIES", "2")
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-u",
                           os.path.join(REPO, "bench.py")],
                          env=env, stdout=subprocess.PIPE, text=True)
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    row: dict = {"rc": proc.returncode, "wall_s": round(time.time() - t0, 1)}
    if lines:
        try:
            row.update(json.loads(lines[-1]))
        except json.JSONDecodeError:
            row["error"] = lines[-1][:300]
    log(f"[suite] {name}: rc={proc.returncode} "
        f"value={row.get('value')} {row.get('unit', '')}")
    return row


def write_flagship_run_dir(run_dir: str, width: int = 48) -> None:
    """A width-``width`` flagship config dir with random weights (synthetic
    serving measures the pipeline, not the DSC). Runs in a CPU child so
    weight init never touches the TPU backend."""
    code = (
        "import sys; sys.path.insert(0, %r);\n"
        "import jax, numpy as np\n"
        "import orbax.checkpoint as ocp\n"
        "from brats21_tpu.config import TrainConfig\n"
        "from brats21_tpu.models import get_model\n"
        "import jax.numpy as jnp, os\n"
        "cfg = TrainConfig(model='equiunet_assp_evo', width=%d)\n"
        "cfg.save_path = %r\n"
        "m = get_model(cfg)\n"
        "v = m.init(jax.random.PRNGKey(0),"
        " jnp.zeros((1,16,16,16,4), jnp.float32))\n"
        "os.makedirs(%r, exist_ok=True)\n"
        "cfg.to_yaml(os.path.join(%r, 'config.yaml'))\n"
        "payload = dict(epoch=np.asarray(0), step=np.asarray(0),"
        " params=jax.tree_util.tree_map(np.asarray, v['params']),"
        " best_value=np.asarray(0.5, np.float32))\n"
        "ocp.PyTreeCheckpointer().save("
        "os.path.join(os.path.abspath(%r), 'best_model'), payload)\n"
        % (REPO, width, run_dir, run_dir, run_dir, run_dir))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"   # weight init never needs the TPU
    env.setdefault("PYTHONPATH", REPO)
    subprocess.run([sys.executable, "-c", code], check=True, env=env)


def run_cli_e2e(n_cases: int, shape=(240, 240, 155)) -> dict:
    """End-to-end serving row: synthetic NIfTI on disk → main_inference
    (--on test) → segmentations on disk. Reports wall s/case over the run
    and the engine's own drained per-case device time from the log."""
    import re
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="bench_cli_")
    data = os.path.join(work, "data")
    out = os.path.join(work, "out")
    run_dir = os.path.join(work, "run")
    try:
        code = (
            "import sys; sys.path.insert(0, %r);"
            "from brats21_tpu.data.synthetic import generate_synthetic_dataset;"
            "generate_synthetic_dataset(%r, num_cases=%d, shape=%r, seed=3,"
            " with_seg=False)" % (REPO, data, n_cases, tuple(shape)))
        subprocess.run([sys.executable, "-c", code], check=True)
        write_flagship_run_dir(run_dir)

        t0 = time.time()
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, "-m", "brats21_tpu.cli.main_inference",
             "--config", os.path.join(run_dir, "config.yaml"),
             "--on", "test", "--input", data, "--output", out,
             "--num_workers", "1", "-v"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        wall = time.time() - t0
        segs = []
        for root, _, files in os.walk(out):
            segs += [f for f in files if f.endswith(".nii.gz")]
        # engine per-case times from the meter log lines: `time  X (avg)`
        times = [float(m) for m in re.findall(
            r"\ttime\s+([0-9.]+)\s", proc.stdout)]
        row = {
            "rc": proc.returncode,
            "cases": n_cases,
            "segs_written": len(segs),
            "wall_s_per_case": round(wall / max(n_cases, 1), 2),
            "cases_per_min": round(n_cases / wall * 60.0, 2),
            "case_time_median_s": (round(float(
                sorted(times)[len(times) // 2]), 2) if times else None),
        }
        if proc.returncode != 0:
            row["tail"] = proc.stdout[-600:]
        log(f"[suite] cli_e2e: rc={proc.returncode} "
            f"{row['wall_s_per_case']} s/case wall, "
            f"median case {row['case_time_median_s']} s")
        return row
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SUITE.json"))
    ap.add_argument("--rows",
                    default=",".join([*DEVICE_ROWS, "cli_e2e", "serving",
                                      "serving_warm"]))
    ap.add_argument("--cli_cases", type=int,
                    default=int(os.environ.get("BENCH_CLI_CASES", "8")))
    ap.add_argument("--merge", action="store_true",
                    help="update only the requested rows inside an existing "
                         "--out artifact (recapture a weak row without "
                         "re-running the whole suite)")
    args = ap.parse_args()
    wanted = [r.strip() for r in args.rows.split(",") if r.strip()]

    rows: dict = {}
    prev_argv: list = []
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        rows = prev.get("rows", {})
        prev_argv = prev.get("argv_rows", [])
        log(f"[suite] merging into {args.out} "
            f"(existing rows: {sorted(rows)})")

    def keep(name: str, new_row: dict) -> dict:
        return merge_row(rows, name, new_row)

    for name in wanted:
        if name == "cli_e2e":
            try:
                rows[name] = keep(name, run_cli_e2e(args.cli_cases))
            except Exception as e:  # noqa: BLE001 — row isolation
                rows[name] = keep(name, {"rc": -1,
                                         "error": f"{type(e).__name__}: {e}"})
        elif name in ("serving", "serving_warm"):
            t0 = time.time()
            env = dict(os.environ)
            if name == "serving_warm":
                env["BENCH_SERVING_WARMUP"] = "1"
            proc = subprocess.run(
                [sys.executable, "-u",
                 os.path.join(REPO, "scripts", "bench_serving.py")],
                env=env, stdout=subprocess.PIPE, text=True)
            row = {"rc": proc.returncode,
                   "wall_s": round(time.time() - t0, 1)}
            lines = [ln for ln in proc.stdout.strip().splitlines()
                     if ln.strip()]
            if lines:
                try:
                    row.update(json.loads(lines[-1]))
                except json.JSONDecodeError:
                    row["error"] = lines[-1][:300]
            log(f"[suite] serving: rc={proc.returncode} "
                f"p50={row.get('p50_s')}s p95={row.get('p95_s')}s")
            rows[name] = keep(name, row)
        elif name in DEVICE_ROWS:
            rows[name] = keep(name, run_device_row(name, DEVICE_ROWS[name]))
        else:
            log(f"[suite] unknown row '{name}' skipped")

    ok = [n for n, r in rows.items() if r.get("rc") == 0]
    # provenance: keep the union of every capture's row list, not just
    # the last --merge invocation's subset
    all_argv = list(dict.fromkeys([*prev_argv, *wanted]))
    artifact = {"rows": rows, "green": ok,
                "argv_rows": all_argv,
                "note": "device rows are bench.py children (see bench.py "
                        "docstring for wire/TTA semantics); cli_e2e is the "
                        "real main_inference CLI over synthetic NIfTI"}
    print(json.dumps(artifact, indent=1))
    if ok:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        log(f"[suite] wrote {args.out} ({len(ok)}/{len(rows)} rows green)")
    else:
        log("[suite] no green rows — artifact not written")
        sys.exit(1)


if __name__ == "__main__":
    main()
