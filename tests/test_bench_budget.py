"""bench.py budget-proofing machinery (VERDICT r4 #1).

The headline perf artifact was red two consecutive rounds (r3 rc=1, r4
rc=124 with ``parsed:null``) because the bench printed its single JSON
line only at the very end of a successful run.  These tests pin the
round-5 contract:

* provisional ``"partial": true`` result lines STREAM as soon as the
  first measurement exists;
* the parent salvages the last parseable result line from a killed /
  timed-out child (``_run_attempt``);
* the retry envelope respects ``BENCH_TOTAL_BUDGET`` — an exhausted
  budget still yields exactly one structured JSON line;
* the whole bench runs green end-to-end on CPU at tiny shapes.

The end-to-end tests execute a COPY of bench.py from a tmpdir: the
baseline cache and the sparse-parity marker are keyed off the script's
own directory, so the repo's committed artifacts stay untouched.
"""

import json
import os
import shutil
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root module)


# ---------------------------------------------------------------- helpers

def _result_lines(stdout: str):
    recs = []
    for ln in stdout.splitlines():
        rec = bench._parse_result(ln)
        if rec is not None:
            recs.append(rec)
    return recs


def _bench_env(tmp_path, **extra):
    """Subprocess env for a tmpdir copy of bench.py: CPU backend, repo
    importable, axon sitecustomize dropped (CLAUDE.md: overriding
    PYTHONPATH removes the JAX_PLATFORMS pin)."""
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "PYTHONUNBUFFERED": "1",
        "BENCH_CASE_SHAPE": "32,32,24",
        "BENCH_WIDTH": "8",
        "BENCH_VOLUMES": "4",
        "BENCH_WARMUP_S": "2",
        "BENCH_SKIP_BASELINE": "1",
    })
    env.pop("BENCH_TRAIN", None)
    env.update(extra)
    return env


@pytest.fixture()
def bench_copy(tmp_path):
    dst = tmp_path / "bench.py"
    shutil.copy(os.path.join(REPO, "bench.py"), dst)
    return dst


# ------------------------------------------------------------ unit layer

def test_parse_result_accepts_only_metric_dicts():
    line = json.dumps({"metric": "m", "value": 1.0, "unit": "volumes/min",
                       "vs_baseline": None})
    assert bench._parse_result(line)["value"] == 1.0
    assert bench._parse_result("chunk 3: 2.1s -> 114 volumes/min") is None
    assert bench._parse_result("{not json") is None
    assert bench._parse_result(json.dumps([1, 2])) is None   # non-dict JSON
    assert bench._parse_result(json.dumps({"value": 1})) is None  # no metric


def test_metric_name_carries_every_mode_knob(tmp_path):
    """Width, TTA mode and train mode must all be visible in the metric
    string (ADVICE r4: a w64 suite row shipped labeled w48)."""
    # _METRIC is computed at import time from env — subprocess per knob set
    out = subprocess.run(
        [sys.executable, "-c",
         "import bench; print(bench._METRIC)"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "BENCH_TTA": "1", "BENCH_WIDTH": "64"})
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == \
        "equiunet_assp_evo_w64_full_volume_inference_tta16"
    out = subprocess.run(
        [sys.executable, "-c", "import bench; print(bench._METRIC)"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "BENCH_TRAIN": "1", "BENCH_TRAIN_PATCH": "96"})
    assert out.stdout.strip() == "equiunet_assp_evo_w48_train_step_96cube"


def test_result_line_final_partial_and_error_schemas():
    final = json.loads(bench._result_line(107.94, 875.6))
    assert final == {"metric": bench._METRIC, "value": 107.94,
                     "unit": bench._UNIT, "vs_baseline": 875.6}

    part = json.loads(bench._result_line(54.3, None, partial=True, chunks=2))
    assert part["partial"] is True and part["chunks"] == 2
    assert part["vs_baseline"] is None

    err = json.loads(bench._result_line(None, None, error="x" * 900,
                                        stage="tpu_backend_init"))
    assert err["value"] is None
    assert len(err["error"]) == 500           # truncated, still one line
    assert err["stage"] == "tpu_backend_init"


def test_baseline_cache_keyed_schema_and_legacy_migration(tmp_path,
                                                          monkeypatch):
    path = str(tmp_path / "baseline.json")

    # legacy flat record == the flagship default key only
    with open(path, "w") as f:
        json.dump({"volumes_per_min": 0.123, "n_iter": 2}, f)
    assert bench._read_cached_baseline(path, "volumes_per_min") == 0.123

    # a non-default configuration must NOT reuse the flagship baseline
    monkeypatch.setattr(bench, "WIDTH", 64)
    assert bench._read_cached_baseline(path, "volumes_per_min") is None

    # writing the w64 entry migrates the legacy record into by_key
    bench._write_cached_baseline(path, "volumes_per_min", 0.207, 2)
    assert bench._read_cached_baseline(path, "volumes_per_min") == 0.207
    monkeypatch.setattr(bench, "WIDTH", 48)
    assert bench._read_cached_baseline(path, "volumes_per_min") == 0.123
    with open(path) as f:
        rec = json.load(f)
    assert set(rec["by_key"]) == {"infer_240x240x155_w48",
                                  "infer_240x240x155_w64"}


def test_marker_records_legacy_and_current_schemas(tmp_path):
    path = str(tmp_path / "marker.json")
    assert bench._marker_records(path) == []          # missing file

    with open(path, "w") as f:                        # legacy single record
        json.dump({"verified": True, "shape": [200, 200, 136, 4]}, f)
    recs = bench._marker_records(path)
    assert recs == [{"shape": [200, 200, 136, 4], "wire": "int16"}]

    with open(path, "w") as f:                        # current multi-record
        json.dump({"verified": True, "records": [
            {"shape": [200, 200, 136, 4], "wire": "int16"},
            {"shape": [200, 200, 136, 4], "wire": "narrow9"}]}, f)
    assert len(bench._marker_records(path)) == 2


def test_better_never_lets_an_error_line_shadow_a_measurement():
    """A child that streams a good partial and THEN crashes prints a
    final error record (value None, no 'partial' key). 'Final beats
    partial' must not apply across the value/no-value divide, or a real
    measurement gets discarded (the r3/r4 red-artifact class)."""
    part = {"metric": "m", "value": 42.5, "partial": True, "chunks": 2}
    err = {"metric": "m", "value": None, "error": "boom", "stage": "chunk"}
    final = {"metric": "m", "value": 50.0}
    assert bench._better(part, err) is part
    assert bench._better(err, part) is part
    assert bench._better(part, final) is final     # final beats partial
    assert bench._better(final, err) is final
    assert bench._better(None, err) is err         # error > nothing at all
    more = {"metric": "m", "value": 43.0, "partial": True, "chunks": 3}
    assert bench._better(part, more) is more       # more chunks wins
    assert bench._better(more, part) is more


def test_run_attempt_keeps_partial_when_child_crashes_after_it(tmp_path,
                                                               monkeypatch):
    """Child emits a real partial measurement, then dies with an error
    line (the in-child exception handler's output). _run_attempt must
    return the measurement, not the error record."""
    stub = tmp_path / "child.py"
    stub.write_text(
        "import json, sys\n"
        "print(json.dumps({'metric': 'm', 'value': 42.5, 'unit':\n"
        "    'volumes/min', 'vs_baseline': None, 'partial': True,\n"
        "    'chunks': 2}), flush=True)\n"
        "print(json.dumps({'metric': 'm', 'value': None, 'unit':\n"
        "    'volumes/min', 'vs_baseline': None,\n"
        "    'error': 'RuntimeError: transfer failed',\n"
        "    'stage': 'chunk'}), flush=True)\n"
        "sys.exit(1)\n")

    real_popen = subprocess.Popen
    monkeypatch.setattr(
        subprocess, "Popen",
        lambda argv, **kw: real_popen([sys.executable, str(stub)], **kw))
    rc, last = bench._run_attempt(30.0)
    assert rc == 1
    assert last["value"] == 42.5 and last["partial"] is True


def test_run_attempt_salvages_result_from_killed_child(tmp_path,
                                                       monkeypatch):
    """The r4 failure mode: a child doing real work is killed by the
    attempt timeout.  The parent must return its last streamed partial
    line, not nothing (VERDICT r4 #1b)."""
    stub = tmp_path / "child.py"
    stub.write_text(
        "import json, sys, time\n"
        "print('warmup noise', flush=True)\n"
        "print(json.dumps({'metric': 'm', 'value': 42.5, 'unit':\n"
        "    'volumes/min', 'vs_baseline': None, 'partial': True,\n"
        "    'chunks': 1}), flush=True)\n"
        "time.sleep(120)\n")

    real_popen = subprocess.Popen

    def fake_popen(argv, **kw):
        return real_popen([sys.executable, str(stub)], **kw)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    t0 = time.time()
    rc, last = bench._run_attempt(6.0)
    assert rc == 124                        # killed at the attempt timeout
    assert time.time() - t0 < 60.0          # did not wait for the sleep
    assert last is not None and last["value"] == 42.5
    assert last["partial"] is True and last["chunks"] == 1


def test_run_attempt_passes_through_clean_final_result(tmp_path,
                                                       monkeypatch):
    stub = tmp_path / "child.py"
    stub.write_text(
        "import json\n"
        "print(json.dumps({'metric': 'm', 'value': 10.0, 'unit':\n"
        "    'volumes/min', 'vs_baseline': None, 'partial': True,\n"
        "    'chunks': 1}), flush=True)\n"
        "print(json.dumps({'metric': 'm', 'value': 11.0, 'unit':\n"
        "    'volumes/min', 'vs_baseline': 89.4}), flush=True)\n")

    real_popen = subprocess.Popen
    monkeypatch.setattr(
        subprocess, "Popen",
        lambda argv, **kw: real_popen([sys.executable, str(stub)], **kw))
    rc, last = bench._run_attempt(30.0)
    assert rc == 0
    assert last["value"] == 11.0 and not last.get("partial")


# ------------------------------------------------------- end-to-end layer

def test_exhausted_total_budget_still_emits_one_json_line(bench_copy,
                                                          tmp_path):
    """BENCH_TOTAL_BUDGET below the 180 s attempt floor: no attempt may
    start, yet stdout must end with exactly one structured JSON line."""
    env = _bench_env(tmp_path, BENCH_TOTAL_BUDGET="100")
    proc = subprocess.run([sys.executable, str(bench_copy)],
                          capture_output=True, text=True, timeout=120,
                          env=env, cwd=str(tmp_path))
    assert proc.returncode == 1
    recs = _result_lines(proc.stdout)
    assert len(recs) == 1
    assert recs[0]["value"] is None and "error" in recs[0]


def test_bench_train_mode_end_to_end_cpu_tiny(bench_copy, tmp_path):
    """BENCH_TRAIN=1 through the same parent→child pipeline: the train
    step (dice+Ranger, remat=norm) measures, streams per-group partials,
    and labels its metric with width and patch."""
    env = _bench_env(tmp_path, BENCH_TRAIN="1", BENCH_TRAIN_PATCH="16",
                     BENCH_TRAIN_STEPS="8", BENCH_TOTAL_BUDGET="540",
                     BENCH_RETRIES="1", BENCH_ATTEMPT_TIMEOUT="480")
    proc = subprocess.run([sys.executable, str(bench_copy)],
                          capture_output=True, text=True, timeout=560,
                          env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-2000:]
    recs = _result_lines(proc.stdout)
    assert any(r.get("partial") for r in recs[:-1])
    final = recs[-1]
    assert final["metric"] == "equiunet_assp_evo_w8_train_step_16cube"
    assert final["unit"] == "steps/min"
    assert final["value"] and final["value"] > 0
    assert not final.get("partial") and "error" not in final


def test_bench_end_to_end_cpu_tiny_streams_partials(bench_copy, tmp_path):
    """The full parent→child pipeline at toy scale on CPU: rc=0, at least
    one streamed partial line BEFORE the final line, a positive final
    value, sparse-wire parity verified and marker-cached in the COPY's
    directory (the repo artifacts untouched)."""
    repo_marker = os.path.join(REPO, ".bench_sparse_verified.json")
    before = open(repo_marker).read() if os.path.exists(repo_marker) else None

    env = _bench_env(tmp_path, BENCH_TOTAL_BUDGET="540", BENCH_RETRIES="1",
                     BENCH_ATTEMPT_TIMEOUT="480")
    proc = subprocess.run([sys.executable, str(bench_copy)],
                          capture_output=True, text=True, timeout=560,
                          env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-2000:]
    recs = _result_lines(proc.stdout)
    assert len(recs) >= 2, f"expected streamed partials, got {recs}"
    assert any(r.get("partial") for r in recs[:-1])

    final = recs[-1]
    assert final["metric"] == "equiunet_assp_evo_w8_full_volume_inference"
    assert final["unit"] == "volumes/min"
    assert final["value"] and final["value"] > 0
    assert not final.get("partial") and "error" not in final
    # parity ran (no marker existed for the tiny shape) and was cached
    # next to the COPY
    assert "sparse/dense label parity OK" in proc.stderr
    marker = json.load(open(tmp_path / ".bench_sparse_verified.json"))
    assert marker["verified"] is True

    after = open(repo_marker).read() if os.path.exists(repo_marker) else None
    assert after == before, "repo parity marker was mutated by the test"


def test_suite_merge_never_replaces_green_with_red():
    """bench_suite --merge recaptures a row; a failed recapture must keep
    the existing green measurement (recording the failure alongside)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_suite", os.path.join(REPO, "scripts", "bench_suite.py"))
    suite = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(suite)

    rows = {"w64_sparse": {"rc": 0, "value": 73.7, "unit": "volumes/min"}}
    red = {"rc": 1, "error": "relay outage"}
    kept = suite.merge_row(rows, "w64_sparse", red)
    assert kept["rc"] == 0 and kept["value"] == 73.7
    assert kept["failed_recapture"]["rc"] == 1

    green = {"rc": 0, "value": 105.3, "unit": "volumes/min"}
    assert suite.merge_row(rows, "w64_sparse", green) is green
    # red-over-red and brand-new rows pass through unchanged
    assert suite.merge_row({"x": {"rc": 1}}, "x", red) is red
    assert suite.merge_row({}, "new", red) is red
