"""Unit tests for the eval pipeline's host stages
(learning/engine.py:_IterStage/_SinkStage): error propagation, ordering,
and abandon-safety — the properties the serving path depends on."""

import threading
import time

import pytest

from brats21_tpu.learning.engine import _IterStage, _SinkStage


def test_iter_stage_maps_in_order():
    out = list(_IterStage(iter(range(10)), lambda x: x * 2, depth=2))
    assert out == [x * 2 for x in range(10)]


def test_iter_stage_propagates_fn_error():
    def fn(x):
        if x == 3:
            raise ValueError("poison")
        return x

    stage = _IterStage(iter(range(10)), fn, depth=2)
    got = []
    with pytest.raises(ValueError, match="poison"):
        for item in stage:
            got.append(item)
    assert got == [0, 1, 2]


def test_iter_stage_propagates_source_error():
    def src():
        yield 1
        raise OSError("decode failed")

    with pytest.raises(OSError, match="decode failed"):
        list(_IterStage(src(), lambda x: x, depth=2))


def test_iter_stage_abandoned_consumer_releases_producer():
    produced = []

    def src():
        for i in range(100):
            produced.append(i)
            yield i

    stage = _IterStage(src(), lambda x: x, depth=1)
    assert next(stage) == 0
    stage.close()
    t0 = time.time()
    stage._t.join(timeout=5)
    assert not stage._t.is_alive(), "producer thread leaked after close()"
    assert time.time() - t0 < 5
    # bounded queue: the producer never ran ahead unboundedly
    assert len(produced) < 100


def test_sink_stage_runs_in_submission_order():
    got = []
    sink = _SinkStage(lambda x: got.append(x), depth=2)
    for i in range(20):
        sink.submit(i)
    sink.join()
    assert got == list(range(20))


def test_sink_stage_error_reraises_on_submit_or_join():
    calls = []

    def fn(x):
        calls.append(x)
        if x == 2:
            raise RuntimeError("writer failed")

    sink = _SinkStage(fn, depth=1)
    with pytest.raises(RuntimeError, match="writer failed"):
        for i in range(50):
            sink.submit(i)
            time.sleep(0.01)
    # the worker must not be wedged; close() releases it
    sink.close()
    sink._t.join(timeout=5)
    assert not sink._t.is_alive()


def test_sink_stage_join_reraises_late_error():
    def fn(x):
        if x == 4:
            raise RuntimeError("late failure")

    sink = _SinkStage(fn, depth=8)
    for i in range(5):
        sink.submit(i)        # fits the queue before the worker errors
    with pytest.raises(RuntimeError, match="late failure"):
        sink.join()


def test_stages_compose():
    """prep → main → finish, as evaluate wires them."""
    finished = []
    sink = _SinkStage(lambda x: finished.append(x), depth=2)
    for item in _IterStage(iter(range(25)), lambda x: x + 100, depth=2):
        sink.submit(item)
    sink.join()
    assert finished == [x + 100 for x in range(25)]


def test_sink_stage_concurrent_with_main_thread_work():
    """The finish stage runs while the main thread keeps working."""
    seen_threads = set()

    def fn(x):
        seen_threads.add(threading.current_thread().name)
        time.sleep(0.005)

    sink = _SinkStage(fn, depth=4)
    main = threading.current_thread().name
    for i in range(10):
        sink.submit(i)
    sink.join()
    assert seen_threads and main not in seen_threads


def test_sink_submit_after_close_raises():
    """close() releases the worker without draining; a subsequent submit
    must RAISE, not silently drop the work (a lost NIfTI save otherwise)."""
    sink = _SinkStage(lambda x: None, depth=2)
    sink.close()
    with pytest.raises(RuntimeError, match="after close"):
        sink.submit(1)
