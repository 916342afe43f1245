"""Profiling & tracing hooks — the subsystem the reference lacks entirely
(SURVEY.md §5: wall-clock meters only, engine.py:81-87).

* :func:`trace_server` — start ``jax.profiler`` so TensorBoard / xprof can
  attach to a live run.
* :func:`annotate` — named trace scopes around pipeline phases.
* :func:`capture` — programmatic trace of a code block to a log dir.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

import jax

from .. import get_logger

logger = get_logger("profiling")

_server = None


def trace_server(port: int = 9999) -> None:
    """Start the profiler server once (idempotent)."""
    global _server
    if _server is None:
        _server = jax.profiler.start_server(port)
        logger.info("jax profiler server listening on %d", port)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named scope visible in xprof traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture(log_dir: str) -> Iterator[None]:
    """Capture a trace of the enclosed block into ``log_dir``."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("trace written to %s", log_dir)


def maybe_enable_from_env() -> None:
    """Env-driven enablement: BRATS21_PROFILE_PORT starts the server,
    suitable for production serving."""
    port = os.environ.get("BRATS21_PROFILE_PORT")
    if port:
        trace_server(int(port))
