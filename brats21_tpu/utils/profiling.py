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


def tune_host_allocator(mmap_threshold: int = 1 << 30,
                        trim_threshold: int = 1 << 30) -> bool:
    """Keep big freed numpy buffers on glibc's reusable heap.

    glibc serves allocations above M_MMAP_THRESHOLD (default ≤32 MB) with
    fresh ``mmap`` segments that are unmapped on free — so a volumetric
    pipeline that allocates/frees ~150 MB of numpy arrays per case pays
    hundreds of MB of first-touch page faults per case, forever. On
    lazily-paged VMs (snapshot-restored Firecracker, overcommitted
    hypervisors) those faults measure ~0.5 ms each: 11 MB/s effective
    memcpy, turning a 0.3 s host step into 10+ s (measured,
    docs/BENCHMARKS.md). Raising M_MMAP_THRESHOLD and M_TRIM_THRESHOLD
    makes the heap retain and reuse the warm pages. Called by the CLI
    entry points; BRATS21_NO_MALLOC_TUNE=1 opts out (the cost is retained
    RSS up to the high-water mark of live big buffers)."""
    if os.environ.get("BRATS21_NO_MALLOC_TUNE"):
        return False
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok = bool(libc.mallopt(M_MMAP_THRESHOLD, int(mmap_threshold)))
        ok = bool(libc.mallopt(M_TRIM_THRESHOLD, int(trim_threshold))) and ok
        if ok:
            logger.info("host allocator tuned: mmap/trim thresholds -> "
                        "%d MB", mmap_threshold >> 20)
        return ok
    except Exception as e:  # pragma: no cover — non-glibc platforms
        logger.info("host allocator tuning unavailable: %s", e)
        return False


DEFAULT_CACHE_DIR = "/tmp/brats21_jax_cache"


def _cpu_fingerprint() -> str:
    """Short hash of the host CPU's instruction-set features.

    XLA:CPU persists AOT-compiled machine code; jax's cache key does NOT
    fully capture the compile machine's target features, so a cache written
    before a VM snapshot-restore onto different silicon gets loaded with
    ``cpu_aot_loader: Machine type ... doesn't match — could lead to
    execution errors such as SIGILL`` (observed live on this host). Keying
    the CPU cache directory by the feature set makes such reuse
    impossible."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None,
                             log_compiles: bool = False) -> str:
    """Persistent XLA compilation cache for every CLI entry point.

    Full-volume graphs cost 2-8 min to compile through the axon
    remote-compile service (one-time ~30 s on a TPU-VM); caching on disk
    makes the second process invocation on the same shapes skip it
    entirely. Also turns on ``jax_log_compiles`` so the run log records
    compile vs run time per jitted executable."""
    if jax.process_count() > 1:
        # multi-process runs skip the persistent cache: reloading a
        # cross-process executable from disk breaks its collective setup
        # (measured: warm-cache 2-proc runs deadlock at the first psum,
        # cold-cache runs pass) — fresh compiles are symmetric and safe
        logger.info("multi-process run: persistent XLA cache disabled")
        return ""
    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_CACHE_DIR)
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover — backend init failure
        backend = "unknown"
    if backend == "cpu":
        # CPU executables are host-machine-code: never share them across
        # CPU models (see _cpu_fingerprint). Idempotent: a second call in
        # the same process (or a child inheriting the env var) must not
        # nest another fingerprint level.
        leaf = f"cpu-{_cpu_fingerprint()}"
        if os.path.basename(os.path.normpath(cache_dir)) != leaf:
            cache_dir = os.path.join(cache_dir, leaf)
        os.makedirs(cache_dir, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every executable, however fast its compile was
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        if log_compiles or os.environ.get("BRATS21_LOG_COMPILES"):
            jax.config.update("jax_log_compiles", True)
    except Exception as e:  # pragma: no cover - config name drift
        logger.warning("compilation cache not enabled: %s", e)
    logger.info("XLA compilation cache at %s", cache_dir)
    return cache_dir
