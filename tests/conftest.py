"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

The reference has no test suite (SURVEY.md §4); this framework tests every
layer against golden numpy/scipy references and runs all sharding paths on a
forced multi-device CPU backend (no TPU needed).
"""

import os

# Must happen before jax import anywhere.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's in-process collectives guard their rendezvous with a watchdog
# that LOG(FATAL)s (SIGABRT, no python traceback) when not all virtual
# devices' threads arrive in time — on this 1-core host a loaded scheduler
# can starve 1-2 of the 8 participant callbacks past the default 40 s
# terminate deadline. Root-caused in round 4 from a core dump
# (xla::cpu::InProcessCommunicator::AllGather → AwaitAndLogIfStuck →
# LOG(FATAL), rendezvous.cc:100); this was round 3's "rare in-suite
# SIGABRT". Raise the deadlines: genuine deadlocks still surface as
# bounded hangs WITH the rendezvous warning logs instead of a
# diagnostics-destroying abort. TPU runs are unaffected (cpu-only flags).
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_cache():
    """Drop compiled executables between test modules: a full-suite run in
    one process otherwise accumulates ~200 tests' executables (and their
    thread pools) — on small CI hosts that ends in a native abort.

    Also un-poison global jax config: e2e tests run the CLIs in-process,
    and main() enables the PERSISTENT compilation cache
    (utils/profiling.py) — without restoration every later module silently
    switches to the disk-cache + XLA:CPU AOT-load path, a behavior change
    no other test asked for."""
    cache_dir = jax.config.jax_compilation_cache_dir
    yield
    jax.clear_caches()
    if jax.config.jax_compilation_cache_dir != cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 forced CPU devices, got {devs}"
    return devs


@pytest.fixture(scope="session")
def synthetic_case(tmp_path_factory):
    """A tiny synthetic 4-modality BraTS case on disk (NIfTI), built by the
    framework's own generator."""
    from brats21_tpu.data.synthetic import generate_synthetic_dataset
    root = tmp_path_factory.mktemp("brats_synth")
    generate_synthetic_dataset(str(root), num_cases=5, shape=(48, 48, 32), seed=0)
    return str(root)
