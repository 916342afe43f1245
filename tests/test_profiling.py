"""utils/profiling: persistent-cache machine keying (VERDICT r3 / round 4).

XLA:CPU persists AOT machine code; on a snapshot-restored VM the cache can
outlive the silicon it was compiled for ("could lead to execution errors
such as SIGILL", cpu_aot_loader.cc observed live). The CPU cache dir must
therefore be keyed by the host's CPU feature fingerprint — and the keying
must be idempotent (enable_compilation_cache runs once per CLI, and
children inherit JAX_COMPILATION_CACHE_DIR)."""

import os

import jax
import pytest

from brats21_tpu.utils import profiling


def test_cpu_fingerprint_stable_hex():
    fp1 = profiling._cpu_fingerprint()
    fp2 = profiling._cpu_fingerprint()
    assert fp1 == fp2
    assert len(fp1) == 12
    int(fp1, 16)  # hex


@pytest.fixture()
def _restore_cache_config(monkeypatch):
    """enable_compilation_cache mutates global jax config — restore it so
    the rest of the suite keeps its default (no persistent cache)."""
    old = jax.config.jax_compilation_cache_dir
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    yield
    jax.config.update("jax_compilation_cache_dir", old)


def test_enable_cache_fingerprints_and_is_idempotent(tmp_path,
                                                     _restore_cache_config,
                                                     monkeypatch):
    base = str(tmp_path / "cache")
    leaf = f"cpu-{profiling._cpu_fingerprint()}"

    d1 = profiling.enable_compilation_cache(cache_dir=base)
    assert os.path.basename(d1) == leaf and d1.startswith(base)
    assert os.path.isdir(d1)

    # second call in the same process (env var now carries d1): no nesting
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", d1)
    d2 = profiling.enable_compilation_cache()
    assert d2 == d1, f"nested fingerprint dirs: {d2}"
