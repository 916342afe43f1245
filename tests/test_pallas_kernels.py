"""Pallas kernels in interpreter mode vs their XLA twins."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setenv("BRATS21_PALLAS", "interpret")


def test_envelope_matches_scan(rng):
    from brats21_tpu.ops.edt import _envelope_1d
    from brats21_tpu.ops.pallas.edt_kernel import envelope_last_axis
    g = jnp.asarray(np.where(rng.random((7, 33)) > 0.5, 0.0, 1e12),
                    jnp.float32)
    want = np.asarray(_envelope_1d(g))
    got = np.asarray(envelope_last_axis(g))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_envelope_with_sampling(rng):
    from brats21_tpu.ops.edt import _envelope_1d
    from brats21_tpu.ops.pallas.edt_kernel import envelope_last_axis
    g = jnp.asarray(np.where(rng.random((5, 17)) > 0.3, 0.0, 1e12),
                    jnp.float32)
    want = np.asarray(_envelope_1d(g, 2.5))
    got = np.asarray(envelope_last_axis(g, 2.5))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_edt_via_pallas_matches_scipy(rng):
    from scipy import ndimage
    from brats21_tpu.ops import edt as jedt
    mask = rng.random((9, 11, 7)) > 0.6
    got = np.asarray(jedt.edt(mask))
    want = ndimage.distance_transform_edt(mask)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_evonorm_pallas_matches_xla(rng):
    from brats21_tpu.ops.pallas.evonorm_kernel import evonorm_s0_pallas
    from brats21_tpu.models.assp_evo import group_std
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 16)), jnp.float32)
    gamma = jnp.asarray(rng.random(16), jnp.float32)
    beta = jnp.asarray(rng.random(16), jnp.float32)
    want = np.asarray(x * jnp.asarray(1 / (1 + np.exp(-np.asarray(x))))
                      / group_std(x, 8) * gamma + beta)
    got = np.asarray(evonorm_s0_pallas(x, gamma, beta, groups=8))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
