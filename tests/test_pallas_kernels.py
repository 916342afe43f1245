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


def test_evonorm_custom_vjp_grads_match_xla(rng):
    """evonorm_s0 (Pallas fwd + recompute bwd) is gradient-identical to the
    plain XLA formula."""
    import jax
    from brats21_tpu.ops.pallas.evonorm_kernel import (_evonorm_s0_xla,
                                                       evonorm_s0)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 8, 16)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(16), jnp.float32)

    def loss_pallas(x, g, b):
        return jnp.sum(evonorm_s0(x, g, b, 8, 1e-5) ** 2)

    def loss_xla(x, g, b):
        return jnp.sum(_evonorm_s0_xla(x, g, b, 8, 1e-5) ** 2)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


def test_evonorm_module_pallas_path_matches_xla(rng):
    """EvoNorm3D(use_pallas=True) output == the XLA module path, bf16 in."""
    import jax
    from brats21_tpu.models.assp_evo import EvoNorm3D
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 6, 16)), jnp.bfloat16)
    m_x = EvoNorm3D(use_pallas=False)
    m_p = EvoNorm3D(use_pallas=True)
    variables = m_x.init(jax.random.PRNGKey(0), x)
    # non-trivial affine params
    variables = {"params": {
        "gamma": jnp.asarray(rng.standard_normal(16), jnp.float32),
        "beta": jnp.asarray(rng.standard_normal(16), jnp.float32),
        "v": variables["params"]["v"]}}
    want = np.asarray(m_x.apply(variables, x), np.float32)
    got = np.asarray(m_p.apply(variables, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=2e-2)  # bf16 out
    # and exactly in fp32
    xf = x.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(m_p.apply(variables, xf)),
        np.asarray(m_x.apply(variables, xf)), rtol=2e-6, atol=2e-6)


def test_conv3x3x3_pallas_matches_xla(rng):
    """Pallas im2col conv forward == the XLA conv at odd/unaligned shapes
    (exercises the W/H alignment padding, conv3d_kernel.py)."""
    from brats21_tpu.ops.pallas.conv3d_kernel import (_conv3x3x3_xla,
                                                      conv3x3x3)
    for shape, cout in [((1, 6, 11, 7, 5), 9), ((2, 5, 16, 8, 4), 6),
                        ((1, 4, 13, 17, 3), 4)]:
        cin = shape[-1]
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)),
                        jnp.float32) * 0.1
        b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        want = np.asarray(_conv3x3x3_xla(x, w, b))
        got = np.asarray(conv3x3x3(x, w, b))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv3x3x3_custom_vjp_grads_match_xla(rng):
    """conv3x3x3 (Pallas fwd + XLA-recompute bwd) is gradient-identical to
    the plain XLA conv."""
    import jax
    from brats21_tpu.ops.pallas.conv3d_kernel import (_conv3x3x3_xla,
                                                      conv3x3x3)
    x = jnp.asarray(rng.standard_normal((1, 4, 9, 6, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 7)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal(7), jnp.float32)
    got = jax.grad(lambda *a: jnp.sum(conv3x3x3(*a) ** 2),
                   argnums=(0, 1, 2))(x, w, b)
    want = jax.grad(lambda *a: jnp.sum(_conv3x3x3_xla(*a) ** 2),
                    argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_conv3d_module_pallas_path_matches_xla(rng):
    """Conv3d with BRATS21_PALLAS_CONV=1 routes the 3^3/stride-1 case
    through the Pallas kernel with identical (bf16-tolerance) outputs and
    the same nn.Conv-compatible parameter tree."""
    import jax
    from brats21_tpu.models import layers

    x = jnp.asarray(rng.standard_normal((1, 6, 9, 10, 4)), jnp.float32)
    m = layers.Conv3d(features=6, kernel_size=3)
    variables = m.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m.apply(variables, x))

    layers._pallas_conv_default.cache_clear()
    import os
    os.environ["BRATS21_PALLAS_CONV"] = "1"
    try:
        got = np.asarray(m.apply(variables, x))
    finally:
        os.environ.pop("BRATS21_PALLAS_CONV")
        layers._pallas_conv_default.cache_clear()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
