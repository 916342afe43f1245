"""Numerical parity vs torch (the reference's backend) for the semantics the
rebuild must preserve within 1e-3 (SURVEY.md §7 hard parts): trilinear
align-corners upsampling, GroupNorm/InstanceNorm, CE, EvoNorm group-std."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_trilinear_upsample_matches_torch(rng):
    from brats21_tpu.models.layers import upsample
    x = rng.standard_normal((1, 5, 7, 6, 3)).astype(np.float32)
    got = np.asarray(upsample(jnp.asarray(x), 2))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))  # NCDHW
    want = torch.nn.functional.interpolate(
        xt, scale_factor=2, mode="trilinear", align_corners=True)
    want = np.moveaxis(want.numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_trilinear_resize_odd_sizes(rng):
    from brats21_tpu.models.layers import resize_trilinear
    x = rng.standard_normal((1, 5, 5, 5, 2)).astype(np.float32)
    got = np.asarray(resize_trilinear(jnp.asarray(x), (9, 11, 7)))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    want = torch.nn.functional.interpolate(
        xt, size=(9, 11, 7), mode="trilinear", align_corners=True)
    want = np.moveaxis(want.numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_group_norm_matches_torch(rng):
    from brats21_tpu.models.layers import GroupNorm
    x = rng.standard_normal((2, 4, 4, 4, 16)).astype(np.float32)
    layer = GroupNorm(num_groups=8)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(layer.apply(params, jnp.asarray(x)))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    gn = torch.nn.GroupNorm(8, 16, affine=True)
    with torch.no_grad():
        want = np.moveaxis(gn(xt).numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    from brats21_tpu.models.layers import InstanceNorm
    x = rng.standard_normal((2, 4, 5, 3, 6)).astype(np.float32)
    layer = InstanceNorm()
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(layer.apply(params, jnp.asarray(x)))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    inorm = torch.nn.InstanceNorm3d(6, affine=True)
    with torch.no_grad():
        want = np.moveaxis(inorm(xt).numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cross_entropy_matches_torch(rng):
    from brats21_tpu.learning.losses import cross_entropy_loss
    logits = rng.standard_normal((2, 4, 4, 4, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (2, 4, 4, 4))
    target = np.eye(3, dtype=np.float32)[labels]
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
    want = torch.nn.functional.cross_entropy(
        lt, torch.from_numpy(labels)).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_bce_matches_torch_formula(rng):
    from brats21_tpu.learning.losses import focal_loss
    logits = rng.standard_normal((1, 4, 4, 4, 3)).astype(np.float32)
    target = (rng.random((1, 4, 4, 4, 3)) > 0.5).astype(np.float32)
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(target)))
    i = torch.from_numpy(logits)
    t = torch.from_numpy(target)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        i, t, reduction="none")
    invprobs = torch.nn.functional.logsigmoid(-i * (t * 2 - 1))
    want = ((invprobs * 2.0).exp() * ce).mean().item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_evonorm_group_std_matches_torch_var(rng):
    from brats21_tpu.models.assp_evo import group_std
    x = rng.standard_normal((2, 4, 4, 4, 16)).astype(np.float32)
    got = np.asarray(group_std(jnp.asarray(x), groups=8))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))  # N,C,D,H,W
    n, c, d, h, w = xt.shape
    grouped = xt.reshape(n, 8, c // 8, d, h, w)
    var = grouped.var(dim=(2, 3, 4, 5), keepdim=True).expand_as(grouped)
    want = np.moveaxis(
        (var + 1e-5).sqrt().reshape(n, c, d, h, w).numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_maxpool_matches_torch(rng):
    from brats21_tpu.models.layers import max_pool3d
    x = rng.standard_normal((1, 6, 6, 6, 4)).astype(np.float32)
    got = np.asarray(max_pool3d(jnp.asarray(x)))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    want = np.moveaxis(torch.nn.functional.max_pool3d(xt, 2, 2).numpy(), 1, -1)
    np.testing.assert_allclose(got, want)
    # ceil mode on odd size
    x = rng.standard_normal((1, 5, 5, 5, 2)).astype(np.float32)
    got = np.asarray(max_pool3d(jnp.asarray(x), ceil_mode=True))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    want = np.moveaxis(torch.nn.functional.max_pool3d(
        xt, 2, 2, ceil_mode=True).numpy(), 1, -1)
    np.testing.assert_allclose(got, want)
