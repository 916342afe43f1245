"""Loss golden-value tests (numpy references re-deriving MONAI semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from brats21_tpu.config import TrainConfig
from brats21_tpu.learning import losses as L


def _rand(rng, shape):
    return rng.standard_normal(shape).astype(np.float32)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_dice(logits, target, squared=True, jaccard=False, batch=True,
             nr=1e-5, dr=1e-5):
    p = _sigmoid(logits)
    axes = (0, 1, 2, 3) if batch else (1, 2, 3)
    inter = (p * target).sum(axis=axes)
    if squared:
        den = (target ** 2).sum(axis=axes) + (p ** 2).sum(axis=axes)
    else:
        den = target.sum(axis=axes) + p.sum(axis=axes)
    if jaccard:
        den = 2 * (den - inter)
    return np.mean(1 - (2 * inter + nr) / (den + dr))


@pytest.mark.parametrize("jaccard", [False, True])
def test_dice_loss_golden(rng, jaccard):
    logits = _rand(rng, (2, 6, 6, 6, 3))
    target = (rng.random((2, 6, 6, 6, 3)) > 0.5).astype(np.float32)
    got = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(target),
                            jaccard=jaccard))
    want = _np_dice(logits, target, jaccard=jaccard)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_loss_perfect_prediction():
    target = np.zeros((1, 4, 4, 4, 3), np.float32)
    target[0, 1:3, 1:3, 1:3, :] = 1
    logits = np.where(target > 0, 20.0, -20.0).astype(np.float32)
    got = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got < 1e-3


def test_focal_loss_golden(rng):
    logits = _rand(rng, (1, 4, 4, 4, 3))
    target = (rng.random((1, 4, 4, 4, 3)) > 0.5).astype(np.float32)
    i, t = logits, target
    max_val = np.clip(-i, 0, None)
    ce = i - i * t + max_val + np.log(np.exp(-max_val) + np.exp(-i - max_val))
    invprobs = -np.log1p(np.exp(i * (t * 2 - 1)))
    want = np.mean(np.exp(invprobs * 2.0) * ce)
    got = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_tversky_equals_unsquared_dice_at_half(rng):
    # alpha=beta=0.5 Tversky == Dice with non-squared denominator
    logits = _rand(rng, (1, 4, 4, 4, 3))
    target = (rng.random((1, 4, 4, 4, 3)) > 0.5).astype(np.float32)
    tv = float(L.tversky_loss(jnp.asarray(logits), jnp.asarray(target)))
    want = _np_dice(logits, target, squared=False, batch=False)
    np.testing.assert_allclose(tv, want, rtol=1e-5)


def test_cross_entropy_golden(rng):
    logits = _rand(rng, (1, 3, 3, 3, 3))
    target_lab = rng.integers(0, 3, (1, 3, 3, 3))
    target = np.eye(3, dtype=np.float32)[target_lab]
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want = -np.mean(np.log(np.take_along_axis(p, target_lab[..., None], -1)))
    got = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_boundary_loss_is_einsum_mean(rng):
    logits = _rand(rng, (1, 4, 4, 4, 3))
    dmap = _rand(rng, (1, 4, 4, 4, 3))
    got = float(L.boundary_loss(jnp.asarray(logits), jnp.asarray(dmap)))
    want = np.mean(_sigmoid(logits) * dmap)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hausdorff_loss_zero_for_perfect_pred():
    target = np.zeros((1, 8, 8, 8, 3), np.float32)
    target[0, 2:5, 2:5, 2:5, :] = 1
    logits = np.where(target > 0, 20.0, -20.0).astype(np.float32)
    got = float(L.hausdorff_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got < 1e-3


@pytest.mark.parametrize("crit", ["dice", "jaccard", "dice_ce", "dice_focal",
                                  "generalized_dice", "focal", "tversky",
                                  "hd", "dice_hd"])
def test_make_criterion_runs(rng, crit):
    cfg = TrainConfig(criterion=crit)
    fn = L.make_criterion(cfg)
    logits = jnp.asarray(_rand(rng, (1, 8, 8, 8, 3)))
    target = jnp.asarray((rng.random((1, 8, 8, 8, 3)) > 0.5).astype(np.float32))
    val = float(fn(logits, target))
    assert np.isfinite(val)


def test_make_criterion_boundary(rng):
    cfg = TrainConfig(criterion="dice_boundary")
    fn = L.make_criterion(cfg)
    logits = jnp.asarray(_rand(rng, (1, 8, 8, 8, 3)))
    target = jnp.asarray((rng.random((1, 8, 8, 8, 3)) > 0.5).astype(np.float32))
    dmap = jnp.asarray(_rand(rng, (1, 8, 8, 8, 3)))
    assert np.isfinite(float(fn(logits, (target, dmap))))


def test_deep_supervision_loss_mean(rng):
    cfg = TrainConfig(criterion="dice")
    fn = L.make_criterion(cfg)
    logits = jnp.asarray(_rand(rng, (1, 8, 8, 8, 3)))
    deeps = [logits * 0.5, logits * 0.1]
    target = jnp.asarray((rng.random((1, 8, 8, 8, 3)) > 0.5).astype(np.float32))
    total = float(L.deep_supervision_loss(fn, (logits, deeps), target))
    want = np.mean([float(fn(logits, target)), float(fn(logits * 0.5, target)),
                    float(fn(logits * 0.1, target))])
    np.testing.assert_allclose(total, want, rtol=1e-6)


def test_boundary_criterion_with_tuple_target(rng):
    # 'boundary' receives the (seg, dist_map) pair from the engine and must
    # unwrap to the map (reference losses.py:315-317)
    cfg = TrainConfig(criterion="boundary")
    fn = L.make_criterion(cfg)
    logits = jnp.asarray(_rand(rng, (1, 8, 8, 8, 3)))
    seg = jnp.asarray((rng.random((1, 8, 8, 8, 3)) > 0.5).astype(np.float32))
    dmap = jnp.asarray(_rand(rng, (1, 8, 8, 8, 3)))
    val = float(fn(logits, (seg, dmap)))
    direct = float(L.boundary_loss(logits, dmap, idc=[0, 1, 2]))
    np.testing.assert_allclose(val, direct, rtol=1e-6)


def test_dice_hd_batch_false_default(rng):
    # reference DiceHDLoss defaults batch=False: per-item dice then mean
    logits = _rand(rng, (2, 6, 6, 6, 3))
    target = (rng.random((2, 6, 6, 6, 3)) > 0.5).astype(np.float32)
    cfg = TrainConfig(criterion="dice_hd")
    fn = L.make_criterion(cfg)
    got = float(fn(jnp.asarray(logits), jnp.asarray(target)))
    want = (float(L.dice_loss(jnp.asarray(logits), jnp.asarray(target),
                              batch=False))
            + float(L.hausdorff_loss(jnp.asarray(logits), jnp.asarray(target),
                                     idc=[0, 1, 2])))
    np.testing.assert_allclose(got, want, rtol=1e-5)
