"""Optimizer/schedule/train-step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from brats21_tpu.config import TrainConfig
from brats21_tpu.learning.optimizers import make_optimizer
from brats21_tpu.learning.ranger import ranger, _centralize, _unit_norm
from brats21_tpu.learning.schedules import make_lr_schedule
from brats21_tpu.learning.train_state import (TrainState, create_train_state,
                                              make_train_step, swa_update)
from brats21_tpu.learning.losses import make_criterion
from brats21_tpu.models import get_model


def test_centralize_zero_means():
    g = jnp.asarray(np.random.default_rng(0).random((3, 3, 3, 4, 8)), jnp.float32)
    c = _centralize(g, conv_only=False)
    means = c.mean(axis=(0, 1, 2, 3))
    np.testing.assert_allclose(np.asarray(means), 0, atol=1e-6)
    # 1-D params untouched
    b = jnp.ones((5,))
    np.testing.assert_array_equal(np.asarray(_centralize(b, False)), np.ones(5))


def test_ranger_converges_quadratic():
    opt = ranger(1e-1, k=6, alpha=0.5)
    params = {"w": jnp.asarray([5.0, -3.0])}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(800):
        params, state = step(params, state)
    # RAdam's rectifier keeps early steps conservative; 800 steps suffice
    assert float(jnp.abs(params["w"]).max()) < 5e-2


def test_ranger_lookahead_sync():
    # after exactly k steps, params must equal the slow buffer
    opt = ranger(1e-2, k=6, alpha=0.5)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    for i in range(6):
        grads = {"w": jnp.ones((4,))}
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               np.asarray(state.slow["w"]), rtol=1e-6)


def test_flat_cosine_schedule():
    cfg = TrainConfig(decay_type="flat_cosine", learning_rate=3e-4, epochs=100)
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(3e-4)
    assert float(sched(69 * 10)) == pytest.approx(3e-4)  # flat 70%
    assert float(sched(99 * 10)) < 3e-5                   # near-zero at end
    # monotone decrease in anneal region
    assert float(sched(80 * 10)) > float(sched(90 * 10))


def test_cosine_warmup_schedule():
    cfg = TrainConfig(decay_type="cosine_warmup", learning_rate=1e-3, epochs=100)
    sched = make_lr_schedule(cfg, steps_per_epoch=2)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(2 * 2)) < 1e-3  # mid-warmup below base


def test_multistep_schedule():
    cfg = TrainConfig(decay_type="step", learning_rate=1e-2, epochs=100)
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    assert float(sched(0)) == pytest.approx(1e-2)
    assert float(sched(30)) == pytest.approx(1e-3)
    assert float(sched(60)) == pytest.approx(1e-4)


@pytest.mark.parametrize("name", ["sgd", "adam", "adamw", "ranger",
                                  "ranger21", "novograd"])
def test_make_optimizer_smoke(name):
    cfg = TrainConfig(optimizer=name, use_gc=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((3, 3))}
    st = tx.init(params)
    upd, _ = tx.update({"w": jnp.ones((3, 3)) * 0.1}, st, params)
    assert jnp.all(jnp.isfinite(upd["w"]))


def test_gradient_accumulation():
    cfg = TrainConfig(optimizer="adam", gradient_accumulation_iter=2,
                      weight_decay=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((2,))}
    st = tx.init(params)
    upd1, st = tx.update({"w": jnp.ones((2,))}, st, params)
    # first micro-step: no parameter change
    np.testing.assert_allclose(np.asarray(upd1["w"]), 0.0)
    upd2, st = tx.update({"w": jnp.ones((2,))}, st, params)
    assert float(jnp.abs(upd2["w"]).max()) > 0


def test_train_step_decreases_loss(synthetic_case):
    cfg = TrainConfig(model="equiunet", width=4, optimizer="adam",
                      learning_rate=1e-3, criterion="dice", epochs=10,
                      decay_type="flat_cosine", weight_decay=0.0)
    model = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=5)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 16, 4)),
                    jnp.float32)
    seg = jnp.asarray((np.random.default_rng(1).random((1, 16, 16, 16, 3)) > 0.7)
                      .astype(np.float32))
    state = create_train_state(model, tx, rng, x)
    step = make_train_step(make_criterion(cfg), use_amp=False)
    losses = []
    for i in range(5):
        state, m = step(state, x, seg, jax.random.fold_in(rng, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_swa_update_averages():
    cfg = TrainConfig(model="equiunet", width=4, optimizer="adam", epochs=10)
    model = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=5)
    x = jnp.ones((1, 16, 16, 16, 4))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x, use_swa=True)
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    state = swa_update(state)
    assert int(state.swa_n) == 1
    np.testing.assert_allclose(np.asarray(jax.tree_util.tree_leaves(state.swa_params)[0]),
                               np.asarray(p0), rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from brats21_tpu.learning.checkpoint import CheckpointManager, resume_state
    cfg = TrainConfig(model="equiunet", width=4, optimizer="adam", epochs=10)
    model = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=5)
    x = jnp.ones((1, 16, 16, 16, 4))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x)
    mgr = CheckpointManager(str(tmp_path), save_on="loss")
    assert mgr.save(state, epoch=1, value=0.5)
    assert not mgr.save(state, epoch=2, value=0.7)   # worse loss: not best
    assert mgr.save(state, epoch=3, value=0.3)
    ckpt = mgr.restore("best_model")
    assert int(ckpt["epoch"]) == 3
    state2, epoch = resume_state(state, mgr.restore("last_model"))
    assert epoch == 3
    leaves = jax.tree_util.tree_leaves(state2.params)
    leaves0 = jax.tree_util.tree_leaves(state.params)
    for a, b in zip(leaves, leaves0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_step_batchnorm_updates_stats():
    # batch-norm path: mutable batch_stats must update through the step
    cfg = TrainConfig(model="equiunet", width=4, norm="batch",
                      optimizer="adam", epochs=5, weight_decay=0.0)
    model = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=5)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 16, 4)),
                    jnp.float32)
    seg = jnp.asarray((np.random.default_rng(1).random((2, 16, 16, 16, 3))
                       > 0.5).astype(np.float32))
    state = create_train_state(model, tx, rng, x)
    assert state.batch_stats, "batch model should carry batch_stats"
    before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    step = make_train_step(make_criterion(cfg), use_amp=False,
                           has_batch_stats=True)
    state, _ = step(state, x, seg, rng)
    after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
