"""Ranger2020 (RAdam + Lookahead + gradient centralization + norm-loss) as an
optax transformation chain.

Faithful port of reference learning/optimizer.py:62-255 semantics, expressed
functionally: all state (exp_avg, exp_avg_sq, slow lookahead weights, step
count) lives in the optax state pytree, so the whole optimizer update jits
into the train step and shards with the params.

Layout note: torch centralizes conv gradients over dims 1..n-1 of
[out, in, k, k, k]; flax kernels are [k, k, k, in, out], so the reduction
runs over all axes *except the last* (the output-feature axis).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import chex
import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, optax.Schedule]


# EvoNorm affine params are registered rank-5 ``(1, C, 1, 1, 1)`` in the
# reference (equiunet2021.py:75-78), so its GC centers their grads over the
# channel axis (dim 5 passes BOTH the >1 and conv_only >3 gates). Our flax
# twins are rank-1 ``(c,)`` and would be skipped — a real backward-chain
# deviation found while building the whole-model train-step goldens
# (VERDICT r3 #3). Matched by name.
_TORCH_RANK5_AFFINE = ("gamma", "beta", "v")


def _centralize(g: chex.Array, conv_only: bool,
                name: str = "") -> chex.Array:
    """Gradient centralization (optimizer.py:11-20): subtract the mean over
    all non-output axes; fc layers included unless conv_only."""
    if g.ndim == 1 and name in _TORCH_RANK5_AFFINE:
        # torch layout (1,C,1,1,1): mean over dims 1..4 is the global mean
        return g - g.mean()
    if conv_only:
        apply = g.ndim > 3
    else:
        apply = g.ndim > 1
    if not apply:
        return g
    axes = tuple(range(g.ndim - 1))
    return g - g.mean(axis=axes, keepdims=True)


def _leaf_name(path) -> str:
    """Last key of a tree_map_with_path key-path, as a plain string."""
    if not path:
        return ""
    last = path[-1]
    return str(getattr(last, "key", getattr(last, "name", last)))


def _normalize_gradient(g: chex.Array, eps: float = 1e-8) -> chex.Array:
    """Std-normalize gradients (optimizer.py:23-36, use_channels=False);
    torch .std() is Bessel-corrected (ddof=1)."""
    if g.size > 2:
        return g / (g.std(ddof=1) + eps)
    return g


def _unit_norm(x: chex.Array) -> chex.Array:
    """Axis-based euclidean norm (optimizer.py:39-59). torch reduces dim 1
    for ranks 2-3: rank-2 dense kernels are TRANSPOSED in flax ([in,out] vs
    [out,in]) so torch dim 1 is our axis 0, but rank-3 params (BCNorm's
    (1,g,1), factory.py:132-133) keep the torch layout, so dim 1 stays
    axis 1."""
    if x.ndim <= 1:
        return jnp.linalg.norm(x)
    if x.ndim == 2:
        axes = (0,)
    elif x.ndim == 3:
        axes = (1,)
    else:
        axes = tuple(range(x.ndim - 1))
    return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))


def _agc_unitwise_norm(x: chex.Array) -> chex.Array:
    """The reference AGC's unitwise norm (lr_scheduler.py:114-130) mapped
    to flax layouts. torch reduces [out, in] over dim 0 and
    [out, in, k, k(, k)] over dims 1..n-1; flax stores the transposed
    [in, out] and [k(, k), k, in, out], so the same units are:
    ndim 2-3 → reduce the LAST axis; ndim 4-5 → all but the last."""
    if x.ndim <= 1:
        return jnp.linalg.norm(x)
    if x.ndim in (2, 3):
        axes = (x.ndim - 1,)
    else:
        axes = tuple(range(x.ndim - 1))
    return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))


def adaptive_grad_clip(clipping: float = 1e-2,
                       eps: float = 1e-3) -> optax.GradientTransformation:
    """Adaptive Gradient Clipping with the reference's exact semantics
    (lr_scheduler.py:133-215): per-unit ``g ← g·max_norm/max(‖g‖, 1e-6)``
    where ``max_norm = clipping·max(‖p‖, eps)``, triggered only where
    ``‖g‖ > max_norm``. Replaces optax.adaptive_grad_clip, which (a)
    raises on 5D conv kernels and (b) reduces linear layers over the
    opposite axis."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(grads, state, params=None):
        assert params is not None, "adaptive_grad_clip requires params"

        def clip(g, p):
            param_norm = jnp.maximum(_agc_unitwise_norm(p), eps)
            grad_norm = _agc_unitwise_norm(g)
            max_norm = param_norm * clipping
            clipped = g * (max_norm / jnp.maximum(grad_norm, 1e-6))
            return jnp.where(grad_norm > max_norm, clipped, g)

        return jax.tree_util.tree_map(clip, grads, params), state

    return optax.GradientTransformation(init, update)


class RangerState(NamedTuple):
    count: chex.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    slow: optax.Params


def ranger(learning_rate: ScalarOrSchedule,
           alpha: float = 0.5,
           k: int = 6,
           n_sma_threshold: float = 5,
           b1: float = 0.95,
           b2: float = 0.999,
           eps: float = 1e-5,
           weight_decay: float = 0.0,
           use_gc: bool = False,
           use_gcnorm: bool = False,
           normloss: bool = False,
           normloss_factor: float = 1e-4,
           gc_conv_only: bool = False,
           ) -> optax.GradientTransformation:
    """Ranger2020 with the definer.py:316-331 parameter surface."""

    def lr_at(count: chex.Array) -> chex.Array:
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate, jnp.float32)

    def init(params: optax.Params) -> RangerState:
        zeros = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        # force a copy: astype on an already-fp32 param aliases the buffer,
        # which breaks donation of (params, opt_state) together
        slow = jax.tree_util.tree_map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)
        return RangerState(count=jnp.zeros([], jnp.int32), exp_avg=zeros,
                           exp_avg_sq=jax.tree_util.tree_map(jnp.copy, zeros),
                           slow=slow)

    def update(grads: optax.Updates, state: RangerState,
               params: Optional[optax.Params] = None) -> tuple:
        assert params is not None, "ranger requires params"
        step = state.count + 1
        stepf = step.astype(jnp.float32)
        lr = lr_at(state.count)

        grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
        if use_gc:  # gc_loc=True in the reference config (definer.py:330)
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: _centralize(g, gc_conv_only,
                                            _leaf_name(path)), grads)
        if use_gcnorm:
            grads = jax.tree_util.tree_map(_normalize_gradient, grads)

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.exp_avg_sq, grads)

        # beta powers via exp/expm1: the naive fp32 ``1 - b2**t`` loses
        # ~5 significant digits near t=1 (b2=0.999 → cancellation), which
        # perturbs N_sma by O(1e-2) and the rectified step size by
        # O(1e-5) relative — enough to drift from the reference's
        # float64-scalar trajectory (optimizer.py:214-222). expm1 keeps
        # both to fp32 roundoff.
        import math
        log_b1, log_b2 = math.log(b1), math.log(b2)
        beta2_t = jnp.exp(stepf * log_b2)
        one_m_beta2_t = -jnp.expm1(stepf * log_b2)
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * stepf * beta2_t / one_m_beta2_t
        rect = jnp.sqrt(one_m_beta2_t * (n_sma - 4) / (n_sma_max - 4)
                        * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2))
        bias1 = 1.0 / -jnp.expm1(stepf * log_b1)
        use_rect = n_sma > n_sma_threshold
        step_size = jnp.where(use_rect, rect * bias1, bias1)

        def fast_update(p, m, v):
            p32 = p.astype(jnp.float32)
            if normloss:
                # norm-loss scales the params BEFORE the weight-decay term
                # reads them: the reference's in-place ``p.mul_`` aliases
                # ``p_data_fp32`` for fp32 params, so the decay at
                # optimizer.py:236-237 sees the scaled values
                # (optimizer.py:192-198,242-243)
                unorm = _unit_norm(p32)
                correction = 2 * normloss_factor * (1 - 1.0 / (unorm + eps))
                p32 = p32 * (1 - lr * correction)
            adaptive = m / (jnp.sqrt(v) + eps)
            g = jnp.where(use_rect, adaptive, m)
            if weight_decay:
                g = g + weight_decay * p32
            return p32 - step_size * lr * g

        fast = jax.tree_util.tree_map(fast_update, params, exp_avg,
                                      exp_avg_sq)

        # lookahead (optimizer.py:245-253): every k steps blend into slow
        # weights and reset fast to slow.
        sync = (step % k) == 0

        def merge(slow_p, fast_p):
            new_slow = slow_p + alpha * (fast_p - slow_p)
            return jnp.where(sync, new_slow, slow_p)

        new_slow = jax.tree_util.tree_map(merge, state.slow, fast)
        final = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s, f), new_slow, fast)
        updates = jax.tree_util.tree_map(
            lambda f, p: (f - p.astype(jnp.float32)).astype(p.dtype), final, params)
        return updates, RangerState(count=step, exp_avg=exp_avg,
                                    exp_avg_sq=exp_avg_sq, slow=new_slow)

    return optax.GradientTransformation(init, update)


def ranger21(learning_rate: ScalarOrSchedule,
             b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
             weight_decay: float = 1e-4,
             use_gc: bool = False, gc_conv_only: bool = False,
             normloss: bool = False, normloss_factor: float = 1e-4,
             lookahead_k: int = 5, lookahead_alpha: float = 0.5,
             ) -> optax.GradientTransformation:
    """Ranger21 with the definer.py:332-366 configuration (lookahead merge
    time 5, no warmup/warmdown/AGC/cheb — all disabled there). The core is
    the same rectified-RAdam chain with Ranger21's betas/eps/decay."""
    return ranger(learning_rate, alpha=lookahead_alpha, k=lookahead_k,
                  b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
                  use_gc=use_gc, gc_conv_only=gc_conv_only,
                  normloss=normloss, normloss_factor=normloss_factor)
