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


def _centralize(g: chex.Array, conv_only: bool) -> chex.Array:
    """Gradient centralization (optimizer.py:11-20): subtract the mean over
    all non-output axes; fc layers included unless conv_only."""
    if conv_only:
        apply = g.ndim > 3
    else:
        apply = g.ndim > 1
    if not apply:
        return g
    axes = tuple(range(g.ndim - 1))
    return g - g.mean(axis=axes, keepdims=True)


def _normalize_gradient(g: chex.Array, eps: float = 1e-8) -> chex.Array:
    """Std-normalize gradients (optimizer.py:23-36, use_channels=False);
    torch .std() is Bessel-corrected (ddof=1)."""
    if g.size > 2:
        return g / (g.std(ddof=1) + eps)
    return g


def _unit_norm(x: chex.Array) -> chex.Array:
    """Axis-based euclidean norm (optimizer.py:39-59)."""
    if x.ndim <= 1:
        return jnp.linalg.norm(x)
    axes = tuple(range(x.ndim - 1)) if x.ndim >= 4 else (0,)
    return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))


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
            grads = jax.tree_util.tree_map(
                lambda g: _centralize(g, gc_conv_only), grads)
        if use_gcnorm:
            grads = jax.tree_util.tree_map(_normalize_gradient, grads)

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.exp_avg_sq, grads)

        beta2_t = b2 ** stepf
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * stepf * beta2_t / (1 - beta2_t)
        rect = jnp.sqrt((1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                        * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2))
        bias1 = 1.0 / (1 - b1 ** stepf)
        use_rect = n_sma > n_sma_threshold
        step_size = jnp.where(use_rect, rect * bias1, bias1)

        def g_grad(m, v, p):
            adaptive = m / (jnp.sqrt(v) + eps)
            g = jnp.where(use_rect, adaptive, m)
            if weight_decay:
                g = g + weight_decay * p.astype(jnp.float32)
            return g

        gg = jax.tree_util.tree_map(g_grad, exp_avg, exp_avg_sq, params)

        def fast_update(p, g):
            p32 = p.astype(jnp.float32)
            if normloss:
                unorm = _unit_norm(p32)
                correction = 2 * normloss_factor * (1 - 1.0 / (unorm + eps))
                p32 = p32 * (1 - lr * correction)
            return p32 - step_size * lr * g

        fast = jax.tree_util.tree_map(fast_update, params, gg)

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
