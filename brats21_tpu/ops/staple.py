"""STAPLE label fusion — EM in JAX (replaces the reference's SimpleITK
``STAPLEImageFilter`` C++ call, transforms.py:650-687).

Warfield et al. 2002: given R binary rater volumes D_r, iterate
  W_v  = f·Π a_r / (f·Π a_r + (1-f)·Π b_r)         (E-step posterior)
  p_r  = Σ W·D_r / Σ W        (sensitivity)        (M-step)
  q_r  = Σ (1-W)(1-D_r) / Σ (1-W)  (specificity)
with the foreground prior f set to the mean foreground fraction of the
raters. Runs as a ``lax.while_loop`` to tolerance (max 10000 iterations,
matching staple_filter.SetMaximumIterations, transforms.py:675).
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("max_iterations",))
def staple_binary(decisions: Array, tol: float = 1e-7,
                  max_iterations: int = 10000) -> Array:
    """Posterior foreground probability [*(spatial)] from rater stack
    [R, *(spatial)] of {0,1}."""
    r = decisions.shape[0]
    d = decisions.reshape(r, -1).astype(jnp.float32)
    f = jnp.clip(d.mean(), 1e-5, 1.0 - 1e-5)

    p0 = jnp.full((r, 1), 0.99999, jnp.float32)
    q0 = jnp.full((r, 1), 0.99999, jnp.float32)

    def e_step(p, q):
        # log-domain products for numerical stability
        log_a = d * jnp.log(p) + (1 - d) * jnp.log1p(-p)
        log_b = d * jnp.log1p(-q) + (1 - d) * jnp.log(q)
        la = jnp.log(f) + log_a.sum(axis=0)
        lb = jnp.log1p(-f) + log_b.sum(axis=0)
        m = jnp.maximum(la, lb)
        return jnp.exp(la - m) / (jnp.exp(la - m) + jnp.exp(lb - m))

    def cond(state):
        _, _, _, delta, it = state
        return (delta > tol) & (it < max_iterations)

    def body(state):
        p, q, _, _, it = state
        w = e_step(p, q)
        sum_w = w.sum() + 1e-10
        sum_nw = (1 - w).sum() + 1e-10
        new_p = jnp.clip((w[None] * d).sum(axis=1, keepdims=True) / sum_w,
                         1e-5, 1 - 1e-5)
        new_q = jnp.clip(((1 - w)[None] * (1 - d)).sum(axis=1, keepdims=True)
                         / sum_nw, 1e-5, 1 - 1e-5)
        delta = jnp.maximum(jnp.abs(new_p - p).max(), jnp.abs(new_q - q).max())
        return new_p, new_q, w, delta, it + 1

    w0 = e_step(p0, q0)
    p, q, w, _, _ = jax.lax.while_loop(
        cond, body, (p0, q0, w0, jnp.float32(1.0), jnp.int32(0)))
    w = e_step(p, q)
    return w.reshape(decisions.shape[1:])


def staple_multichannel(members: Array, threshold_value: float = 0.5) -> Array:
    """perform_staple_on_brats_multi_channel (transforms.py:650-687): per
    WT/TC/ET channel binary STAPLE over ensemble members, thresholded.

    members: [M, B, X, Y, Z, 3] binarized predictions → [B, X, Y, Z, 3].
    """
    m, b = members.shape[0], members.shape[1]
    assert b == 1, "For the moment only BS1 is supported"  # transforms.py:653
    chans = []
    for c in range(members.shape[-1]):
        w = staple_binary(members[:, 0, ..., c])
        chans.append((w > threshold_value).astype(jnp.float32))
    return jnp.stack(chans, axis=-1)[None]
