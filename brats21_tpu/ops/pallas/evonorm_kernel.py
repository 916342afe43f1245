"""Fused EvoNorm-S0 kernel (forward) + XLA-recompute backward.

EvoNorm-S0 (models/assp_evo.py, reference equiunet2021.py:95-103) is
``swish(x) / group_std(x) · γ + β``. The group moments are a cheap XLA
reduction (one bf16 read pass); the apply pass — swish, broadcasted
divide, affine — is fused here into one VMEM-tiled kernel so the volume is
read once (bf16) and written once (bf16) with all arithmetic in fp32 on
the VPU, instead of relying on XLA's fusion choices for the 5 elementwise
ops (which round-1 measured materializing fp32 intermediates,
docs/BENCHMARKS.md).

:func:`evonorm_s0` is the trainable entry point: Pallas forward,
``custom_vjp`` backward that re-derives gradients from the plain XLA
formula (recompute instead of residuals — EvoNorm recompute is elementwise
and cheap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode

TILE_S = 512


def _group_inv_std(x: jax.Array, groups: int, eps: float) -> jax.Array:
    """[B, S, C] → [B, 1, C] fp32 reciprocal of the unbiased group std
    (reference torch.var semantics, equiunet2021.py:48-52)."""
    b, s, c = x.shape
    g = groups
    xg = x.reshape(b, s, g, c // g).astype(jnp.float32)
    n = s * (c // g)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).sum(axis=(1, 3), keepdims=True) / max(n - 1, 1)
    inv_std = jax.lax.rsqrt(var + eps)                      # [b, 1, g, 1]
    return jnp.broadcast_to(inv_std, (b, 1, g, c // g)).reshape(b, 1, c)


def _apply_kernel(x_ref, inv_std_ref, gamma_ref, beta_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)  # [1, TILE_S, C]
    inv = inv_std_ref[:]              # [1, 1, C] per-batch inv std (bcast)
    gamma = gamma_ref[:]              # [1, 1, C]
    beta = beta_ref[:]
    y = x * jax.nn.sigmoid(x) * inv * gamma + beta
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def evonorm_s0_pallas(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                      groups: int = 8, eps: float = 1e-5) -> jax.Array:
    """x: [B, D, H, W, C] (any float dtype) → EvoNorm-S0 output, same
    dtype; fp32 compute throughout."""
    b = x.shape[0]
    c = x.shape[-1]
    g = min(groups, c)
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    xr = x.reshape(b, s, c)

    inv_std_c = _group_inv_std(xr, g, eps)                 # XLA reduction

    pad = (-s) % TILE_S
    if pad:
        xr = jnp.pad(xr, ((0, 0), (0, pad), (0, 0)))
    sp = xr.shape[1]

    out = pl.pallas_call(
        _apply_kernel,
        out_shape=jax.ShapeDtypeStruct((b, sp, c), x.dtype),
        grid=(b, sp // TILE_S),
        in_specs=[
            pl.BlockSpec((1, TILE_S, c), lambda i, j: (i, j, 0),
                         memory_space=pl.ANY if interpret_mode()
                         else pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pl.ANY if interpret_mode()
                         else pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0),
                         memory_space=pl.ANY if interpret_mode()
                         else pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0),
                         memory_space=pl.ANY if interpret_mode()
                         else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_S, c), lambda i, j: (i, j, 0),
                               memory_space=pl.ANY if interpret_mode()
                               else pltpu.VMEM),
        interpret=interpret_mode(),
    )(xr, inv_std_c, gamma.reshape(1, 1, c).astype(jnp.float32),
      beta.reshape(1, 1, c).astype(jnp.float32))
    if pad:
        out = out[:, :s]
    return out.reshape(x.shape)


def _evonorm_s0_xla(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                    groups: int, eps: float) -> jax.Array:
    """Reference XLA formula (identical math to models.assp_evo.EvoNorm3D
    S0-efficient) — used for the backward pass."""
    b, c = x.shape[0], x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    xf = x.reshape(b, s, c).astype(jnp.float32)
    inv = _group_inv_std(xf, min(groups, c), eps)
    out = xf * jax.nn.sigmoid(xf) * inv * gamma.reshape(1, 1, c) \
        + beta.reshape(1, 1, c)
    return out.reshape(x.shape).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def evonorm_s0(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               groups: int = 8, eps: float = 1e-5) -> jax.Array:
    """Trainable fused EvoNorm-S0: Pallas forward, XLA-recompute backward."""
    return evonorm_s0_pallas(x, gamma, beta, groups=groups, eps=eps)


def _evonorm_fwd(x, gamma, beta, groups, eps):
    return evonorm_s0_pallas(x, gamma, beta, groups=groups, eps=eps), \
        (x, gamma, beta)


def _evonorm_bwd(groups, eps, residuals, ct):
    x, gamma, beta = residuals
    _, vjp = jax.vjp(
        lambda a, g, b: _evonorm_s0_xla(a, g, b, groups, eps),
        x, gamma, beta)
    return vjp(ct)


evonorm_s0.defvjp(_evonorm_fwd, _evonorm_bwd)
