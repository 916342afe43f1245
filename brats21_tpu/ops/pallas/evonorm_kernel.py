"""Fused EvoNorm-S0 apply kernel.

EvoNorm-S0 (models/assp_evo.py, reference equiunet2021.py:95-103) is
``swish(x) / group_std(x) · γ + β``. The group moments are a cheap XLA
reduction; the apply pass — swish, broadcasted divide, affine — is fused
here into one VMEM-tiled kernel so the volume is read once and written once
with all arithmetic on the VPU, instead of relying on XLA's fusion choices
for the 5 elementwise ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode

TILE_S = 512


def _apply_kernel(x_ref, inv_std_ref, gamma_ref, beta_ref, out_ref):
    x = x_ref[:]                      # [1, TILE_S, C] fp32
    inv = inv_std_ref[:]              # [1, 1, C] per-batch inv std (bcast)
    gamma = gamma_ref[:]              # [1, 1, C]
    beta = beta_ref[:]
    y = x * jax.nn.sigmoid(x) * inv * gamma + beta
    out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def evonorm_s0_pallas(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                      groups: int = 8, eps: float = 1e-5) -> jax.Array:
    """x: [B, D, H, W, C] → EvoNorm-S0 output, fp32 compute."""
    b = x.shape[0]
    c = x.shape[-1]
    g = min(groups, c)
    spatial = x.shape[1:-1]
    s = 1
    for d in spatial:
        s *= d
    xf = x.reshape(b, s, c).astype(jnp.float32)

    # group moments (XLA reduction) with the reference's unbiased variance
    xg = xf.reshape(b, s, g, c // g)
    n = s * (c // g)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).sum(axis=(1, 3), keepdims=True) / max(n - 1, 1)
    inv_std = jax.lax.rsqrt(var + eps)                     # [b, 1, g, 1]
    inv_std_c = jnp.broadcast_to(inv_std, (b, 1, g, c // g)).reshape(b, 1, c)

    pad = (-s) % TILE_S
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))
    sp = xf.shape[1]

    out = pl.pallas_call(
        _apply_kernel,
        out_shape=jax.ShapeDtypeStruct((b, sp, c), jnp.float32),
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
    )(xf, inv_std_c, gamma.reshape(1, 1, c).astype(jnp.float32),
      beta.reshape(1, 1, c).astype(jnp.float32))
    if pad:
        out = out[:, :s]
    return out.reshape(x.shape).astype(x.dtype)
