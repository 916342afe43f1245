"""Pallas 3×3×3 convolution — im2col-in-VMEM GEMM for lane-starved widths.

Why: XLA lowers a 3³ conv as accumulating taps, so the MXU contracts
K=C_in per pass; at the flagship's width 48 that fills 48/128 of the MXU's
K *and* N dims → ~14% utilization measured (docs/BENCHMARKS.md). This
kernel builds the im2col block ``[TILE_M, 27·C_in]`` in VMEM and issues ONE
``jnp.dot`` per tile, so K=27·C_in saturates the contraction dim; the
ceiling becomes the N=C_out lane fill (48/128 ≈ 37%), ~2.7× the XLA path,
without materializing im2col in HBM (which would be bandwidth suicide:
27× the activation bytes).

Layout: channels-last ``[B, D, H, W, C]``, stride 1, SAME (input is padded
by 1 outside the kernel), fp32 accumulation, output dtype = input dtype.
The halo rows arrive via manual HBM→VMEM async DMA (BlockSpec index maps
cannot express stride-1 overlapping windows).

:func:`conv3x3x3` is the trainable entry point: Pallas forward,
``custom_vjp`` backward via the XLA conv transpose formulas (recompute —
no extra residuals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode

TILE_H = 8  # output rows per program


def _conv_kernel(xp_ref, w_ref, b_ref, out_ref, xtile, im2col, sem):
    # grid: (B, D, H // TILE_H)
    b = pl.program_id(0)
    d = pl.program_id(1)
    ht = pl.program_id(2)
    th = out_ref.shape[2]
    w_out = out_ref.shape[3]
    c_in = xtile.shape[-1]

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(d, 3), pl.ds(ht * th, th + 2)],
        xtile, sem)
    dma.start()
    dma.wait()

    # im2col: [TILE_H * W, 27 * C_in], tap-major in the lane dim
    for i in range(3):
        for j in range(3):
            for k in range(3):
                t = (i * 3 + j) * 3 + k
                patch = xtile[i, j:j + th, k:k + w_out, :]
                im2col[:, t * c_in:(t + 1) * c_in] = patch.reshape(
                    th * w_out, c_in)

    acc = jnp.dot(im2col[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    out_ref[:] = acc.reshape(1, 1, th, w_out, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def _conv3x3x3_pallas(x: jax.Array, w: jax.Array, bias: jax.Array
                      ) -> jax.Array:
    """x: [B, D, H, W, C_in]; w: [3, 3, 3, C_in, C_out]; bias: [C_out]."""
    b, d, h, w_sp, c_in = x.shape
    c_out = w.shape[-1]
    pad_h = (-h) % TILE_H
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + pad_h), (1, 1), (0, 0)))
    hp = h + pad_h
    w2 = w.reshape(27 * c_in, c_out)

    out = pl.pallas_call(
        _conv_kernel,
        out_shape=jax.ShapeDtypeStruct((b, d, hp, w_sp, c_out), x.dtype),
        grid=(b, d, hp // TILE_H),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # xp in HBM
            pl.BlockSpec(memory_space=pl.ANY if interpret_mode()
                         else pltpu.VMEM),                     # weights
            pl.BlockSpec(memory_space=pl.ANY if interpret_mode()
                         else pltpu.VMEM),                     # bias
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE_H, w_sp, c_out),
            lambda bi, di, hi: (bi, di, hi, 0, 0),
            memory_space=pl.ANY if interpret_mode() else pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, TILE_H + 2, w_sp + 2, c_in), x.dtype),
            pltpu.VMEM((TILE_H * w_sp, 27 * c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret_mode(),
    )(xp, w2.astype(x.dtype), bias.reshape(1, c_out))
    if pad_h:
        out = out[:, :, :h]
    return out


def _conv3x3x3_xla(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """The XLA reference (identical semantics) — backward + fallback."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + bias.astype(y.dtype)


@jax.custom_vjp
def conv3x3x3(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """Trainable fused conv: Pallas im2col forward, XLA backward."""
    return _conv3x3x3_pallas(x, w, bias)


def _conv_fwd(x, w, bias):
    return _conv3x3x3_pallas(x, w, bias), (x, w, bias)


def _conv_bwd(residuals, ct):
    x, w, bias = residuals
    _, vjp = jax.vjp(_conv3x3x3_xla, x, w, bias)
    return vjp(ct)


conv3x3x3.defvjp(_conv_fwd, _conv_bwd)
