"""Pallas 3×3×3 convolution — lane-merged im2col GEMM for lane-starved widths.

Why: XLA lowers a 3³ conv as accumulating taps, so the MXU contracts
K=C_in per pass; at the flagship's width 48 that fills 48/128 of the MXU's
K *and* N dims → ~10-14% utilization measured (docs/BENCHMARKS.md). This
kernel builds an im2col block ``[TILE_H·W, 27·C_in]`` in VMEM and issues
ONE ``jnp.dot`` per tile, so K=27·C_in saturates the contraction dim; the
ceiling becomes the N=C_out lane fill (48/128 ≈ 37%), without
materializing im2col in HBM (which would be bandwidth suicide: 27× the
activation bytes).

Mosaic alignment (learned on hardware, round 2): HBM→VMEM DMA slices may
only have tile-aligned extents on the two minor (tiled) dims — W must be a
multiple of 8 and the LANE extent a multiple of 128, so a channels-last
``[..., W, 48]`` array cannot be DMA'd at all (XLA pads C 48→128
physically, and the 48-lane slice of that is rejected). The kernel
therefore moves data in a LANE-MERGED layout ``[B, D, H, W·C]`` (compact,
no physical lane padding, W·C padded to a 128-multiple) and un-merges to
``[W, C]`` inside VMEM, where Mosaic relayouts are legal; their cost is
what the hardware benchmark arbitrates.

Layout contract of :func:`conv3x3x3`: channels-last ``[B, D, H, W, C]``,
stride 1, SAME, fp32 accumulation, output dtype = input dtype. The
merge/unmerge reshapes happen at the XLA boundary inside this wrapper.

:func:`conv3x3x3` is the trainable entry point: Pallas forward,
``custom_vjp`` backward via the XLA conv transpose formulas (recompute —
no extra residuals).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode

TILE_H = 8  # output rows per program


def _lane_multiple(c: int) -> int:
    """Smallest W granule so that W·c is a multiple of the 128-lane tile."""
    return max(8, math.lcm(128, c) // c)


def _conv_kernel(xp_ref, w_ref, b_ref, out_ref, xtile, sem,
                 *, c_in: int, w_in: int, w_out: int):
    # grid: (B, D, H // TILE_H); xp_ref is lane-merged [B, D+2, Ht, w_in*c_in]
    b = pl.program_id(0)
    d = pl.program_id(1)
    ht = pl.program_id(2)
    th = TILE_H

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(d, 3), pl.ds(ht * th, 2 * th)],
        xtile, sem)
    dma.start()
    dma.wait()

    # im2col as a value-level concat: [TILE_H * w_out, 27 * c_in],
    # tap-major in the lane dim. The un-merge reshape and the three
    # sub-sublane-aligned k-shifts are VMEM relayouts Mosaic schedules.
    cols = []
    for i in range(3):
        xi = xtile[i].reshape(2 * th, w_in, c_in)
        for j in range(3):
            rows = xi[j:j + th]                       # [th, w_in, c_in]
            for k in range(3):
                cols.append(rows[:, k:k + w_out, :].reshape(
                    th * w_out, c_in))
    im2col = jnp.concatenate(cols, axis=1)
    acc = jnp.dot(im2col, w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    c_out = w_ref.shape[-1]
    out_ref[...] = acc.astype(out_ref.dtype).reshape(
        1, 1, th, w_out * c_out)


@jax.jit
def _conv3x3x3_pallas(x: jax.Array, w: jax.Array, bias: jax.Array
                      ) -> jax.Array:
    """x: [B, D, H, W, C_in]; w: [3, 3, 3, C_in, C_out]; bias: [C_out]."""
    b, d, h, w_sp, c_in = x.shape
    c_out = w.shape[-1]
    # output W granule: lanes of the merged out block must tile by 128
    w_out_p = -(-w_sp // _lane_multiple(c_out)) * _lane_multiple(c_out)
    # input W granule likewise, with room for the left/right halo
    w_in_p = -(-(w_out_p + 2) // _lane_multiple(c_in)) * _lane_multiple(c_in)
    n_tiles = -(-h // TILE_H)
    hp = TILE_H * n_tiles
    # halos: D ±1; H top 1 + enough bottom so every tile DMAs 2*TILE_H rows
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, hp + TILE_H - h - 1),
                     (1, w_in_p - w_sp - 1), (0, 0)))
    xp = xp.reshape(b, d + 2, hp + TILE_H, w_in_p * c_in)
    w2 = w.reshape(27 * c_in, c_out)

    kernel = functools.partial(_conv_kernel, c_in=c_in, w_in=w_in_p,
                               w_out=w_out_p)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d, hp, w_out_p * c_out), x.dtype),
        grid=(b, d, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # xp in HBM
            pl.BlockSpec(memory_space=pl.ANY if interpret_mode()
                         else pltpu.VMEM),                     # weights
            pl.BlockSpec(memory_space=pl.ANY if interpret_mode()
                         else pltpu.VMEM),                     # bias
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE_H, w_out_p * c_out),
            lambda bi, di, hi: (bi, di, hi, 0),
            memory_space=pl.ANY if interpret_mode() else pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, 2 * TILE_H, w_in_p * c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret_mode(),
    )(xp, w2.astype(x.dtype), bias.reshape(1, c_out))
    out = out.reshape(b, d, hp, w_out_p, c_out)
    if hp != h or w_out_p != w_sp:
        out = out[:, :, :h, :w_sp]
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
