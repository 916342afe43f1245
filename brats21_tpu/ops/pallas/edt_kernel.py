"""Pallas kernel for the EDT min-plus envelope.

The XLA path in ops/edt.py evaluates ``out[i] = min_j g[j] + (s·(i-j))²``
with a length-n ``lax.scan`` whose carry is the whole volume — every one of
the n steps round-trips the volume through HBM (O(n·V) traffic). This kernel
tiles the volume into [TILE_L, n] line blocks resident in VMEM and runs the
n-step relaxation entirely on the VPU: HBM traffic drops to one read + one
write of the volume.

Used by ops/edt.py for every axis pass (lines are brought to the last axis
by transposition, which XLA handles as a layout change).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode

_INF = 1e12
TILE_L = 512


def _envelope_kernel(g_ref, out_ref, *, sampling: float):
    g = g_ref[:]                                   # [TILE_L, n]
    n = g.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, n), 1)

    def body(j, acc):
        gj = jax.lax.dynamic_slice(g, (0, j), (g.shape[0], 1))
        d = (idx - j.astype(jnp.float32)) * sampling
        return jnp.minimum(acc, gj + d * d)

    out_ref[:] = jax.lax.fori_loop(0, n, body, jnp.full_like(g, _INF))


@functools.partial(jax.jit, static_argnames=("sampling",))
def envelope_last_axis(g: jax.Array, sampling: float = 1.0) -> jax.Array:
    """min-plus envelope along the last axis of an arbitrary-rank fp32
    array (the per-axis EDT pass)."""
    shape = g.shape
    n = shape[-1]
    flat = g.reshape(-1, n).astype(jnp.float32)
    l = flat.shape[0]
    pad = (-l) % TILE_L
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)), constant_values=_INF)

    out = pl.pallas_call(
        functools.partial(_envelope_kernel, sampling=float(sampling)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        grid=(flat.shape[0] // TILE_L,),
        in_specs=[pl.BlockSpec((TILE_L, n), lambda i: (i, 0),
                               memory_space=pl.ANY
                               if interpret_mode() else pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_L, n), lambda i: (i, 0),
                               memory_space=pl.ANY
                               if interpret_mode() else pltpu.VMEM),
        interpret=interpret_mode(),
    )(flat)
    if pad:
        out = out[:l]
    return out.reshape(shape)
