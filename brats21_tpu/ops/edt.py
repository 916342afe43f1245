"""Exact Euclidean distance transform, jittable.

The reference computes distance maps on the host with scipy
``distance_transform_edt`` inside losses (losses.py:11,69-70,93) and data
transforms (utils/transforms.py:117-118) — a CPU sync in the middle of the
step. Here the EDT runs on-device: the classic separable decomposition
(Felzenszwalb & Huttenlocher) where each axis applies the lower envelope
``d[i] = min_j (g[j] + (i-j)^2)``.

The envelope is evaluated as a length-n ``lax.scan`` of vectorized updates
over all lines at once (memory O(volume), no (n_out, n_in) blowup), which XLA
maps cleanly onto the VPU. Exactness is verified against scipy in
tests/test_edt.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_INF = 1e12


def _envelope_1d(g: Array, sampling: float = 1.0) -> Array:
    """min-plus convolution with the squared-distance kernel along the last
    axis: out[..., i] = min_j g[..., j] + (sampling*(i-j))**2."""
    n = g.shape[-1]
    idx = jnp.arange(n, dtype=g.dtype)

    def step(acc, j):
        gj = jax.lax.dynamic_index_in_dim(g, j, axis=-1, keepdims=True)
        cand = gj + ((idx - j.astype(g.dtype)) * sampling) ** 2
        return jnp.minimum(acc, cand), None

    init = jnp.full_like(g, _INF)
    out, _ = jax.lax.scan(step, init, jnp.arange(n))
    return out


@partial(jax.jit, static_argnames=("sampling",))
def edt_sq(mask: Array, sampling: Tuple[float, ...] = None) -> Array:
    """Squared EDT of the *zero set*: distance from each voxel to the nearest
    voxel where ``mask`` is False. Matches scipy
    ``distance_transform_edt(mask)**2`` semantics (distance to background).

    mask: bool array, any rank; sampling: per-axis voxel spacing.

    On TPU each axis pass runs as a Pallas kernel with VMEM-resident lines
    (ops/pallas/edt_kernel.py); on CPU the scanned XLA envelope is used.
    """
    from .pallas import enabled as pallas_enabled
    use_pallas = pallas_enabled()
    ndim = mask.ndim
    sampling = sampling or (1.0,) * ndim
    f = jnp.where(mask, _INF, 0.0).astype(jnp.float32)
    for ax in range(ndim):
        f = jnp.moveaxis(f, ax, -1)
        if use_pallas:
            from .pallas.edt_kernel import envelope_last_axis
            f = envelope_last_axis(f, float(sampling[ax]))
        else:
            f = _envelope_1d(f, float(sampling[ax]))
        f = jnp.moveaxis(f, -1, ax)
    return f


def edt(mask: Array, sampling: Tuple[float, ...] = None) -> Array:
    """Euclidean distance transform (scipy ``distance_transform_edt``)."""
    return jnp.sqrt(edt_sq(mask, sampling))


def one_hot2dist(seg: Array, sampling: Tuple[float, ...] = None) -> Array:
    """Signed boundary-loss distance map per channel (reference
    losses.py:59-74): ``edt(~pos)*~pos - (edt(pos)-1)*pos``; zero map for
    empty channels."""
    pos = seg.astype(bool)
    neg = ~pos
    # scipy edt(m) = distance from each nonzero voxel of m to m's nearest
    # zero voxel; our edt(mask) = distance to the nearest mask==False voxel.
    # The leading axis is the class/channel axis: EDT per channel (losses.py:64).
    per_ch = jax.vmap(lambda m: edt(m, sampling))
    dist_to_pos = per_ch(neg)   # >0 on neg, 0 on pos
    dist_to_neg = per_ch(pos)   # >0 on pos, 0 on neg
    res = dist_to_pos * neg - (dist_to_neg - 1.0) * pos
    any_pos = pos.any(axis=tuple(range(1, seg.ndim)), keepdims=True)
    return jnp.where(any_pos, res, 0.0)


def one_hot2hd_dist(seg: Array, sampling: Tuple[float, ...] = None) -> Array:
    """HD-loss distance map (reference losses.py:77-95): unsigned EDT of the
    positive mask (distance to nearest foreground voxel... scipy semantics:
    eucl_distance(posmask) = distance to nearest background-of-posmask=0
    voxel, i.e. distance to nearest non-pos voxel, evaluated everywhere);
    zero for empty channels."""
    pos = seg.astype(bool)
    d = jax.vmap(lambda m: edt(m, sampling))(pos)
    any_pos = pos.any(axis=tuple(range(1, seg.ndim)), keepdims=True)
    return jnp.where(any_pos, d, 0.0)
