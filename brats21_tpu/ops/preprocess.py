"""On-device preprocessing: the jittable twin of the host z-score stage.

Lets the host ship raw int16 voxels (half the bytes of fp32, matching the
BraTS source dtype) and normalize on the TPU — reference normalization runs
in numpy on the host (utils/transforms.py:328-447). Semantics match
``data.transforms.normalize_intensity``: per-channel, nonzero-only mean/std,
optional ±3σ clip; zeros stay exactly zero (they encode background for
``remove_background_voxels``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


from functools import partial


@partial(jax.jit, static_argnames=("remove_outliers", "outliers_value"))
def normalize_intensity_device(img: Array, remove_outliers: bool = False,
                               outliers_value: float = 3.0) -> Array:
    """img: [..., C] any numeric dtype → fp32 z-scored over nonzero voxels
    per channel."""
    x = img.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mask = x != 0
    count = jnp.maximum(mask.sum(axis=axes), 1)
    mean = jnp.where(mask, x, 0.0).sum(axis=axes) / count
    var = (jnp.where(mask, (x - mean) ** 2, 0.0).sum(axis=axes) / count)
    std = jnp.sqrt(var)
    std = jnp.where(std == 0.0, 1.0, std)
    normed = (x - mean) / std
    if remove_outliers:
        normed = jnp.clip(normed, -outliers_value, outliers_value)
    return jnp.where(mask, normed, 0.0)
