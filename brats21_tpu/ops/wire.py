"""Sparse host↔device wire formats for transfer-bound links.

A BraTS bbox-cropped volume is ~50% background zeros (the brain mask), and
BraTS label maps use only the 4 symbols {0, 1, 2, 4}. When the host link is
the bottleneck (PCIe-starved hosts, remote relays, networked storage), the
wire bytes halve twice:

* **in**: :func:`pack_volume` sends one packbits brain mask (1 bit/voxel,
  shared across modalities) + the nonzero voxel rows as packed int16;
  :func:`unpack_volume_device` reconstructs the volume EXACTLY on device
  with a cumsum-gather (no scatter).
* **out**: :func:`pack_labels_device` packs BraTS labels 2 bits/voxel on
  device; :func:`unpack_labels` restores uint8 labels on host with numpy.

Both directions are bit-exact (asserted in tests and at bench warmup).
The reference has no analog — it moves fp32 tensors with `.cuda()`/`.cpu()`
per TTA member (engine.py:234-239).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

#: values-buffer capacity granularity — one compiled executable per step
CAP_STEP = 1 << 18


def pack_volume(vol: np.ndarray,
                cap_step: int = CAP_STEP) -> Tuple[np.ndarray, np.ndarray]:
    """[X, Y, Z, C] int array → (packbits mask [ceil(V/8)] uint8,
    values [cap, C] of the input dtype). The mask is the any-channel
    nonzero brain mask; ``cap`` is the nonzero count rounded up to
    ``cap_step`` (bounded by V) so repeated cases reuse one executable."""
    c = vol.shape[-1]
    flat = vol.reshape(-1, c)
    mask = (flat != 0).any(axis=1)
    vals = flat[mask]
    n_vox = flat.shape[0]
    cap = min(-(-max(vals.shape[0], 1) // cap_step) * cap_step, n_vox)
    assert vals.shape[0] <= cap
    vals = np.pad(vals, ((0, cap - vals.shape[0]), (0, 0)))
    return np.packbits(mask), np.ascontiguousarray(vals)


def unpack_volume_device(bits: Array, vals: Array,
                         spatial: Tuple[int, int, int]) -> Array:
    """Device-side exact reconstruction: [1, X, Y, Z, C] of vals.dtype."""
    n_vox = spatial[0] * spatial[1] * spatial[2]
    mask = ((bits[:, None] >> (7 - jnp.arange(8, dtype=jnp.uint8)))
            & 1).reshape(-1)[:n_vox]
    idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    vol = jnp.where(mask[:, None].astype(bool),
                    vals[jnp.clip(idx, 0, vals.shape[0] - 1)],
                    jnp.zeros((), vals.dtype))
    return vol.reshape(1, *spatial, vals.shape[-1])


def pack_bits_device(binary: Array) -> Array:
    """Any-shape binary array (exact {0, 1} values, any dtype) → flat uint8
    with 8 voxels per byte (big-endian bit order, matching np.packbits).
    Device-side D2H compression for the engine's fused eval output
    ([1, X, Y, Z, 3] binarized multichannel): 32× fewer wire bytes than
    fp32, bit-exact under :func:`unpack_bits`."""
    flat = binary.reshape(-1).astype(jnp.uint8)
    pad = (-flat.shape[0]) % 8
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint8)])
    b = flat.reshape(-1, 8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    return jnp.sum(b << shifts, axis=1).astype(jnp.uint8)


def unpack_bits(packed: np.ndarray, shape: Tuple[int, ...],
                dtype=np.float32) -> np.ndarray:
    """Host inverse of :func:`pack_bits_device` → array of ``shape``."""
    n = int(np.prod(shape))
    flat = np.unpackbits(np.asarray(packed))[:n]
    return flat.reshape(shape).astype(dtype)


def pack_labels_device(labels: Array) -> Array:
    """BraTS label map (values in {0,1,2,4}, any shape with 4 | #voxels)
    → uint8 array of packed 2-bit symbols, 4 voxels per byte."""
    l2 = jnp.where(labels == 4, jnp.uint8(3),
                   labels.astype(jnp.uint8)).reshape(-1, 4)
    return (l2[:, 0] | (l2[:, 1] << 2) | (l2[:, 2] << 4) | (l2[:, 3] << 6))


def unpack_labels(packed: np.ndarray,
                  spatial: Tuple[int, int, int]) -> np.ndarray:
    """Host inverse of :func:`pack_labels_device` → [X, Y, Z] uint8."""
    p = np.asarray(packed)
    l2 = np.stack([(p >> s) & 3 for s in (0, 2, 4, 6)],
                  axis=1).reshape(spatial).astype(np.uint8)
    l2[l2 == 3] = 4
    return l2
