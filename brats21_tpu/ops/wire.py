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

For INTEGER volumes (raw BraTS int16 voxels, normalized on device by
ops/preprocess.py) the values stream can narrow further: MRI intensities
rarely use 16 bits, so :func:`pack_values_narrow` re-encodes the nonzero
rows as a ``b``-bit big-endian bitstream (``b = vmax.bit_length()``,
lossless by construction) and :func:`unpack_values_narrow_device` decodes
it on device with a 3-byte gather + shift — no unpacked bit tensor is ever
materialized. At the BraTS-typical b=10-12 this is another 25-40% off the
H2D bytes on transfer-bound links.
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


def pack_values_narrow(vals: np.ndarray, bits_per_value: int) -> np.ndarray:
    """[N, C] non-negative ints (each ``< 2**b``) → flat uint8 bitstream,
    values laid out row-major as consecutive ``b``-bit big-endian fields,
    zero-padded to a whole byte. Lossless inverse:
    :func:`unpack_values_narrow_device` (device) /
    :func:`unpack_values_narrow` (host twin)."""
    b = int(bits_per_value)
    assert 1 <= b <= 16, b
    v = np.ascontiguousarray(vals).astype(np.int64).reshape(-1)
    assert v.size == 0 or (v.min() >= 0 and int(v.max()) < (1 << b)), \
        f"values out of range for {b}-bit pack"
    # per-value big-endian bit expansion -> packbits (both are C loops)
    bits = ((v[:, None] >> np.arange(b - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1))


def unpack_values_narrow(packed: np.ndarray, n_rows: int, channels: int,
                         bits_per_value: int) -> np.ndarray:
    """Host inverse of :func:`pack_values_narrow` → [n_rows, channels] int32."""
    b = int(bits_per_value)
    n = n_rows * channels
    bits = np.unpackbits(np.asarray(packed))[:n * b].reshape(n, b)
    weights = (1 << np.arange(b - 1, -1, -1)).astype(np.int64)
    return (bits.astype(np.int64) @ weights).reshape(
        n_rows, channels).astype(np.int32)


def unpack_values_narrow_device(packed: Array, n_rows: int, channels: int,
                                bits_per_value: int,
                                dtype=jnp.int16) -> Array:
    """Device inverse of :func:`pack_values_narrow` → [n_rows, channels].

    Each ``b``-bit field (b ≤ 16) spans at most 3 bytes; the decode is a
    3-byte gather + one shift/mask per value — O(N) int ops on the VPU,
    no [N*C, b] bit tensor in HBM."""
    b = int(bits_per_value)
    n = n_rows * channels
    u = packed.astype(jnp.int32)
    u = jnp.concatenate([u, jnp.zeros((2,), jnp.int32)])   # 3-byte window pad
    start = jnp.arange(n, dtype=jnp.int32) * b
    j = start >> 3
    r = start & 7
    window = (u[j] << 16) | (u[j + 1] << 8) | u[j + 2]
    v = (window >> (24 - r - b)) & ((1 << b) - 1)
    return v.reshape(n_rows, channels).astype(dtype)


def pack_volume_narrow(vol: np.ndarray, bits_per_value: int,
                       cap_step: int = CAP_STEP,
                       ) -> Tuple[np.ndarray, np.ndarray, int]:
    """:func:`pack_volume` with the values re-encoded as a ``b``-bit
    bitstream → (packbits mask, uint8 bitstream, cap). ``cap`` (the padded
    row count) is static metadata for the device decode — the 1-D stream's
    byte length alone cannot disambiguate it."""
    bits, vals = pack_volume(vol, cap_step=cap_step)
    packed = pack_values_narrow(vals, bits_per_value)
    return bits, packed, vals.shape[0]


def unpack_volume_narrow_device(bits: Array, packed_vals: Array,
                                spatial: Tuple[int, int, int], channels: int,
                                cap: int, bits_per_value: int,
                                dtype=jnp.int16) -> Array:
    """Device inverse of :func:`pack_volume_narrow` → [1, X, Y, Z, C]."""
    vals = unpack_values_narrow_device(packed_vals, cap, channels,
                                       bits_per_value, dtype)
    return unpack_volume_device(bits, vals, spatial)


def narrow_bits_for(vals: np.ndarray) -> int:
    """The smallest lossless bitstream width for ``vals``: 0 when narrow
    packing does not apply (negatives, non-integer dtype, or ≥16 bits
    needed), else ``max(vmax.bit_length(), 1)``."""
    if vals.size == 0:
        return 1
    if not np.issubdtype(vals.dtype, np.integer):
        return 0
    vmin, vmax = int(vals.min()), int(vals.max())
    if vmin < 0:
        return 0
    b = max(int(vmax).bit_length(), 1)
    return b if b < 16 else 0


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
