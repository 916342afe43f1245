"""Sliding-window inference, entirely on-device.

Re-design of reference utils/inferers.py:26-162 (MONAI fork): the reference
gathers every window to the GPU, predicts, and accumulates the
Gaussian-weighted logits *on the CPU* (engine.py:306-307) — one D2H transfer
per window. Here the full volume, the weighted accumulator and the count map
stay in HBM; a ``lax.scan`` walks the static window grid with
``dynamic_slice`` / ``dynamic_update_slice`` accumulation, and windows can be
batched (``sw_batch_size``) into one MXU-friendly predictor call.

Semantics preserved: overlap 0.25 scan intervals (:111,165-186), Gaussian
importance map with σ = 0.125·roi (:119-121), pad-to-roi then crop
(:104-109, 156-162), deep-supervision head[0] selection (:135-138).
"""

from __future__ import annotations

import math
from typing import Any, Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def get_scan_interval(image_size: Sequence[int], roi_size: Sequence[int],
                      overlap: float = 0.25) -> Tuple[int, ...]:
    """Reference _get_scan_interval (inferers.py:165-186)."""
    out = []
    for i, (im, roi) in enumerate(zip(image_size, roi_size)):
        if roi == im:
            out.append(int(roi))
        else:
            interval = int(roi * (1 - overlap))
            out.append(interval if interval > 0 else 1)
    return tuple(out)


def dense_patch_starts(image_size: Sequence[int], roi_size: Sequence[int],
                       scan_interval: Sequence[int]) -> np.ndarray:
    """Window start offsets (MONAI dense_patch_slices semantics): per-axis
    starts at i*interval, last start clipped to size-roi. [N, 3] int32."""
    per_axis: List[List[int]] = []
    for im, roi, step in zip(image_size, roi_size, scan_interval):
        scan_num = int(math.ceil((im - roi) / step) + 1) if im > roi else 1
        starts = []
        for i in range(scan_num):
            s = min(i * step, im - roi)
            starts.append(s)
        per_axis.append(sorted(set(starts)))
    grid = np.stack(np.meshgrid(*per_axis, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.int32)


def gaussian_importance_map(roi_size: Sequence[int],
                            sigma_scale: float = 0.125) -> np.ndarray:
    """Separable Gaussian centered on the patch, max-normalized, zero floor
    lifted to the smallest positive value (MONAI compute_importance_map)."""
    axes = []
    for s in roi_size:
        center = (s - 1) / 2.0
        sigma = sigma_scale * s
        i = np.arange(s, dtype=np.float64)
        axes.append(np.exp(-0.5 * ((i - center) / sigma) ** 2))
    m = axes[0][:, None, None] * axes[1][None, :, None] * axes[2][None, None, :]
    m = m / m.max()
    m = np.maximum(m, m[m > 0].min())
    return m.astype(np.float32)


def sliding_window_inference(
        inputs: Array,
        roi_size: Sequence[int],
        predictor: Callable[[Array], Any],
        sw_batch_size: int = 1,
        overlap: float = 0.25,
        mode: str = "constant",  # reference default (inferers.py:32); 'gaussian' available
        sigma_scale: float = 0.125,
        cval: float = 0.0,
) -> Array:
    """Stitched full-volume logits of ``predictor`` over [B, X, Y, Z, C].

    ``predictor`` may return logits or (logits, deeps); only head[0] is kept
    (inferers.py:135-138). Runs under jit; all shapes static.
    """
    b, *spatial, c_in = inputs.shape
    roi = [min(r, max(s, r)) for r, s in zip(roi_size, spatial)]

    # pad to at least roi (half before, rest after — inferers.py:104-109)
    pads = [(0, 0)]
    padded_size = []
    for s, r in zip(spatial, roi):
        diff = max(r - s, 0)
        half = diff // 2
        pads.append((half, diff - half))
        padded_size.append(s + diff)
    pads.append((0, 0))
    x = jnp.pad(inputs, pads, constant_values=cval)

    interval = get_scan_interval(padded_size, roi, overlap)
    starts = dense_patch_starts(padded_size, roi, interval)
    n_windows = len(starts)

    if mode == "gaussian":
        imp = jnp.asarray(gaussian_importance_map(roi, sigma_scale))
    else:
        imp = jnp.ones(tuple(roi), jnp.float32)
    imp_b = imp[None, :, :, :, None]

    from .tta import main_head

    def predict_main(window: Array) -> Array:
        return main_head(predictor(window)).astype(jnp.float32)

    # probe output channel count via trace-time structure
    c_out = jax.eval_shape(
        predict_main, jax.ShapeDtypeStruct((b, *roi, c_in), inputs.dtype)).shape[-1]

    out_sum = jnp.zeros((b, *padded_size, c_out), jnp.float32)
    count = jnp.zeros((1, *padded_size, 1), jnp.float32)

    starts_dev = jnp.asarray(starts)
    nb = -(-n_windows // sw_batch_size)
    # group windows into sw_batch_size chunks (repeat last window to fill —
    # its duplicate accumulation is normalized out by the count map only if
    # weights match, so instead mask duplicates to zero weight)
    pad_n = nb * sw_batch_size - n_windows
    starts_grouped = jnp.concatenate(
        [starts_dev, jnp.repeat(starts_dev[-1:], pad_n, axis=0)], axis=0
    ).reshape(nb, sw_batch_size, 3)
    valid = jnp.concatenate(
        [jnp.ones(n_windows, jnp.float32), jnp.zeros(pad_n, jnp.float32)]
    ).reshape(nb, sw_batch_size)

    def body(carry, sg):
        osum, cnt = carry
        st, vmask = sg

        def one(s):
            win = jax.lax.dynamic_slice(
                x, (0, s[0], s[1], s[2], 0), (b, *roi, c_in))
            return win

        wins = jax.vmap(one)(st)                       # [sw, b, *roi, c_in]
        preds = jax.vmap(predict_main)(wins)           # [sw, b, *roi, c_out]

        def scatter(i, acc):
            osum_i, cnt_i = acc
            s = st[i]
            w = imp_b * vmask[i]
            upd = jax.lax.dynamic_slice(
                osum_i, (0, s[0], s[1], s[2], 0), (b, *roi, preds.shape[-1]))
            osum_i = jax.lax.dynamic_update_slice(
                osum_i, upd + w * preds[i], (0, s[0], s[1], s[2], 0))
            cupd = jax.lax.dynamic_slice(
                cnt_i, (0, s[0], s[1], s[2], 0), (1, *roi, 1))
            cnt_i = jax.lax.dynamic_update_slice(
                cnt_i, cupd + w, (0, s[0], s[1], s[2], 0))
            return osum_i, cnt_i

        osum, cnt = jax.lax.fori_loop(0, sw_batch_size, scatter, (osum, cnt))
        return (osum, cnt), None

    (out_sum, count), _ = jax.lax.scan(body, (out_sum, count),
                                       (starts_grouped, valid))
    stitched = out_sum / count

    # crop the pad-to-roi margins (inferers.py:156-162)
    slices = tuple(slice(p[0], p[0] + s) for p, s in zip(pads[1:4], spatial))
    return stitched[(slice(None),) + slices + (slice(None),)]
