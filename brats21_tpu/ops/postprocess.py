"""BraTS post-processing — jittable where it counts.

Reference chain (definer.py:679-698, engine.py:249-259): threshold@0.5 →
multichannel→BraTS labels → 3→4 → KeepLargestConnectedComponent(threshold) →
ReplaceWithClosestValue(thresh) → back to multichannel; all via
skimage/scipy on the CPU (transforms.py:579-647). Here:

* threshold + label codecs: trivially jittable (channels-last).
* connected components: on-device iterative min-label propagation
  (3³ min-pool until fixpoint) + size accounting via one scatter-add —
  exact same result as skimage ``morphology.label`` + size filter.
* replace-with-closest: per-axial-slice nearest-neighbour reassignment
  (scipy ``griddata`` nearest semantics) via a feature (argmin) EDT.
* host twins of each step back the golden tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

Array = jax.Array

_INF = jnp.float32(3.0e38)


# ---------------------------------------------------------------------------
# threshold + codecs (device)
# ---------------------------------------------------------------------------


def threshold_probs(probs: Array, logit_thresh: float = 0.5) -> Array:
    """AsDiscrete(threshold_values=True) (definer.py:682-683)."""
    return (probs >= logit_thresh).astype(jnp.float32)


def multichannel_to_brats(channels: Array) -> Array:
    """[..., 3] WT/TC/ET binaries → label map {0,1,2,3} with ET→NET→ED
    precedence (transforms.py:169-193)."""
    wt = channels[..., 0] > 0
    tc = channels[..., 1] > 0
    et = channels[..., 2] > 0
    net = tc & ~et
    ed = wt & ~tc
    out = jnp.zeros(channels.shape[:-1], jnp.float32)
    out = jnp.where(ed, 2.0, out)
    out = jnp.where(net, 1.0, out)
    out = jnp.where(et, 3.0, out)
    return out


def change_label_3_to_4(label_map: Array) -> Array:
    return jnp.where(label_map == 3.0, 4.0, label_map)


def brats_to_multichannel(label_map: Array) -> Array:
    """Labels {1,2,4} → [..., 3] WT/TC/ET (transforms.py:145-166)."""
    l1 = label_map == 1
    l2 = label_map == 2
    l4 = label_map == 4
    wt = l1 | l2 | l4
    tc = l1 | l4
    return jnp.stack([wt, tc, l4], axis=-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# connected components (device)
# ---------------------------------------------------------------------------


def _min_pool3(x: Array) -> Array:
    """3³ min-pool, stride 1, SAME — one label-propagation sweep."""
    return -jax.lax.reduce_window(
        -x, -_INF, jax.lax.max,
        window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
        padding="SAME")


@jax.jit
def label_components(mask: Array) -> Array:
    """Connected-component labels of a 3D bool mask (26-connectivity, same
    as skimage ``morphology.label`` default). Background = 0; labels are
    arbitrary distinct positive ints (seed flat index + 1)."""
    n = mask.size
    flat_ids = (jnp.arange(1, n + 1, dtype=jnp.float32)).reshape(mask.shape)
    labels = jnp.where(mask, flat_ids, _INF)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        new = jnp.where(mask, jnp.minimum(labels, _min_pool3(labels)), _INF)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return jnp.where(mask, labels, 0.0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("largest_only",))
def filter_components(volume: Array, threshold: Optional[Array] = None,
                      largest_only: bool = False) -> Array:
    """get_largest_component (transforms.py:579-600): zero out components
    with size ≤ threshold (or all but the largest). ``volume`` is a label
    map; any nonzero voxel belongs to the foreground mask."""
    mask = volume != 0
    labels = label_components(mask)
    flat = labels.ravel()
    sizes = jnp.zeros((volume.size + 1,), jnp.float32).at[flat].add(
        mask.ravel().astype(jnp.float32))
    sizes = sizes.at[0].set(0.0)
    if largest_only:
        best = jnp.argmax(sizes)
        keep = flat == best
    else:
        keep = sizes[flat] > threshold
    return jnp.where(keep.reshape(volume.shape) & mask, volume, 0)


# ---------------------------------------------------------------------------
# replace-with-closest (device): per-axial-slice nearest-neighbour
# ---------------------------------------------------------------------------


def _edt2d_with_argmin(g: Array) -> Tuple[Array, Array]:
    """1D lower envelope along the last axis, tracking the argmin index.
    g: [..., n] initial squared costs. Returns (min cost, argmin j)."""
    n = g.shape[-1]
    idx = jnp.arange(n, dtype=jnp.float32)

    def step(carry, j):
        best, bestj = carry
        gj = jax.lax.dynamic_index_in_dim(g, j, axis=-1, keepdims=True)
        cand = gj + (idx - j.astype(jnp.float32)) ** 2
        take = cand < best
        best = jnp.where(take, cand, best)
        bestj = jnp.where(take, j, bestj)
        return (best, bestj), None

    init = (jnp.full_like(g, _INF), jnp.zeros(g.shape, jnp.int32))
    (best, bestj), _ = jax.lax.scan(step, init, jnp.arange(n))
    return best, bestj


@jax.jit
def nearest_feature_2d(mask_valid: Array, values: Array) -> Array:
    """For each pixel of a 2D grid, the value of the nearest valid pixel
    (euclidean; scipy griddata method='nearest' semantics,
    transforms.py:603-624). mask_valid, values: [H, W]."""
    f0 = jnp.where(mask_valid, 0.0, _INF)
    # pass 1 along axis 1 (W): best source column per (row, w)
    d1, src_w = _edt2d_with_argmin(f0)
    # pass 2 along axis 0 (H): work on transposed [W, H]
    d2t, src_h_t = _edt2d_with_argmin(d1.T)
    d2 = d2t.T          # [H, W] final squared distance
    src_h = src_h_t.T   # best source row h* for each (h, w)
    # the source pixel is (h*, src_w[h*, w])
    w_idx = jnp.broadcast_to(jnp.arange(mask_valid.shape[1])[None, :],
                             mask_valid.shape)
    src_w_final = src_w[src_h, w_idx]
    return values[src_h, src_w_final]


@jax.jit
def replace_small_values_axial(label_map: Array, thresh: float = 20.0) -> Array:
    """ReplaceWithClosestValue (transforms.py:233-268, 627-647): label values
    whose total voxel count ≤ thresh are re-assigned per axial slice (axis 2)
    to the nearest surviving label. label_map: [X, Y, Z] float labels
    {0,1,2,4}."""
    values = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0])
    counts = jnp.stack([(label_map == v).sum() for v in [0.0, 1.0, 2.0, 3.0, 4.0]])
    present = counts > 0
    to_replace = present & (counts <= thresh)

    replace_mask = jnp.zeros(label_map.shape, bool)
    for i in range(5):
        replace_mask = replace_mask | (to_replace[i] & (label_map == values[i]))

    def per_slice(sl_labels, sl_replace):
        valid = ~sl_replace
        nearest = nearest_feature_2d(valid, sl_labels)
        return jnp.where(sl_replace, nearest, sl_labels)

    any_replace = replace_mask.any()
    moved_l = jnp.moveaxis(label_map, 2, 0)
    moved_m = jnp.moveaxis(replace_mask, 2, 0)
    repl = jax.vmap(per_slice)(moved_l, moved_m)
    out = jnp.moveaxis(repl, 0, 2)
    return jnp.where(any_replace, out, label_map)


# ---------------------------------------------------------------------------
# host (scipy) twins — golden references & CPU fallback
# ---------------------------------------------------------------------------


def label_components_host(mask: np.ndarray) -> np.ndarray:
    structure = np.ones((3, 3, 3), bool)  # 26-connectivity like skimage
    labels, _ = ndimage.label(mask, structure=structure)
    return labels


def filter_components_host(volume: np.ndarray,
                           threshold: Optional[int] = None) -> np.ndarray:
    """transforms.py:583-600 host behaviour."""
    out = volume.copy()
    mask = out != 0
    labels = label_components_host(mask)
    if labels.max() == 0:
        return out
    sizes = np.bincount(labels.ravel())
    if threshold is None:
        keep = np.array([np.argmax(sizes[1:]) + 1])
    else:
        keep = np.argwhere(sizes[1:] > threshold).ravel() + 1
    out[~np.isin(labels, keep)] = 0
    return out


def replace_small_values_axial_host(label_map: np.ndarray,
                                    thresh: float = 20.0) -> np.ndarray:
    """transforms.py:233-268 host behaviour (nearest per axial slice)."""
    uniq, counts = np.unique(label_map, return_counts=True)
    values = uniq[counts <= thresh]
    if values.size == 0:
        return label_map
    out = np.zeros_like(label_map)
    replace = np.isin(label_map, values)
    for z in range(label_map.shape[2]):
        sl = label_map[:, :, z]
        m = replace[:, :, z]
        if not m.any():
            out[:, :, z] = sl
            continue
        ind = ndimage.distance_transform_edt(
            m, return_distances=False, return_indices=True)
        out[:, :, z] = sl[tuple(ind)]
    return out


# ---------------------------------------------------------------------------
# full post chain (definer.py:671-698)
# ---------------------------------------------------------------------------


def post_process(probs: Array, logit_thresh: float = 0.5,
                 cleaning_areas: bool = False, cleaning_areas_threshold: int = 20,
                 replace_value: bool = False, replace_value_threshold: int = 300,
                 ) -> Array:
    """probs [B, X, Y, Z, 3] → binarized multichannel [B, X, Y, Z, 3] after
    the configured cleanup (jittable; one volume at a time, B=1)."""
    binary = threshold_probs(probs, logit_thresh)
    if not (cleaning_areas or replace_value):
        return binary
    labels = change_label_3_to_4(multichannel_to_brats(binary[0]))
    if cleaning_areas:
        labels = filter_components(
            labels, jnp.float32(cleaning_areas_threshold)).astype(jnp.float32)
    if replace_value:
        labels = replace_small_values_axial(labels,
                                            jnp.float32(replace_value_threshold))
    return brats_to_multichannel(labels)[None]
