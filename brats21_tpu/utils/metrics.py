"""Segmentation metrics with BraTS edge-case conventions.

Mirrors reference utils/metrics.py:35-134 (`compute_metric_tensor`):
- Dice: empty-pred ∧ empty-GT → 1.0; existence mismatch → 0.0
- HD95: empty∧empty → 0.0; mismatch → image diagonal of (240, 240, 155)
  (the fixed constant at metrics.py:77)
- sensitivity/specificity from the confusion matrix with the same rules.

Dice and the confusion matrix are jittable (on-device, batch-friendly); the
surface-distance metrics run host-side on numpy/scipy per case, matching
MONAI ``HausdorffDistanceMetric(distance_metric='euclidean', percentile=95)``
(metrics.py:149-151).

Layout: channels-last ``[B, D, H, W, C]`` binary arrays.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

Array = jax.Array

#: worst-case HD95 = diagonal of the BraTS volume (reference metrics.py:76-79)
BRATS_DIAGONAL = math.sqrt(240.0 ** 2 + 240.0 ** 2 + 155.0 ** 2)

_SPATIAL = (1, 2, 3)


# ---------------------------------------------------------------------------
# jittable metrics
# ---------------------------------------------------------------------------


@jax.jit
def dice_metric(y_pred: Array, y: Array) -> Array:
    """Per-(batch, channel) Dice of binary masks with the BraTS edge rules.
    Returns [B, C] float32."""
    p = y_pred.astype(jnp.float32)
    g = y.astype(jnp.float32)
    inter = jnp.sum(p * g, axis=_SPATIAL)
    p_sum = jnp.sum(p, axis=_SPATIAL)
    g_sum = jnp.sum(g, axis=_SPATIAL)
    dice = 2.0 * inter / (p_sum + g_sum)
    exists_p = p_sum > 0
    exists_g = g_sum > 0
    both_empty = ~exists_p & ~exists_g
    mismatch = exists_p ^ exists_g
    dice = jnp.where(both_empty, 1.0, dice)
    dice = jnp.where(mismatch, 0.0, dice)
    return dice


@jax.jit
def confusion_matrix(y_pred: Array, y: Array) -> Array:
    """[B, C, 4] = (tp, fp, tn, fn) voxel counts (MONAI ConfusionMatrixMetric
    layout, reference metrics.py:87-112)."""
    p = y_pred.astype(jnp.float32)
    g = y.astype(jnp.float32)
    tp = jnp.sum(p * g, axis=_SPATIAL)
    fp = jnp.sum(p * (1 - g), axis=_SPATIAL)
    fn = jnp.sum((1 - p) * g, axis=_SPATIAL)
    tn = jnp.sum((1 - p) * (1 - g), axis=_SPATIAL)
    return jnp.stack([tp, fp, tn, fn], axis=-1)


def sensitivity_specificity(y_pred: Array, y: Array) -> Tuple[Array, Array]:
    """Per-(batch, channel) sensitivity / specificity with edge rules
    (both-empty → 1, mismatch → 0)."""
    cm = confusion_matrix(y_pred, y)
    tp, fp, tn, fn = cm[..., 0], cm[..., 1], cm[..., 2], cm[..., 3]
    sens = tp / jnp.maximum(tp + fn, 1e-12)
    spec = tn / jnp.maximum(tn + fp, 1e-12)
    exists_p = (tp + fp) > 0
    exists_g = (tp + fn) > 0
    both_empty = ~exists_p & ~exists_g
    mismatch = exists_p ^ exists_g
    sens = jnp.where(both_empty, 1.0, jnp.where(mismatch, 0.0, sens))
    spec = jnp.where(both_empty, 1.0, jnp.where(mismatch, 0.0, spec))
    return sens, spec


# ---------------------------------------------------------------------------
# host-side surface-distance metrics (scipy), per case
# ---------------------------------------------------------------------------


def _mask_edges(mask: np.ndarray) -> np.ndarray:
    """Surface voxels: mask XOR erosion(mask) (MONAI get_mask_edges)."""
    if not mask.any():
        return np.zeros_like(mask, dtype=bool)
    eroded = ndimage.binary_erosion(mask)
    return mask ^ eroded


def _directed_distances(src_edges: np.ndarray, dst_edges: np.ndarray) -> np.ndarray:
    """Distances from each surface voxel of src to the nearest surface voxel
    of dst (MONAI get_surface_distance, euclidean)."""
    if not dst_edges.any():
        return np.full(int(src_edges.sum()), np.inf)
    dist = ndimage.distance_transform_edt(~dst_edges)
    return dist[src_edges]


def hausdorff_distance_95(y_pred: np.ndarray, y: np.ndarray,
                          percentile: float = 95.0) -> float:
    """HD-percentile of two binary volumes, MONAI semantics: max of the two
    directed percentile distances. NaN if either mask is empty (edge rules
    applied by the caller via `apply_brats_edge_rules`)."""
    pred = np.asarray(y_pred, bool)
    gt = np.asarray(y, bool)
    if not pred.any() or not gt.any():
        return float("nan")
    pe, ge = _mask_edges(pred), _mask_edges(gt)
    d_pg = _directed_distances(pe, ge)
    d_gp = _directed_distances(ge, pe)
    if d_pg.size == 0 or d_gp.size == 0:
        return float("nan")
    return float(max(np.percentile(d_pg, percentile),
                     np.percentile(d_gp, percentile)))


def average_surface_distance(y_pred: np.ndarray, y: np.ndarray,
                             symmetric: bool = False) -> float:
    """MONAI SurfaceDistanceMetric (avg. surface distance, pred→gt;
    symmetric option averages both directions)."""
    pred = np.asarray(y_pred, bool)
    gt = np.asarray(y, bool)
    if not pred.any() or not gt.any():
        return float("nan")
    d_pg = _directed_distances(_mask_edges(pred), _mask_edges(gt))
    if not symmetric:
        return float(d_pg.mean()) if d_pg.size else float("nan")
    d_gp = _directed_distances(_mask_edges(gt), _mask_edges(pred))
    alld = np.concatenate([d_pg, d_gp])
    return float(alld.mean()) if alld.size else float("nan")


# ---------------------------------------------------------------------------
# the BraTS evaluation entry point (reference compute_metric_tensor)
# ---------------------------------------------------------------------------


def compute_case_metrics(y_pred: np.ndarray, y: np.ndarray,
                         metrics: Sequence[str] = ("dice", "hausdorff_distance95"),
                         y_probs: Optional[np.ndarray] = None,
                         ) -> Dict[str, np.ndarray]:
    """Per-channel metrics for ONE case (batch size 1, reference
    metrics.py:40) with the BraTS edge-case conventions (:47-80).

    y_pred, y: [1, D, H, W, C] binary arrays. Returns {metric: [1, C]}.
    """
    assert y_pred.shape[0] == 1, "MUST BE batch size = 1 (metrics.py:40)"
    p = np.asarray(y_pred).astype(bool)
    g = np.asarray(y).astype(bool)
    c = p.shape[-1]
    exists_p = p.any(axis=(1, 2, 3))[0]
    exists_g = g.any(axis=(1, 2, 3))[0]
    both_empty = ~exists_p & ~exists_g
    mismatch = exists_p ^ exists_g

    out: Dict[str, np.ndarray] = {}
    for metric in metrics:
        name = metric.lower()
        if name == "dice":
            vals = np.asarray(dice_metric(jnp.asarray(p), jnp.asarray(g)))
            out["Dice"] = vals
        elif name == "hausdorff_distance95":
            vals = np.empty((1, c), np.float32)
            for ci in range(c):
                if both_empty[ci]:
                    vals[0, ci] = 0.0
                elif mismatch[ci]:
                    vals[0, ci] = BRATS_DIAGONAL
                else:
                    vals[0, ci] = hausdorff_distance_95(p[0, ..., ci], g[0, ..., ci])
            out["Hausdorff_Distance95"] = vals
        elif name == "sensitivity":
            sens, _ = sensitivity_specificity(jnp.asarray(p), jnp.asarray(g))
            out["Sensitivity"] = np.asarray(sens)
        elif name == "specificity":
            _, spec = sensitivity_specificity(jnp.asarray(p), jnp.asarray(g))
            out["Specificity"] = np.asarray(spec)
        elif name == "surface_distance":
            raise NotImplementedError(
                "Not tested and not implemented for the moment")  # metrics.py:83
        elif name == "roc_auc":
            assert y_probs is not None, "y_probs is required for computing roc auc"
            vals = np.empty((1, c), np.float32)
            for ci in range(c):
                if both_empty[ci]:
                    vals[0, ci] = 1.0
                elif mismatch[ci]:
                    vals[0, ci] = 0.0
                else:
                    vals[0, ci] = roc_auc(np.asarray(y_probs)[0, ..., ci].ravel(),
                                          g[0, ..., ci].ravel())
            out["Roc_Auc"] = vals
        else:
            raise NotImplementedError(f"the metric {metric} is not implemented.")
    return out


def _rankdata_average(a: np.ndarray) -> np.ndarray:
    """1-based ranks with ties assigned the AVERAGE rank of their group —
    scipy.stats.rankdata(method='average') semantics, dependency-free."""
    sorter = np.argsort(a, kind="mergesort")
    inv = np.empty(a.size, np.intp)
    inv[sorter] = np.arange(a.size)
    sa = a[sorter]
    group_start = np.r_[True, sa[1:] != sa[:-1]]      # first of each tie group
    dense = group_start.cumsum()[inv]                 # 1-based group id
    # boundary[k] = index where group k+1 starts; boundary[-1] = n
    boundary = np.r_[np.nonzero(group_start)[0], a.size]
    # average of 1-based positions boundary[g-1]+1 .. boundary[g]
    return 0.5 * (boundary[dense] + boundary[dense - 1] + 1)


def roc_auc(probs: np.ndarray, labels: np.ndarray) -> float:
    """Binary ROC-AUC via the Mann-Whitney rank statistic (no sklearn
    dependency needed). Ties get AVERAGE ranks, matching sklearn/MONAI's
    trapezoidal AUC used by the reference (``compute_roc_auc``,
    metrics.py:158) on quantized/saturated probabilities."""
    pos_mask = labels.astype(bool)
    pos = probs[pos_mask]
    neg = probs[~pos_mask]
    if pos.size == 0 or neg.size == 0:
        return float("nan")
    ranks = _rankdata_average(np.concatenate([pos, neg]))
    auc = (ranks[: pos.size].sum() - pos.size * (pos.size + 1) / 2) / (pos.size * neg.size)
    return float(auc)
