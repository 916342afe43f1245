"""Multi-chip execution: TTA-parallel and window-parallel inference, and a
halo-exchange spatially-sharded conv primitive.

The reference has no distributed layer at all (SURVEY.md §2.10 — the 16-way
TTA loop and sliding-window loop are serial Python, engine.py:224-249,
inferers.py:126-151). On a TPU slice these are embarrassingly parallel:

* :func:`sharded_tta_probs` — each device runs its own (flip, rot) TTA
  variant (lax.switch on the device index), probabilities are ``psum``-fused
  over ICI. 16 combos on 8 devices = 2 forwards per chip.
* :func:`sharded_sliding_window` — the static window grid is striped across
  devices; each chip accumulates its windows into a local canvas, and one
  ``psum`` merges the Gaussian-weighted sums and count maps.
* :func:`halo_exchange` / :func:`sharded_conv3d` — the convnet analog of
  context parallelism: volumes sharded on a spatial axis with
  ``ppermute`` edge exchange, for models too large to replicate.

All are exact (bitwise-equivalent modulo float addition order) and
verified against their single-device counterparts on a forced 8-device CPU
mesh (tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import tta as tta_ops
from ..ops.tta import main_head
from ..ops.sliding_window import (dense_patch_starts, gaussian_importance_map,
                                  get_scan_interval)

Array = jax.Array


# ---------------------------------------------------------------------------
# TTA parallelism
# ---------------------------------------------------------------------------


def sharded_tta_probs(mesh: Mesh, apply_fn: Callable[[Array], Any], x: Array,
                      axis: str = "data", num_classes: int = 3,
                      criterion: Callable = None, target: Any = None):
    """Mean sigmoid-probability (and, when criterion+target are given, the
    mean deep-supervision loss) over the 16 TTA combos, with the per-
    orientation 8 (flip×rot) variants distributed round-robin over the mesh
    axis. Requires x.shape[1] == x.shape[2]. x is replicated.

    Returns probs, or (probs, loss) with a criterion — loss parity with the
    single-device tta_mean_probs (mean over all 16 members)."""
    n_dev = mesh.shape[axis]
    fr = [(f, r) for f in tta_ops.FLIPS for r in tta_ops.ANGLES]
    with_loss = criterion is not None and target is not None

    def per_device(xl: Array):
        idx = jax.lax.axis_index(axis)
        probs = jnp.zeros(xl.shape[:-1] + (num_classes,), jnp.float32)
        loss = jnp.zeros([], jnp.float32)
        for axe in tta_ops.AXES:
            branches = []
            for f, r in fr:
                def branch(v, a=axe, f=f, r=r):
                    xa = tta_ops.aug_flip_rot(tta_ops.aug_axes(v, a), f, r)
                    out = apply_fn(xa)
                    deaug = lambda l: tta_ops.deaug_axes(
                        tta_ops.deaug_flip_rot(l, f, r), a)
                    out = jax.tree_util.tree_map(deaug, out)
                    p = jax.nn.sigmoid(
                        main_head(out).astype(jnp.float32))
                    if with_loss:
                        from ..learning.losses import deep_supervision_loss
                        l = deep_supervision_loss(criterion, out, target)
                    else:
                        l = jnp.zeros([], jnp.float32)
                    return p, l
                branches.append(branch)
            # stripe the 8 combos over devices; each device loops its share
            for k in range(0, len(fr), n_dev):
                combo = k + idx
                in_range = combo < len(fr)
                safe = jnp.minimum(combo, len(fr) - 1)
                p, l = jax.lax.switch(safe, branches, xl)
                w = jnp.where(in_range, 1.0, 0.0)
                probs = probs + w * p
                loss = loss + w * l
        n = len(tta_ops.AXES) * len(fr)
        probs = jax.lax.psum(probs, axis) / n
        loss = jax.lax.psum(loss, axis) / n
        return probs, loss

    spec = P(*(None,) * x.ndim)
    fn = jax.shard_map(per_device, mesh=mesh, in_specs=spec,
                       out_specs=(spec, P()), check_vma=False)
    probs, loss = fn(x)
    if with_loss:
        return probs, loss
    return probs


# ---------------------------------------------------------------------------
# Window parallelism
# ---------------------------------------------------------------------------


def sharded_sliding_window(mesh: Mesh, predictor: Callable[[Array], Any],
                           inputs: Array, roi_size: Sequence[int],
                           overlap: float = 0.25, mode: str = "constant",
                           axis: str = "data") -> Array:
    """Sliding-window stitching with the window grid striped across the mesh
    axis; input replicated, output replicated. Matches
    ops.sliding_window.sliding_window_inference semantics."""
    b, *spatial, c_in = inputs.shape
    roi = list(roi_size)  # pad-up semantics, same as the single-device path
    pads = [(0, 0)]
    padded_size = []
    for s, r in zip(spatial, roi):
        diff = max(r - s, 0)
        half = diff // 2
        pads.append((half, diff - half))
        padded_size.append(s + diff)
    pads.append((0, 0))
    x = jnp.pad(inputs, pads)

    interval = get_scan_interval(padded_size, roi, overlap)
    starts = dense_patch_starts(padded_size, roi, interval)
    n_dev = mesh.shape[axis]
    n_windows = len(starts)
    per_dev = -(-n_windows // n_dev)
    pad_n = per_dev * n_dev - n_windows
    starts_padded = np.concatenate(
        [starts, np.repeat(starts[-1:], pad_n, axis=0)], axis=0)
    valid = np.concatenate([np.ones(n_windows, np.float32),
                            np.zeros(pad_n, np.float32)])
    # stripe: device d gets windows d::n_dev
    order = np.arange(per_dev * n_dev).reshape(per_dev, n_dev).T  # [dev, k]
    starts_dev = starts_padded[order]                             # [dev, k, 3]
    valid_dev = valid[order]                                      # [dev, k]

    imp = (gaussian_importance_map(roi) if mode == "gaussian"
           else np.ones(tuple(roi), np.float32))
    imp_b = jnp.asarray(imp)[None, :, :, :, None]

    c_out = jax.eval_shape(
        lambda v: main_head(predictor(v)),
        jax.ShapeDtypeStruct((b, *roi, c_in), inputs.dtype)).shape[-1]

    def per_device(xl, my_starts, my_valid):
        # in_specs P(axis) leaves a leading local axis of size 1
        my_starts = my_starts[0]
        my_valid = my_valid[0]
        osum = jnp.zeros((b, *padded_size, c_out), jnp.float32)
        cnt = jnp.zeros((1, *padded_size, 1), jnp.float32)

        def body(carry, sv):
            osum, cnt = carry
            s, v = sv
            win = jax.lax.dynamic_slice(xl, (0, s[0], s[1], s[2], 0),
                                        (b, *roi, c_in))
            pred = main_head(predictor(win)).astype(jnp.float32)
            w = imp_b * v
            upd = jax.lax.dynamic_slice(osum, (0, s[0], s[1], s[2], 0),
                                        (b, *roi, c_out))
            osum = jax.lax.dynamic_update_slice(
                osum, upd + w * pred, (0, s[0], s[1], s[2], 0))
            cupd = jax.lax.dynamic_slice(cnt, (0, s[0], s[1], s[2], 0),
                                         (1, *roi, 1))
            cnt = jax.lax.dynamic_update_slice(cnt, cupd + w,
                                               (0, s[0], s[1], s[2], 0))
            return (osum, cnt), None

        (osum, cnt), _ = jax.lax.scan(body, (osum, cnt),
                                      (my_starts, my_valid))
        osum = jax.lax.psum(osum, axis)
        cnt = jax.lax.psum(cnt, axis)
        return osum / cnt

    repl = P(*(None,) * x.ndim)
    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(repl, P(axis), P(axis)), out_specs=repl,
        check_vma=False)
    stitched = fn(x, jnp.asarray(starts_dev), jnp.asarray(valid_dev))
    slices = tuple(slice(p[0], p[0] + s) for p, s in zip(pads[1:4], spatial))
    return stitched[(slice(None),) + slices + (slice(None),)]


# ---------------------------------------------------------------------------
# Full-model spatially-sharded inference (GSPMD)
# ---------------------------------------------------------------------------


def spatial_sharded_forward(mesh: Mesh, apply_fn: Callable[[Any, Array], Any],
                            variables: Any, x: Array,
                            axis: str = "space",
                            full_outputs: bool = False) -> Any:
    """Run a full model forward with the volume sharded along Z (spatial
    axis 3) across the mesh's ``axis`` — the convnet analog of context
    parallelism (SURVEY.md §5 long-context plan).

    Instead of hand-writing halo exchanges per layer, the forward is jitted
    under GSPMD with a sharded input: XLA inserts the halo collectives for
    every windowed op (conv/pool) and all-reduces for the global reductions
    (EvoNorm group-std, SE global pool) automatically — the idiomatic TPU
    route for models/volumes too large for one chip. Z is chosen because
    the 16-way TTA set permutes/flips only the X/Y axes (ops/tta.py), so
    the sharding composes with TTA.

    Returns the replicated main-head logits (or, with ``full_outputs``, the
    whole output tree incl. deep-supervision heads, for loss parity). Exact
    vs the unsharded forward when Z divides the axis
    (tests/test_parallel.py); otherwise Z is zero-padded BEFORE the forward
    and the pad enters the model's global reductions (EvoNorm group-std,
    SE pool) — same semantics as the host-side ÷8 pad, but callers wanting
    bit-parity with an unpadded serial forward should pad Z themselves
    (Engine._pad_case does, via z_multiple)."""
    from ..ops.tta import main_head

    n = mesh.shape[axis]
    b, s0, s1, s2, c = x.shape
    pad = (-s2) % n
    if pad:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, pad), (0, 0)])
    spec = P(None, None, None, axis, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    repl = NamedSharding(mesh, P())

    # one jitted executable per (apply_fn, mesh, axis, full_outputs) — a
    # fresh jit per call would retrace the full-volume graph per CASE
    # (2-8 min each through the axon remote-compile service)
    key = (id(apply_fn), mesh, axis, full_outputs)
    hit = _SPATIAL_FN_CACHE.get(key)
    if hit is not None:
        fn = hit[0]
    else:
        @jax.jit
        def fn(v, inp):
            out = apply_fn(v, inp)
            if not full_outputs:
                out = main_head(out)
            # replicate the outputs so downstream host/post code sees one
            return jax.tree_util.tree_map(
                lambda o: jax.lax.with_sharding_constraint(o, repl), out)
        # pin apply_fn so its id can't be recycled while the entry lives
        _SPATIAL_FN_CACHE[key] = (fn, apply_fn)

    out = fn(vs, xs)
    if pad:
        out = jax.tree_util.tree_map(lambda o: o[:, :, :, :s2], out)
    return out


_SPATIAL_FN_CACHE: dict = {}


# ---------------------------------------------------------------------------
# Spatial sharding with halo exchange (context-parallel analog)
# ---------------------------------------------------------------------------


def halo_exchange(x: Array, halo: int, axis_name: str,
                  spatial_axis: int = 1) -> Array:
    """Concatenate each shard with ``halo`` planes from its mesh neighbours
    along ``spatial_axis`` (zero planes at the slice boundary). Runs inside
    shard_map; communication is two ``ppermute`` shifts over ICI."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    size = x.shape[spatial_axis]

    def take(arr, start, count):
        sl = [slice(None)] * arr.ndim
        sl[spatial_axis] = slice(start, start + count)
        return arr[tuple(sl)]

    right_edge = take(x, size - halo, halo)     # send to right neighbour
    left_edge = take(x, 0, halo)                # send to left neighbour
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)])
    zeros = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=spatial_axis)


def sharded_conv3d(mesh: Mesh, x: Array, kernel: Array,
                   axis: str = "space") -> Array:
    """SAME conv3d with the volume sharded on spatial axis 1 (X) across the
    mesh: halo-exchange the kernel radius, conv VALID on the extended shard.
    Exact vs the unsharded conv for odd kernels."""
    kd = kernel.shape[0]
    halo = kd // 2

    def per_shard(xl, k):
        ext = halo_exchange(xl, halo, axis, spatial_axis=1)
        return jax.lax.conv_general_dilated(
            ext, k, (1, 1, 1),
            padding=[(0, 0), (halo, halo), (halo, halo)][:1] + [
                (k.shape[1] // 2, k.shape[1] // 2),
                (k.shape[2] // 2, k.shape[2] // 2)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, axis), P()), out_specs=P(None, axis),
        check_vma=False)
    return fn(x, kernel)
