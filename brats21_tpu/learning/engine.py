"""The Engine: training epochs + the heavy evaluate path
(ensemble × TTA × sliding-window × post-processing × metrics × NIfTI save).

TPU re-design of reference learning/engine.py:37-525. The critical change is
data movement: the reference crosses the host boundary per TTA combo and per
ensemble member (engine.py:234,239,438-439); here a case is transferred to
HBM once, every member/TTA/window forward accumulates on-device, and only
the fused binarized volume returns to the host (for scipy HD95 + NIfTI).

Static-shape policy: each case is padded host-side to a shape bucket
(divisible-by-``bucket`` cube-corrected for TTA), so XLA compiles one eval
executable per bucket instead of per case.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import get_logger
from ..data import transforms as T
from ..data.nifti import write_nifti
from ..ops.postprocess import post_process
from ..ops.sliding_window import sliding_window_inference
from ..ops.staple import staple_multichannel
from ..ops.tta import tta_mean_probs
from ..parallel.mesh import local_mesh
from ..utils.meter import AverageMeter, ProgressMeter
from ..utils.metrics import compute_case_metrics
from ..utils.reporting import EvaluationReport, TensorBoardLogger
from .losses import LossFn, deep_supervision_loss
from .train_state import (TrainState, make_train_step, model_uses_rng,
                          swa_update)

logger = get_logger("engine")

Array = jax.Array

#: per-process cache of the measured host link bandwidth (wire="auto")
_WIRE_PROBE_MBPS: Dict[str, float] = {}

_STAGE_SENTINEL = object()


class _IterStage:
    """One background thread mapping ``fn`` over ``src_iter`` through a
    bounded queue — the eval pipeline's host PREP stage (pad + wire pack)
    runs ahead of the device dispatch instead of on its critical path.
    Abandon-safe like data.pipeline._PrefetchIterator: a consumer that
    stops early releases the producer via close()."""

    def __init__(self, src_iter, fn: Callable[[Any], Any], depth: int = 2):
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None
        self._closed = threading.Event()

        def _put(item) -> bool:
            while not self._closed.is_set():
                try:
                    self._q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def run():
            try:
                for item in src_iter:
                    if not _put(fn(item)):
                        return
            except BaseException as e:  # propagate into consumer
                self._err = e
            finally:
                _put(_STAGE_SENTINEL)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def close(self) -> None:
        self._closed.set()

    def __del__(self):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _STAGE_SENTINEL:
            self.close()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class _InlineIter:
    """Thread-free stand-in for :class:`_IterStage`
    (BRATS21_EVAL_STAGES=0): maps on the caller's thread."""

    def __init__(self, src_iter, fn: Callable[[Any], Any]):
        self._it, self._fn = src_iter, fn

    def close(self) -> None:
        pass

    def __iter__(self):
        return self

    def __next__(self):
        return self._fn(next(self._it))


class _InlineSink:
    """Thread-free stand-in for :class:`_SinkStage`."""

    def __init__(self, fn: Callable[..., None]):
        self._fn = fn

    def submit(self, *args) -> None:
        self._fn(*args)

    def close(self) -> None:
        pass

    def join(self) -> None:
        pass


class _SinkStage:
    """One background thread draining ``fn(*args)`` submissions in order —
    the eval pipeline's FINISH stage (metrics, report rows, NIfTI save)
    overlaps the next case's device compute. Submission order is the
    completion order, so meters/report rows stay deterministic. Errors
    re-raise on the next submit() or at join()."""

    def __init__(self, fn: Callable[..., None], depth: int = 4):
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None
        self._closed = threading.Event()

        def run():
            while not self._closed.is_set():
                try:
                    item = self._q.get(timeout=0.5)
                except queue.Empty:
                    continue
                if item is _STAGE_SENTINEL:
                    return
                if self._err is not None:
                    continue        # drain remaining items after an error
                try:
                    fn(*item)
                except BaseException as e:
                    self._err = e

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def submit(self, *args) -> None:
        if self._err is not None:
            raise self._err
        while not self._closed.is_set():
            try:
                self._q.put(args, timeout=0.5)
                return
            except queue.Full:
                continue
        # A closed sink's worker will never run this item; dropping it
        # silently could lose e.g. a NIfTI save on an error path — raise so
        # the caller sees the loss (VERDICT r3 weak #8).
        raise RuntimeError("_SinkStage.submit() after close(): work dropped")

    def close(self) -> None:
        """Release the worker without draining (error paths)."""
        self._closed.set()

    def __del__(self):  # abandoned sink → no thread leak
        self.close()

    def join(self) -> None:
        """Drain everything, stop the worker, re-raise any error."""
        self._q.put(_STAGE_SENTINEL)
        self._t.join()
        if self._err is not None:
            raise self._err


def probe_wire_bandwidth() -> float:
    """Measured H2D MB/s of an 8 MB buffer to the default device: median
    of five timed transfers after one untimed warmup (dispatch+layout).
    The relay link fluctuates several-fold sample-to-sample (CLAUDE.md's
    8× note), so a best-of estimate would lock wire='dense' on one lucky
    burst — the median is the repo-wide practice (bench.py
    median-of-chunks). ``block_until_ready`` does not synchronize through
    remote-device relays (axon), so a tiny D2H read of a slice is what
    forces each transfer to complete."""
    import jax.numpy as _jnp
    backend = jax.default_backend()
    if backend in _WIRE_PROBE_MBPS:
        return _WIRE_PROBE_MBPS[backend]
    buf = np.zeros((4 * 1024 * 1024,), np.float16)   # 8 MB
    samples = []
    for i in range(6):
        t0 = time.time()
        dev = _jnp.asarray(buf)
        np.asarray(dev[:8])
        if i > 0:   # first transfer pays warmup
            samples.append(buf.nbytes / 1e6 / max(time.time() - t0, 1e-9))
    med = float(np.median(samples))
    _WIRE_PROBE_MBPS[backend] = med
    return med


class Engine:
    """Drives training and evaluation for one model (or an ensemble at
    inference: pass ``params_list`` to :meth:`evaluate`)."""

    def __init__(self, cfg: Any, model, criterion: LossFn,
                 mesh=None, tb: Optional[TensorBoardLogger] = None,
                 labels: Sequence[str] = ("WT", "TC", "ET"),
                 eval_mesh=None):
        self.cfg = cfg
        self.model = model
        self.criterion = criterion
        self.mesh = mesh if mesh is not None else local_mesh()
        # evaluation may use a different (e.g. process-local) mesh than
        # training: on a multi-host run the train mesh spans processes
        # while validation runs on the primary's local devices
        self.eval_mesh = eval_mesh if eval_mesh is not None else self.mesh
        self.tb = tb or TensorBoardLogger(None, enabled=False)
        self.labels = list(labels)
        self.train_step_fn = make_train_step(
            criterion, use_amp=not cfg.no_amp,
            has_batch_stats=(cfg.norm == "batch"),
            has_dropout=model_uses_rng(cfg),
            log_metrics=getattr(cfg, "log_train_metrics", False))
        self.global_step = 0
        self.val_step = 0
        self._eval_cache: Dict[Tuple, Callable] = {}
        self._wire_resolved: Optional[str] = None
        # batch index where the last train_epoch stopped early (graceful
        # preemption), or None when it ran to completion
        self.last_epoch_stop: Optional[int] = None

    # ------------------------------------------------------------------ train

    def train_epoch(self, state: TrainState, loader, epoch: int,
                    rng: Array, should_stop: Optional[Callable[[], bool]]
                    = None, start_batch: int = 0,
                    ) -> Tuple[TrainState, Dict[str, AverageMeter]]:
        """One epoch (engine.py:65-161): batch loop → jitted step → meters.

        ``should_stop``: polled per batch (graceful preemption) — when it
        turns true the epoch ends early with the meters so far; the stop
        index is left in :attr:`last_epoch_stop` (None when the epoch ran
        to completion) so the caller can checkpoint an exact mid-epoch
        cursor. Only safe on single-process runs (multi-host stops at
        epoch consensus, cli/main_train.py).

        ``start_batch``: resume a preempted epoch from this batch index —
        the loader's deterministic per-epoch shuffle replays the same
        order, the first ``start_batch`` batches are skipped (their host
        preprocessing is still paid once), and ``global_step``-folded rng
        lines up with the uninterrupted run."""
        cfg = self.cfg
        self.last_epoch_stop: Optional[int] = None
        loader.set_epoch(epoch)
        batch_time = AverageMeter("time", ":6.3f")
        data_time = AverageMeter("data", ":6.3f")
        losses = AverageMeter("loss", ":.4e")
        gnorms = AverageMeter("grad_norm", ":.3f")
        meters = [batch_time, data_time, losses, gnorms]
        dice_meter = None
        if getattr(cfg, "log_train_metrics", False):
            dice_meter = AverageMeter("dice", ":.4f")
            meters.append(dice_meter)
        progress = ProgressMeter(len(loader), meters,
                                 prefix=f"Epoch: [{epoch}]")
        # Deferred metric collection = device-side double buffering: batch
        # N+1's H2D is dispatched BEFORE step N's metrics are forced back
        # (float() is the only sync point), so the transfer streams while
        # the device still computes step N. The reference blocks on a
        # synchronous .cuda() per batch (engine.py:88-90); SURVEY §2.10
        # plans exactly this async host→device feed.
        pending: Optional[Tuple] = None
        t_done = time.time()

        def collect(entry) -> None:
            nonlocal t_done
            metrics, n, i = entry
            losses.update(float(metrics["loss"]), n=n)   # syncs step i
            gnorms.update(float(metrics["grad_norm"]))
            if dice_meter is not None and "dice" in metrics:
                dice_meter.update(np.asarray(metrics["dice"]))
            batch_time.update(time.time() - t_done)
            t_done = time.time()
            if (i + 1) % cfg.log_train_interval == 0 or (i + 1) == len(loader):
                progress.display(i + 1)
                self.tb.log_meters(self.global_step,
                                   [losses, gnorms], step_mode="train_step")

        t0 = time.time()
        for i, batch in enumerate(loader):
            if i < start_batch:
                t0 = time.time()
                continue
            if should_stop is not None and should_stop():
                logger.info("train_epoch: stop requested at step %d/%d",
                            i, len(loader))
                self.last_epoch_stop = i
                break
            img = self._put_batch(self._train_wire_img(batch["img"]))
            target: Any = self._put_batch(
                self._train_wire_seg(batch["seg"]))
            if target.dtype == jnp.uint8:
                target = target.astype(jnp.float32)      # device-side
            if "boundary" in cfg.criterion:
                target = (target, self._put_batch(batch["distance_map"]))
            data_time.update(time.time() - t0)
            if pending is not None:
                collect(pending)   # step i-1 computes/streams meanwhile

            step_rng = jax.random.fold_in(rng, self.global_step)
            state, metrics = self.train_step_fn(state, img, target, step_rng)
            self.global_step += 1
            pending = (metrics, batch["img"].shape[0], i)
            t0 = time.time()
        if pending is not None:
            collect(pending)
        self.tb.log_meters(epoch, [losses], step_mode="train_epoch")
        # SWA (engine.py:151-159); swa active iff swa_start truthy
        # (reference main_train.py:113 `if args.swa_start`). A preempted
        # partial epoch must NOT contribute to the SWA average — the epoch
        # replays on resume and would be double-counted.
        if cfg.swa_start and epoch > cfg.swa_start \
                and self.last_epoch_stop is None:
            state = swa_update(state)
        return state, {"loss": losses, "batch_time": batch_time,
                       "data_time": data_time}

    def _train_wire_img(self, arr: np.ndarray) -> np.ndarray:
        """Training images cross the wire as fp16 under amp (the step
        casts to bf16 anyway; fp16 keeps 3 more mantissa bits than bf16,
        so the double rounding is ulp-bounded) — half the H2D bytes on
        the per-batch transfer the reference pays in fp32 (engine.py:
        88-90). no_amp (fp32 compute) keeps the fp32 wire exactly.
        BRATS21_TRAIN_WIRE=fp32 opts out."""
        if self.cfg.no_amp or os.environ.get("BRATS21_TRAIN_WIRE") == "fp32":
            return arr
        return arr.astype(np.float16)

    def _train_wire_seg(self, arr: np.ndarray) -> np.ndarray:
        """Binary one-hot targets cross as uint8 (4× fewer bytes, exact);
        train_epoch casts back to fp32 on device."""
        if os.environ.get("BRATS21_TRAIN_WIRE") == "fp32":
            return arr
        return arr.astype(np.uint8)

    def _put_batch(self, arr: np.ndarray, mesh=None) -> Array:
        """Shard the batch axis over the mesh's 'data' axis when divisible,
        else replicate (batch 1 on an 8-device test mesh). On a mesh that
        spans processes, ``arr`` is this process's LOCAL shard of the
        global batch (multihost.global_batch_from_local)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = mesh if mesh is not None else self.mesh
        if jax.process_count() > 1 and any(
                d.process_index != jax.process_index()
                for d in mesh.devices.flat):
            from ..parallel.multihost import global_batch_from_local
            n = mesh.shape["data"]
            assert (arr.shape[0] * jax.process_count()) % n == 0, (
                f"multi-host: global batch {arr.shape[0]}x"
                f"{jax.process_count()} must divide the data axis ({n}); "
                "pick a per-process batch_size divisible by the local "
                "device count")
            return global_batch_from_local(mesh, arr)
        n = mesh.shape["data"]
        spec = P("data") if arr.shape[0] % n == 0 else P()
        return jax.device_put(arr, NamedSharding(mesh, spec))

    # --------------------------------------------------------------- evaluate

    def _get_eval_fn(self, model, shape: Tuple[int, ...], use_tta: bool,
                     sliding: bool, with_target: bool) -> Callable:
        """Build (and cache) the jitted per-member eval: (variables, img,
        target?) → (mean probs fp32, loss). Cached per (model, shape,
        mode) — ensemble members may be different architectures
        (main_inference.py:62-69)."""
        key = (id(model), shape, use_tta, sliding, with_target)
        if key in self._eval_cache:
            return self._eval_cache[key]
        cfg = self.cfg
        roi = tuple(cfg.sliding_window_size)
        use_amp = not cfg.no_amp

        def apply_eval(variables, x):
            return model.apply(variables, x, deterministic=True)

        n_dev = self.eval_mesh.shape["data"]

        if self.eval_mesh.shape.get("space", 1) > 1 and not use_tta \
                and not sliding:
            # volume sharded along Z across the 'space' axis (GSPMD inserts
            # the conv halo exchanges) — for volumes/models too large for
            # one chip; full output tree kept for loss parity
            from ..parallel.distributed import spatial_sharded_forward
            from ..ops.tta import main_head

            def spatial_fn(variables, img, target=None):
                x = img.astype(jnp.bfloat16 if use_amp else jnp.float32)
                outputs = spatial_sharded_forward(
                    self.eval_mesh, apply_eval, variables, x,
                    full_outputs=True)
                loss = (deep_supervision_loss(self.criterion, outputs, target)
                        if with_target else jnp.zeros([], jnp.float32))
                probs = jax.nn.sigmoid(main_head(outputs).astype(jnp.float32))
                return probs, loss

            self._eval_cache[key] = spatial_fn
            return spatial_fn

        def member_fn(variables, img, target):
            # wire dtype may be fp16; compute in bf16 (amp) or fp32
            x = img.astype(jnp.bfloat16 if use_amp else jnp.float32)
            if sliding and use_tta:
                # TTA composes over the sliding-window inferer, as in the
                # reference (_apply_tta -> _compute_output, engine.py:228-231);
                # on a mesh each TTA combo's window grid is striped across
                # the devices (parallel/distributed.sharded_sliding_window)
                def sw_apply(v):
                    if n_dev > 1:
                        from ..parallel.distributed import \
                            sharded_sliding_window
                        return sharded_sliding_window(
                            self.eval_mesh,
                            lambda w: apply_eval(variables, w), v, roi)
                    return sliding_window_inference(
                        v, roi, lambda w: apply_eval(variables, w),
                        sw_batch_size=2)
                probs, loss = tta_mean_probs(
                    sw_apply, x,
                    criterion=self.criterion if with_target else None,
                    target=target if with_target else None,
                    num_classes=cfg.num_classes)
                return probs, loss
            if sliding:
                def predictor(win):
                    return apply_eval(variables, win)
                if n_dev > 1:
                    from ..parallel.distributed import sharded_sliding_window
                    logits = sharded_sliding_window(self.eval_mesh,
                                                    predictor, x, roi)
                else:
                    logits = sliding_window_inference(x, roi, predictor,
                                                      sw_batch_size=2)
                loss = (deep_supervision_loss(self.criterion, logits, target)
                        if with_target else jnp.zeros([], jnp.float32))
                return jax.nn.sigmoid(logits.astype(jnp.float32)), loss
            if use_tta:
                apply_fn = lambda v: apply_eval(variables, v)
                if n_dev > 1:
                    # fan the 16 combos over the mesh (parallel/distributed);
                    # loss is psum-averaged over all 16 members, matching
                    # the single-device path
                    from ..parallel.distributed import sharded_tta_probs
                    if with_target:
                        probs, loss = sharded_tta_probs(
                            self.eval_mesh, apply_fn, x,
                            num_classes=cfg.num_classes,
                            criterion=self.criterion, target=target)
                    else:
                        probs = sharded_tta_probs(
                            self.eval_mesh, apply_fn, x,
                            num_classes=cfg.num_classes)
                        loss = jnp.zeros([], jnp.float32)
                    return probs, loss
                probs, loss = tta_mean_probs(
                    apply_fn, x,
                    criterion=self.criterion if with_target else None,
                    target=target if with_target else None,
                    num_classes=cfg.num_classes)
                return probs, loss
            outputs = apply_eval(variables, x)
            main = outputs[0] if isinstance(outputs, tuple) else outputs
            if isinstance(main, (list, tuple)):
                main = main[0]
            loss = (deep_supervision_loss(self.criterion, outputs, target)
                    if with_target else jnp.zeros([], jnp.float32))
            return jax.nn.sigmoid(main.astype(jnp.float32)), loss

        if with_target:
            fn = jax.jit(member_fn)
        else:
            fn = jax.jit(lambda v, i: member_fn(v, i, None))
        self._eval_cache[key] = fn
        return fn

    def _get_batched_eval_fn(self, model, shape: Tuple[int, ...],
                             with_target: bool) -> Callable:
        """Case-parallel plain eval (no TTA/sliding): a stack of cases
        sharded over the mesh 'data' axis, (variables, imgs[N,...],
        targets?) → (sigmoid probs[N,...] fp32, per-case loss[N]).

        Per-case losses are the vmapped deep-supervision loss on batch-of-1
        slices, bit-matching the serial per-case path. This stripes the
        reference's case-serial evaluate loop (engine.py:163-296) across
        devices when TTA/window parallelism is idle.

        On a data×space mesh the two compositions combine: cases shard
        over 'data' while each case's volume Z-shards over 'space' (GSPMD
        inserts the conv/pool halo exchanges, as in
        parallel.distributed.spatial_sharded_forward)."""
        n_space = self.eval_mesh.shape.get("space", 1)
        key = (id(model), shape, "case_batched", with_target, n_space)
        if key in self._eval_cache:
            return self._eval_cache[key]
        use_amp = not self.cfg.no_amp

        def member_fn(variables, imgs, targets):
            x = imgs.astype(jnp.bfloat16 if use_amp else jnp.float32)
            s2 = x.shape[3]
            if n_space > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P
                pad = (-s2) % n_space
                if pad:
                    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, pad),
                                    (0, 0)])
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.eval_mesh,
                                     P("data", None, None, "space")))
            outputs = model.apply(variables, x, deterministic=True)
            if n_space > 1 and x.shape[3] != s2:
                # heads are full-resolution (deep supervision upsamples);
                # drop the Z sharding pad before loss/probs
                outputs = jax.tree_util.tree_map(
                    lambda o: o[:, :, :, :s2], outputs)
            from ..ops.tta import main_head
            probs = jax.nn.sigmoid(main_head(outputs).astype(jnp.float32))
            if with_target:
                def case_loss(out, tgt):
                    add = lambda a: a[None]
                    return deep_supervision_loss(
                        self.criterion,
                        jax.tree_util.tree_map(add, out),
                        jax.tree_util.tree_map(add, tgt))
                losses = jax.vmap(case_loss)(outputs, targets)
            else:
                losses = jnp.zeros((imgs.shape[0],), jnp.float32)
            return probs, losses

        if with_target:
            fn = jax.jit(member_fn)
        else:
            fn = jax.jit(lambda v, i: member_fn(v, i, None))
        self._eval_cache[key] = fn
        return fn

    def _case_parallel_supported(self, members: List[Any],
                                 shape: Tuple[int, ...]) -> bool:
        """The batched fast path vmaps per-case losses over the output
        tree, which requires EVERY output leaf to carry the batch axis.
        Models with non-batched aux outputs (SegResNetVAE's
        {'vae_loss': scalar}, models/extra.py) must take the serial path
        — checked abstractly (eval_shape, no compile)."""
        dtype = jnp.float32 if self.cfg.no_amp else jnp.bfloat16
        x = jax.ShapeDtypeStruct((2, *shape), dtype)
        for member in members:
            model, variables = member if isinstance(member, tuple) \
                else (self.model, member)
            try:
                out = jax.eval_shape(
                    lambda v, i, m=model: m.apply(v, i, deterministic=True),
                    variables, x)
            except Exception:  # noqa: BLE001 — any trace failure → serial
                return False
            for leaf in jax.tree_util.tree_leaves(out):
                if getattr(leaf, "ndim", 0) == 0 or leaf.shape[0] != 2:
                    return False
        return True

    def _get_member_striped_fn(self, model, shape: Tuple[int, ...],
                               with_target: bool) -> Callable:
        """STAPLE ensembles: all members' forwards in ONE jit, the member
        stack sharded over the mesh 'data' axis (vmap over stacked params,
        input replicated). The reference runs ensemble members strictly
        serially (main_inference.py:62-86; engine.py:234-249)."""
        key = (id(model), shape, "member_striped", with_target)
        if key in self._eval_cache:
            return self._eval_cache[key]
        use_amp = not self.cfg.no_amp
        from jax.sharding import PartitionSpec as P
        mesh = self.eval_mesh

        def fn(stacked_vars, img, target):
            # shard_map (not vmap): each device traces a PLAIN forward for
            # its member shard — vmap's conv batching rule lowers
            # weight-batched convs as grouped convs and breaks on
            # non-divisible channel counts
            x = img.astype(jnp.bfloat16 if use_amp else jnp.float32)

            def per_shard(vars_shard):
                k = jax.tree_util.tree_leaves(vars_shard)[0].shape[0]
                probs_l, loss_l = [], []
                for i in range(k):          # members per device (usually 1)
                    v = jax.tree_util.tree_map(lambda a: a[i], vars_shard)
                    outputs = model.apply(v, x, deterministic=True)
                    from ..ops.tta import main_head
                    probs_l.append(jax.nn.sigmoid(
                        main_head(outputs).astype(jnp.float32)))
                    loss_l.append(
                        deep_supervision_loss(self.criterion, outputs, target)
                        if with_target else jnp.zeros([], jnp.float32))
                return jnp.stack(probs_l), jnp.stack(loss_l)

            specs = jax.tree_util.tree_map(lambda _: P("data"), stacked_vars)
            return jax.shard_map(
                per_shard, mesh=mesh, in_specs=(specs,),
                out_specs=(P("data"), P("data")), check_vma=False)(
                    stacked_vars)

        if with_target:
            jfn = jax.jit(fn)
        else:
            jfn = jax.jit(lambda v, i: fn(v, i, None))
        self._eval_cache[key] = jfn
        return jfn

    def _stack_members(self, members: List[Any]) -> Optional[Tuple]:
        """Stack a homogeneous ensemble's variables along a leading member
        axis padded to the mesh width, sharded over 'data'. Returns
        (model, stacked_tree, n_real) or None when the ensemble mixes
        architectures/param shapes (heterogeneous → serial fallback)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        ms = [m if isinstance(m, tuple) else (self.model, m) for m in members]
        if any(m[0] is not ms[0][0] for m in ms):
            return None
        trees = [m[1] for m in ms]
        treedef = jax.tree_util.tree_structure(trees[0])
        if any(jax.tree_util.tree_structure(t) != treedef for t in trees[1:]):
            return None
        n_dev = self.eval_mesh.shape["data"]
        n_real = len(trees)
        pad = (-n_real) % n_dev
        trees = trees + [trees[-1]] * pad
        try:
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *trees)
        except ValueError:  # shape mismatch (same arch class, diff widths)
            return None
        sharding = NamedSharding(self.eval_mesh, P("data"))
        stacked = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), stacked)
        return ms[0][0], stacked, n_real

    def _resolve_wire(self) -> str:
        """'sparse' or 'dense', resolved once per Engine from (in order)
        the BRATS21_SPARSE_WIRE env override, ``cfg.wire``, and — for
        wire='auto' — a one-shot host-link bandwidth probe: links slower
        than BRATS21_WIRE_AUTO_MBPS (default 500 MB/s; remote relays and
        networked mounts measure 25-50) get the sparse format + packed
        D2H; local PCIe/CPU links keep the parity-default dense path."""
        if self._wire_resolved is not None:
            return self._wire_resolved
        env = os.environ.get("BRATS21_SPARSE_WIRE")
        if env is not None:
            mode = "dense" if env in ("0", "false", "False") else "sparse"
        else:
            mode = getattr(self.cfg, "wire", "auto")
            if mode == "auto":
                mbps = probe_wire_bandwidth()
                thresh = float(os.environ.get("BRATS21_WIRE_AUTO_MBPS",
                                              "500"))
                mode = "sparse" if mbps < thresh else "dense"
                logger.info("wire=auto: link %.0f MB/s -> %s wire",
                            mbps, mode)
        self._wire_resolved = mode
        return mode

    def _pack_case_host(self, padded: np.ndarray) -> Tuple:
        """The host half of :meth:`_put_case` — the fp16 cast (dense) or
        sparse pack. Pure numpy, so the eval pipeline's prep stage runs it
        in a background thread, off the device-dispatch critical path."""
        if self._resolve_wire() == "dense":
            return ("dense", padded.astype(np.float16))
        from ..ops import wire
        bits, vals = wire.pack_volume(padded.astype(np.float16))
        return ("sparse", bits, vals)

    def _put_case(self, padded: np.ndarray,
                  wire_payload: Optional[Tuple] = None) -> Array:
        """One case to HBM for the serial eval path, fp16 over the wire.

        On the sparse wire (ops/wire.py; --wire / _resolve_wire) the
        transfer is the brain-masked sparse format: a packbits mask + the
        nonzero fp16 voxels — ~2× fewer wire bytes on a bbox-cropped BraTS
        case (~50% background) — reconstructed EXACTLY on device, so every
        downstream eval fn is untouched. ``wire_payload``: the
        :meth:`_pack_case_host` result when the prep stage already did the
        host work."""
        if wire_payload is None:
            wire_payload = self._pack_case_host(padded)
        if wire_payload[0] == "dense":
            return jnp.asarray(wire_payload[1])[None]
        from ..ops import wire
        _, bits, vals = wire_payload
        fn = self._eval_cache.get("_sparse_unpack")
        if fn is None:
            fn = jax.jit(wire.unpack_volume_device,
                         static_argnames=("spatial",))
            self._eval_cache["_sparse_unpack"] = fn
        return fn(jnp.asarray(bits), jnp.asarray(vals), padded.shape[:3])

    def _get_seal_fn(self, shape: Tuple[int, ...], pack: bool) -> Callable:
        """Jitted tail of a fused case: brain-mask the binarized output
        (engine.py:259) and, on the sparse wire, bit-pack it on device so
        the D2H transfer is 32× smaller than fp32 (ops/wire.py). Bit-exact:
        the fused output is binary {0, 1} by construction (post_process /
        staple threshold)."""
        key = ("seal", shape, pack)
        if key in self._eval_cache:
            return self._eval_cache[key]

        def seal(fused, img):
            brain = (img != 0).any(axis=-1, keepdims=True)
            out = fused * brain.astype(fused.dtype)
            if pack:
                from ..ops import wire
                return wire.pack_bits_device(out)
            return out

        fn = jax.jit(seal)
        self._eval_cache[key] = fn
        return fn

    def _post_batched(self, probs: Array, post_kwargs: Dict[str, Any]) -> Array:
        """post_process over a stack of cases. The CC-labeling / replace
        transforms operate on one volume (postprocess.py:252-268), so they
        are vmapped over the case axis; plain thresholding is batch-safe."""
        kw = post_kwargs or {}
        if kw.get("cleaning_areas") or kw.get("replace_value"):
            return jax.vmap(lambda p: post_process(p[None], **kw)[0])(probs)
        return post_process(probs, **kw)

    def _pad_case(self, img: np.ndarray, use_tta: bool, bucket: int,
                  z_multiple: int = 1
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-side pad of [X,Y,Z,C] to the eval bucket (ceil-before /
        floor-after, transforms.py:483-512); TTA additionally requires
        X == Y (see ops/tta.py), padded at the end.

        ``z_multiple``: on a spatial mesh Z is additionally padded to a
        multiple of the 'space' axis HERE, on the host — so the pad enters
        the model's global reductions (EvoNorm group-std, SE pool) exactly
        like the reference's own ÷8 zero-pad does (engine.py:217), and the
        sharded forward sees the identical volume as the serial path
        (no extra GSPMD-side pad → exact parity)."""
        padded, p_b, p_a = T.shape_to_divisible(img, k=bucket)
        if use_tta and padded.shape[0] != padded.shape[1]:
            side = max(padded.shape[0], padded.shape[1])
            extra = [(0, side - padded.shape[0]), (0, side - padded.shape[1]),
                     (0, 0), (0, 0)]
            padded = np.pad(padded, extra)
            p_a = p_a + np.array([extra[0][1], extra[1][1], 0])
        pad_z = (-padded.shape[2]) % z_multiple
        if pad_z:
            padded = np.pad(padded, [(0, 0), (0, 0), (0, pad_z), (0, 0)])
            p_a = p_a + np.array([0, 0, pad_z])
        return padded, p_b, p_a

    @staticmethod
    def _pad_with(arr: np.ndarray, p_b: np.ndarray, p_a: np.ndarray) -> np.ndarray:
        """Apply the exact image padding to an aligned array (targets must
        share the image's pad offsets)."""
        pads = [(int(b), int(a)) for b, a in zip(p_b, p_a)]
        pads += [(0, 0)] * (arr.ndim - 3)
        return np.pad(arr, pads)

    def _wanted_metrics(self) -> List[str]:
        cfg = self.cfg
        return list(dict.fromkeys(
            list(cfg.key_metric) + [m for m in cfg.additional_metrics if m]))

    def empty_eval_meters(self) -> Dict[str, AverageMeter]:
        """A meter dict shape-compatible with :meth:`evaluate`'s return, all
        count 0 — for processes whose eval stripe is EMPTY (fewer val cases
        than processes). They must still join the multihost.merge_meters
        collective; skipping it deadlocks the peers."""
        return {"loss": AverageMeter("loss", ":.4e"),
                "batch_time": AverageMeter("time", ":6.3f"),
                "data_time": AverageMeter("data", ":6.3f"),
                **{m: AverageMeter(m, ":.4f")
                   for m in self._wanted_metrics()}}

    def evaluate(self, members: List[Any], loader, epoch: int,
                 use_tta: bool = False, save_seg: bool = False,
                 output_path: Optional[str] = None,
                 suffix_seg_name: Optional[str] = None,
                 perform_staple: bool = False, staple_threshold: float = 0.5,
                 post_kwargs: Optional[Dict[str, Any]] = None,
                 report: Optional[EvaluationReport] = None,
                 step_mode: str = "val", bucket: Optional[int] = None,
                 ) -> Dict[str, AverageMeter]:
        """Ensemble × TTA evaluation over an EvalLoader (engine.py:163-296).

        ``members``: one entry per ensemble member — either a flax variable
        dict ({'params': ...}) applied with ``self.model``, or a
        (model, variables) pair for heterogeneous ensembles.
        """
        cfg = self.cfg
        metrics_wanted = self._wanted_metrics()
        losses = AverageMeter("loss", ":.4e")
        batch_time = AverageMeter("time", ":6.3f")
        # loader wait per case — separates host decode/preprocess (the
        # prefetch pipeline's residual, CPU-bound) from the device
        # wire+compute path in the displayed/returned meters
        data_time = AverageMeter("data", ":6.3f")
        metric_meters = {m: AverageMeter(m, ":.4f") for m in metrics_wanted}
        progress = ProgressMeter(len(loader),
                                 [batch_time, data_time, losses,
                                  *metric_meters.values()],
                                 prefix=f"Epoch Valid: [{epoch}]")
        post_kwargs = post_kwargs or {}
        sliding = bool(cfg.sliding_window_inference)
        if bucket is None:
            # parity default 8 (engine.py:192); coarser buckets cut the
            # number of distinct XLA compilations across cases
            # (--eval_bucket; env force-override for scripts)
            bucket = int(os.environ.get("BRATS21_EVAL_BUCKET", "0")) \
                or int(getattr(cfg, "eval_bucket", 8) or 8)
        if bucket < 8 or bucket % 8:
            # validate HERE (covers the env override and the inference
            # CLI, which builds its config without .validate()): a
            # non-multiple-of-8 pad shape-mismatches the skip concats
            # only after minutes of remote XLA compile
            raise ValueError(f"eval bucket must be a multiple of 8 (the "
                             f"model's downsampling factor), got {bucket}")

        n_dev = self.eval_mesh.shape["data"]
        # case-parallel fast path: when neither TTA-parallelism nor
        # window-parallelism occupies the mesh, stripe whole CASES across
        # the 'data' axis instead (VERDICT round-1 #6; the reference is
        # strictly case-serial, engine.py:163-296)
        n_space = self.eval_mesh.shape.get("space", 1)
        # None = eligible, resolved on the first case's shape (output trees
        # with non-batched leaves can't vmap per-case losses)
        case_parallel: Optional[bool] = (
            None if ((n_dev > 1 or n_space > 1)
                     and not use_tta and not sliding
                     and not perform_staple
                     and not os.environ.get("BRATS21_EVAL_SERIAL"))
            else False)
        # STAPLE member striping: a homogeneous ensemble's members forward
        # together, the member stack sharded over 'data' (serial fallback
        # for heterogeneous ensembles or via BRATS21_STAPLE_SERIAL).
        # Every mode decision is LOGGED — no silent fallbacks (VERDICT
        # round-2 #8).
        member_stack = None
        if perform_staple and len(members) > 1:
            if use_tta or sliding:
                logger.info(
                    "STAPLE×%s: members run serially, the mesh "
                    "parallelises %s within each member",
                    "TTA" if use_tta else "sliding-window",
                    "the 16 TTA combos" if use_tta else "the window grid")
            elif n_dev > 1 and os.environ.get("BRATS21_STAPLE_SERIAL"):
                logger.info("BRATS21_STAPLE_SERIAL=1: STAPLE members run "
                            "serially by request")
            elif n_dev > 1:
                member_stack = self._stack_members(members)
                if member_stack is None:
                    logger.info(
                        "STAPLE ensemble mixes architectures/param shapes: "
                        "member striping needs a homogeneous stack — "
                        "falling back to the serial member loop")
                elif jax.process_count() > 1:
                    logger.info(
                        "multi-host STAPLE: %d members stripe over the %d "
                        "process-LOCAL devices on each host (striping does "
                        "not span processes; cases already stripe across "
                        "hosts)", len(members), n_dev)
        if member_stack is not None and len(members) > n_dev:
            logger.info(
                "STAPLE: %d members > %d devices — each device forwards "
                "ceil(%d/%d) members in sequence inside the striped jit",
                len(members), n_dev, len(members), n_dev)

        n_cases = len(loader)
        done = 0
        pending: Dict[Tuple, List[Dict[str, Any]]] = {}
        # sparse wire → bit-packed D2H of the fused binary output (32×
        # fewer bytes than fp32) + deeper transfer/compute pipelining
        pack = self._resolve_wire() == "sparse"
        depth = max(int(os.environ.get("BRATS21_EVAL_PIPELINE", "2")), 1)
        inflight: List[Dict[str, Any]] = []

        def case_metrics_main(case: Dict[str, Any], fused_np: np.ndarray,
                              loss_val: Optional[float]
                              ) -> Optional[Dict[str, np.ndarray]]:
            """Metric computation stays on the MAIN thread — it runs jitted
            jax (dice/sens/spec) and jax dispatch must not race the eval
            pipeline's own device calls from another thread."""
            if loss_val is None:
                return None
            return compute_case_metrics(fused_np, case["tgt_padded"][None],
                                        metrics_wanted)

        def finish_case(case: Dict[str, Any], fused_np: np.ndarray,
                        loss_val: Optional[float],
                        case_metrics: Optional[Dict[str, np.ndarray]],
                        elapsed: float) -> None:
            nonlocal done
            done += 1
            self.val_step += 1
            if loss_val is not None:
                losses.update(loss_val)
                for name, meter in metric_meters.items():
                    vals = case_metrics[name.title()]
                    meter.update(np.asarray(vals).ravel())
                if report is not None:
                    report.add(case["batch"]["patient_id"][0], case_metrics)
            batch_time.update(elapsed)
            if done % cfg.log_val_interval == 0 or done == n_cases:
                progress.display(done)
                self.tb.log_meters(self.val_step,
                                   [losses, *metric_meters.values()],
                                   step_mode=f"{step_mode}_step")
            if save_seg:
                assert output_path, "if save_seg, output_path is needed"
                case_dir = output_path
                if getattr(cfg, "create_patient_dir", False):
                    case_dir = os.path.join(output_path,
                                            case["batch"]["patient_id"][0])
                self._save_segmentation(case["batch"], fused_np[0],
                                        case["p_b"], case["p_a"],
                                        case_dir, suffix_seg_name)

        # finish stage: meters/report rows/NIfTI saves (pure host numpy +
        # IO, no jax) run in one ordered background thread so they overlap
        # the NEXT case's device compute. Constructed inside the try below
        # (with the prep stage) so no failure path leaks its thread;
        # flush_group/collect resolve the name at call time.
        writer: Optional[_SinkStage] = None

        def flush_group(cases: List[Dict[str, Any]]) -> None:
            """Run up to n_dev same-shape cases as one batch sharded over
            the mesh (padded to the mesh width so each shape compiles one
            executable)."""
            t_start = time.time()
            k = len(cases)
            with_target = cases[0]["tgt_padded"] is not None

            def stack(key):
                arr = np.stack([c[key] for c in cases])
                if k < n_dev:
                    arr = np.concatenate(
                        [arr, np.repeat(arr[-1:], n_dev - k, axis=0)])
                return arr

            imgs = stack("padded").astype(np.float16)
            img_dev = self._put_batch(imgs, self.eval_mesh)
            target_dev = None
            if with_target:
                target_dev = self._put_batch(stack("tgt_padded"),
                                             self.eval_mesh)
                if cases[0].get("dm") is not None:
                    target_dev = (target_dev,
                                  self._put_batch(stack("dm"),
                                                  self.eval_mesh))

            probs_sum = None
            loss_sum = np.zeros(n_dev, np.float32)
            for member in members:
                model, variables = member if isinstance(member, tuple) \
                    else (self.model, member)
                fn = self._get_batched_eval_fn(model, imgs.shape, with_target)
                if with_target:
                    probs, l = fn(variables, img_dev, target_dev)
                else:
                    probs, l = fn(variables, img_dev)
                loss_sum = loss_sum + np.asarray(l)
                probs_sum = probs if probs_sum is None else probs_sum + probs

            fused_dev = self._post_batched(probs_sum / len(members),
                                           post_kwargs)
            seal = self._get_seal_fn(tuple(fused_dev.shape), pack)
            sealed = seal(fused_dev, img_dev)
            if pack:
                from ..ops import wire
                fused = wire.unpack_bits(np.asarray(sealed),
                                         tuple(fused_dev.shape))
            else:
                fused = np.asarray(sealed)
            per_case = (time.time() - t_start) / k
            for i, c in enumerate(cases):
                l_val = (float(loss_sum[i]) / len(members)
                         if with_target else None)
                writer.submit(c, fused[i:i + 1], l_val,
                              case_metrics_main(c, fused[i:i + 1], l_val),
                              per_case)

        def dispatch(case: Dict[str, Any]) -> Dict[str, Any]:
            """Enqueue one case's full device pipeline — H2D (sparse or
            fp16 dense) → members × eval → fuse → brain-mask/bit-pack —
            WITHOUT forcing anything back to the host. JAX dispatch is
            async, so the call returns while the device still computes."""
            with_target = case["tgt_padded"] is not None
            img_dev = self._put_case(case["padded"], case.get("wire"))
            target_dev = None
            if with_target:
                target_dev = jnp.asarray(case["tgt_padded"])[None]
                if case["dm"] is not None:
                    target_dev = (target_dev, jnp.asarray(case["dm"])[None])

            member_posts = []
            probs_sum = None
            loss_sum = jnp.zeros([], jnp.float32)
            if member_stack is not None:
                st_model, stacked, n_real = member_stack
                fn = self._get_member_striped_fn(
                    st_model, case["padded"].shape, with_target)
                if with_target:
                    probs_m, loss_m = fn(stacked, img_dev, target_dev)
                else:
                    probs_m, loss_m = fn(stacked, img_dev)
                loss_sum = jnp.sum(loss_m[:n_real])
                member_posts = [post_process(probs_m[i], **post_kwargs)
                                for i in range(n_real)]
            else:
                for member in members:
                    model, variables = member if isinstance(member, tuple) \
                        else (self.model, member)
                    eval_fn = self._get_eval_fn(model, case["padded"].shape,
                                                use_tta, sliding, with_target)
                    if with_target:
                        probs, loss = eval_fn(variables, img_dev, target_dev)
                    else:
                        probs, loss = eval_fn(variables, img_dev)
                    loss_sum = loss_sum + loss
                    if perform_staple:
                        member_posts.append(
                            post_process(probs, **post_kwargs))
                    elif probs_sum is None:
                        probs_sum = probs
                    else:
                        probs_sum = probs_sum + probs

            if perform_staple:
                fused = staple_multichannel(jnp.stack(member_posts),
                                            threshold_value=staple_threshold)
            else:
                fused = post_process(probs_sum / len(members), **post_kwargs)
            # background masking (engine.py:259) + packed D2H, one jit
            seal = self._get_seal_fn(tuple(fused.shape), pack)
            return dict(case=case, sealed=seal(fused, img_dev),
                        shape=tuple(fused.shape),
                        loss=(loss_sum if with_target else None))

        t_collect = time.time()

        def collect(entry: Dict[str, Any]) -> None:
            """Force one in-flight case's D2H and finish it on the host
            (metrics, report, NIfTI save) — the host work overlaps the
            NEXT case's device compute."""
            nonlocal t_collect
            if pack:
                from ..ops import wire
                fused_np = wire.unpack_bits(np.asarray(entry["sealed"]),
                                            entry["shape"])
            else:
                fused_np = np.asarray(entry["sealed"])
            loss_val = (float(entry["loss"]) / len(members)
                        if entry["loss"] is not None else None)
            metrics_np = case_metrics_main(entry["case"], fused_np, loss_val)
            now = time.time()
            writer.submit(entry["case"], fused_np, loss_val, metrics_np,
                          now - t_collect)
            t_collect = now

        # host prep per case: pad to the bucket and — when the serial path
        # is certain (case_parallel resolved False up-front) — the wire
        # pack/cast, all in the prep stage's background thread
        prepack = case_parallel is False

        def prep(batch: Dict[str, Any]) -> Dict[str, Any]:
            img_np = batch["img"][0]                      # [X,Y,Z,4]
            target_np = batch.get("seg")
            padded, p_b, p_a = self._pad_case(img_np, use_tta, bucket,
                                              z_multiple=n_space)
            with_target = target_np is not None
            tgt_padded = (self._pad_with(target_np[0], p_b, p_a)
                          if with_target else None)
            dm = None
            if with_target and "boundary" in cfg.criterion \
                    and "distance_map" in batch:
                dm = self._pad_with(batch["distance_map"][0], p_b, p_a)
            case = dict(batch=batch, padded=padded, p_b=p_b, p_a=p_a,
                        tgt_padded=tgt_padded, dm=dm)
            if prepack:
                case["wire"] = self._pack_case_host(padded)
            return case

        # BRATS21_EVAL_STAGES=0 runs prep/finish inline on the caller's
        # thread (no background stages) — a debugging/fallback mode that
        # trades the host/device overlap for a single-threaded eval loop
        use_stages = os.environ.get("BRATS21_EVAL_STAGES", "1") != "0"
        prep_stage = None
        try:
            writer = (_SinkStage(finish_case, depth=4) if use_stages
                      else _InlineSink(finish_case))
            prep_stage = (_IterStage(iter(loader), prep, depth=depth)
                          if use_stages else _InlineIter(iter(loader), prep))
            while True:
                t_wait = time.time()
                try:
                    case = next(prep_stage)
                except StopIteration:
                    break
                data_time.update(time.time() - t_wait)
                padded = case["padded"]
                with_target = case["tgt_padded"] is not None
                if case_parallel is None:
                    # decided once, on the first case's shape: models whose
                    # output trees have non-batched leaves fall back to
                    # serial
                    case_parallel = self._case_parallel_supported(
                        members, padded.shape)

                if case_parallel:
                    group = pending.setdefault(
                        (padded.shape, with_target, case["dm"] is not None),
                        [])
                    group.append(case)
                    if len(group) == n_dev:
                        flush_group(group)
                        group.clear()
                    continue

                # ---- serial per-case path (TTA / sliding / STAPLE /
                # 1 device). Up to ``depth`` cases in flight
                # (BRATS21_EVAL_PIPELINE, default 2): case N+1's H2D +
                # forward are enqueued while case N still computes, and
                # case N's D2H collects one case behind — the
                # transfer/compute pipelining that produced the bench.py
                # headline, now in the product path (the reference
                # synchronizes per TTA member, engine.py:234-239).
                inflight.append(dispatch(case))
                while len(inflight) >= depth:
                    collect(inflight.pop(0))

            # drain the pipeline, then flush remaining partial shape-groups
            # (case-parallel mode), then the finish stage
            for entry in inflight:
                collect(entry)
            inflight.clear()
            for group in pending.values():
                if group:
                    flush_group(group)
            writer.join()
        finally:
            if prep_stage is not None:
                prep_stage.close()
            if writer is not None:
                writer.close()

        self.tb.log_meters(epoch, [losses, *metric_meters.values()],
                           step_mode=f"{step_mode}_epoch")
        return {"loss": losses, "batch_time": batch_time,
                "data_time": data_time, **metric_meters}

    def _save_segmentation(self, batch: Dict[str, Any], fused: np.ndarray,
                           p_b: np.ndarray, p_a: np.ndarray,
                           output_path: str, suffix: Optional[str]) -> None:
        """shape_to_original → BraTS labels → pad_back → NIfTI uint8
        (engine.py:281-294, files.py:233-253)."""
        out = T.shape_to_original(fused, p_b, p_a)
        labels = T.change_label_3_to_4(T.multichannel_to_brats_labels(out))
        labels = T.pad_back_to_shape_before_compose(
            labels, np.asarray(batch["foreground_start_coord"][0]),
            np.asarray(batch["foreground_end_coord"][0]),
            np.asarray(batch["original_shape"][0]))
        pid = batch["patient_id"][0]
        os.makedirs(output_path, exist_ok=True)
        fname = f"{pid}_{suffix}.nii.gz" if suffix else f"{pid}.nii.gz"
        affine = np.asarray(batch.get("affine"))
        if affine.ndim == 3:
            affine = affine[0]
        write_nifti(os.path.join(output_path, fname),
                    labels.astype(np.uint8), affine)
        logger.debug("saved segmentation %s", fname)
