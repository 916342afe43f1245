"""Training driver — reference src/main_train.py:34-243 flow on the TPU
engine: config → loaders → model/criterion/optimizer → epoch loop with
val every ``val_frequency`` → best/last checkpoints → optional end-of-training
evaluation with and without TTA + hparams table."""

from __future__ import annotations

import os
import time
import warnings
from datetime import datetime

# multi-host: jax.distributed must come up before ANY import initialises the
# XLA backend (orbax/flax touch it at import time) — multihost itself
# imports jax lazily (parallel/multihost.py env contract)
from ..parallel.multihost import maybe_initialize_distributed

_DISTRIBUTED = maybe_initialize_distributed()

import jax
import numpy as np

from .. import set_main_logger
from ..config import TrainConfig, make_experience_name
from ..data.pipeline import make_train_val_loaders
from ..learning.checkpoint import (BEST_NAME, LAST_NAME, CheckpointManager,
                                   load_checkpoint, resume_state)
from ..learning.engine import Engine
from ..learning.losses import make_criterion
from ..learning.optimizers import make_optimizer
from ..learning.train_state import create_train_state
from ..models import get_model
from ..parallel.mesh import local_mesh
from ..utils.meter import AverageMeter, ProgressMeter
from ..utils.reporting import EvaluationReport, TensorBoardLogger
from .arguments import get_train_args


def post_kwargs_from_cfg(cfg) -> dict:
    """get_post_transforms flags (definer.py:671-698)."""
    return dict(
        logit_thresh=getattr(cfg, "logit_threshold", 0.5),
        cleaning_areas=getattr(cfg, "cleaning_areas", False),
        cleaning_areas_threshold=getattr(cfg, "cleaning_areas_threshold", 10),
        replace_value=getattr(cfg, "replace_value", False),
        replace_value_threshold=getattr(cfg, "replace_value_threshold", 20),
    )


def setup_save_path(cfg: TrainConfig) -> dict:
    """Experiment dir naming incl. the too-long-filename fallback
    (main_train.py:47-64)."""
    experience_name, h_params = make_experience_name(cfg)
    original = cfg.save_path
    if cfg.resume:
        cfg.save_path = os.path.dirname(cfg.resume.rstrip("/"))
        return h_params
    cfg.save_path = os.path.join(
        original, experience_name if not cfg.no_full_name else "")
    try:
        os.makedirs(cfg.save_path, exist_ok=True)
    except OSError:
        warnings.warn("Automatic file name with args is too long, replace "
                      "with the current date and time")
        cfg.save_path = os.path.join(
            original, datetime.now().strftime("%b%d_%H-%M-%S-%f"))
        os.makedirs(cfg.save_path, exist_ok=True)
    return h_params


def main(argv=None) -> None:
    total_start = time.time()
    # jax.devices() spans all hosts when _DISTRIBUTED (data axis over DCN)
    from ..parallel.multihost import is_primary
    distributed = _DISTRIBUTED

    # graceful preemption (TPU pods get preempted; the reference only has
    # manual --resume): SIGTERM sets a flag → a resumable last_model is
    # written and the process exits 0. Installed FIRST so a signal landing
    # during the long startup compiles is caught (the flag is then honored
    # at the first training batch). Single-process runs stop per-batch;
    # multi-host runs reach epoch-end consensus (every process must agree
    # on the stop step or the collectives deadlock).
    import signal
    # defer=True while a checkpointable training phase is (or will be)
    # running: the flag is honored at the next training batch / epoch
    # consensus. Outside that window (--only_evaluate, end-of-training
    # eval) deferring would silently swallow the signal, so the handler
    # keeps SIGTERM's terminate semantics there.
    stop_requested = {"flag": False, "defer": True}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        if not stop_requested["defer"]:
            raise SystemExit(128 + signum)

    try:
        signal.signal(signal.SIGTERM, _request_stop)
    except ValueError:  # not the main thread (in-process test harnesses)
        pass

    cfg = get_train_args(argv)
    h_params = setup_save_path(cfg)
    primary = is_primary()

    if not cfg.resume and primary:
        cfg.to_yaml(os.path.join(cfg.save_path, "config.yaml"))

    logger = set_main_logger(
        os.path.join(cfg.save_path, "logfile.log") if primary else None,
        verbosity=max(cfg.verbosity, 1))
    logger.info("devices: %s (process %d/%d)", jax.devices(),
                jax.process_index(), jax.process_count())
    from ..utils.profiling import (enable_compilation_cache,
                                   maybe_enable_from_env,
                                   tune_host_allocator)
    maybe_enable_from_env()
    tune_host_allocator()
    enable_compilation_cache(log_compiles=cfg.verbosity >= 2)

    train_loader, valid_loader = make_train_val_loaders(cfg)
    steps_per_epoch = max(len(train_loader), 1) if train_loader else 1

    model = get_model(cfg)
    criterion = make_criterion(cfg)
    tx = make_optimizer(cfg, steps_per_epoch)

    mesh = local_mesh()
    if distributed:
        # the CPU-backend gloo context has a hardcoded ~30 s rendezvous at
        # the FIRST collective; perform it now, before the (possibly
        # minutes-skewed) model compiles (multihost.warmup_collectives)
        from ..parallel.multihost import warmup_collectives
        warmup_collectives(mesh)
    eval_mesh = None
    if distributed:
        # validation is case-striped: EVERY process scores its own stripe
        # of the val cases on its process-LOCAL mesh (no collectives in
        # the eval loop), then meters merge globally (merge_meters is a
        # collective every process must join — do NOT gate eval on primary)
        from ..parallel.mesh import make_mesh
        eval_mesh = make_mesh(jax.local_devices(),
                              data=len(jax.local_devices()), space=1)
    tb = TensorBoardLogger(cfg.save_path,
                           enabled=not cfg.no_tensorboard and primary)
    engine = Engine(cfg, model, criterion, mesh=mesh, tb=tb,
                    eval_mesh=eval_mesh)

    rng = jax.random.PRNGKey(cfg.seed)
    patch = [p if p > 0 else 128 for p in cfg.patch_size]
    sample = np.zeros((max(cfg.batch_size, 1), *patch, 4), np.float32)
    state = create_train_state(model, tx, rng, sample,
                               use_swa=bool(cfg.swa_start))

    ckpt = CheckpointManager(cfg.save_path, save_on=cfg.save_on,
                             key_metric=cfg.key_metric[0])
    start_epoch = 1
    resume_batch = 0
    if cfg.resume is not None:
        loaded_ckpt = load_checkpoint(cfg.resume)
        state, last_epoch = resume_state(state, loaded_ckpt)
        start_epoch = last_epoch + 1
        # mid-epoch preemption cursor: epoch start_epoch already ran its
        # first resume_batch batches (checkpoint.save_last) — replay it
        # from there, not from batch 0
        resume_batch = int(np.asarray(loaded_ckpt.get("batch_cursor", 0)))
        # the rng folded into each train step is keyed on the engine's
        # global step (engine.train_epoch) — restore it so the resumed
        # trajectory is bit-identical to an uninterrupted run
        engine.global_step = (start_epoch - 1) * steps_per_epoch \
            + resume_batch
        if "best_value" in loaded_ckpt:
            # reference resume restores the tracked best (engine.py:511-525)
            ckpt.best_value = float(loaded_ckpt["best_value"])
        logger.info("resumed from %s at epoch %d (batch %d, best %s)",
                    cfg.resume, last_epoch, resume_batch, ckpt.best_value)

    if distributed:
        # the train state must be a GLOBAL array pytree replicated over the
        # spanning mesh — mixing process-local state with globally-sharded
        # batches deadlocks the collectives
        from ..parallel.multihost import replicate_tree
        state = replicate_tree(mesh, state)

    epoch_time = AverageMeter("Time", ":6.3f")
    progress = ProgressMeter(cfg.epochs, [epoch_time], prefix="Epoch: ")
    post_kwargs = post_kwargs_from_cfg(cfg)

    if cfg.only_evaluate:
        stop_requested["defer"] = False   # no training phase: SIGTERM exits
    if not cfg.only_evaluate:
        logger.info("Time elapsed before training: %.1fs",
                    time.time() - total_start)
        t0 = time.time()
        # deterministic preemption fault injection (tests): behave as if
        # SIGTERM landed when the global train step reaches N
        _stop_at = os.environ.get("BRATS21_PREEMPT_AT_STEP")
        _stop_at = int(_stop_at) if _stop_at is not None else None

        def should_stop() -> bool:
            if _stop_at is not None and engine.global_step >= _stop_at:
                stop_requested["flag"] = True
            return stop_requested["flag"]

        for epoch in range(start_epoch, cfg.epochs + 1):
            train_meters = None
            if not cfg.debug_val:
                state, train_meters = engine.train_epoch(
                    state, train_loader, epoch, rng,
                    should_stop=(None if distributed else should_stop),
                    start_batch=(resume_batch if epoch == start_epoch
                                 else 0))
            if distributed:
                # stop iff ANY process was signalled (collective consensus)
                from ..parallel.multihost import gather_objects
                stop_requested["flag"] = any(
                    gather_objects(stop_requested["flag"]))
            if stop_requested["flag"]:
                # Single-process may stop MID-epoch (per-batch check):
                # record epoch-1 plus the exact batch cursor so resume
                # replays ONLY the unseen remainder — the optimizer step
                # count, step-based schedules, and rng folding stay
                # bit-identical to an uninterrupted run. A stop that lands
                # after the last batch (engine.last_epoch_stop is None)
                # means the epoch completed and counts in full; so does
                # the multi-host epoch-END consensus stop.
                stop_batch = engine.last_epoch_stop
                if distributed or stop_batch is None:
                    done_epoch, cursor = epoch, 0
                else:
                    done_epoch, cursor = epoch - 1, stop_batch
                if primary:
                    ckpt.save_last(state, done_epoch, batch_cursor=cursor)
                logger.info("preempted after epoch %d (batch cursor %d): "
                            "last_model saved, exiting cleanly",
                            done_epoch, cursor)
                break
            epoch_time.update(time.time() - t0)
            t0 = time.time()
            progress.display(epoch)

            if cfg.fold is not None and epoch % cfg.val_frequency == 0 \
                    and (valid_loader is not None or distributed):
                # after swa_start the SWA-averaged weights are validated
                # (reference engine.py:184-187)
                use_swa = (bool(cfg.swa_start) and epoch > cfg.swa_start
                           and state.swa_params is not None)
                val_vars = {"params": state.swa_params if use_swa
                            else state.params}
                if state.batch_stats:
                    val_vars["batch_stats"] = state.batch_stats
                if distributed:
                    # every process scores its own stripe of the val cases
                    # on its LOCAL mesh (valid_loader was striped untrimmed
                    # at construction, pipeline.make_train_val_loaders);
                    # the replicated params are pulled to host so the eval
                    # jit stays process-local, then meters merge globally
                    val_vars = jax.tree_util.tree_map(
                        lambda x: np.asarray(x), val_vars)
                if valid_loader is not None and len(valid_loader):
                    val_meters = engine.evaluate(
                        [val_vars], valid_loader, epoch,
                        post_kwargs=post_kwargs,
                        step_mode="val_swa" if use_swa else "val")
                else:
                    # empty eval stripe (fewer val cases than processes):
                    # still join the merge collective with count-0 meters —
                    # skipping it would deadlock the scoring peers
                    val_meters = engine.empty_eval_meters()
                if distributed:
                    from ..parallel.multihost import merge_meters
                    merge_meters(val_meters)  # collective: all processes
                value = (val_meters["loss"].avg if cfg.save_on == "loss"
                         else float(np.nanmean(
                             val_meters[cfg.key_metric[0]].avg)))
                if primary:
                    ckpt.save(state, epoch, float(value))
                    if train_meters is not None:
                        tb.log_scalar("Loss/overfit",
                                      val_meters["loss"].avg
                                      - train_meters["loss"].avg, epoch)
            if cfg.fold is None and train_meters is not None and primary:
                ckpt.save(state, epoch, float(train_meters["loss"].avg))

    # training (if any) is over: nothing checkpointable remains, restore
    # SIGTERM's terminate semantics for the (long) final evaluation
    stop_requested["defer"] = False
    if (cfg.evaluate_end_training or cfg.only_evaluate) \
            and not stop_requested["flag"]:
        # reload best (or last for SWA) and evaluate ± TTA (main_train.py:197-243).
        # Multi-host: the final evaluation is case-striped too — every
        # process scores its stripe of valid_loader and the meters/report
        # rows merge globally; requires the checkpoint on shared storage
        # (the norm on TPU pods), asserted below after a write barrier.
        name = LAST_NAME if cfg.swa_start else BEST_NAME
        ckpt_path = os.path.join(cfg.save_path, name)
        if distributed:
            from ..parallel.multihost import (gather_objects, merge_meters,
                                              merge_report_rows)
            gather_objects(None)  # barrier: primary has finished writing
            if not os.path.exists(ckpt_path):
                raise FileNotFoundError(
                    f"process {jax.process_index()} cannot read {ckpt_path}"
                    " — multi-host end-of-training evaluation needs the"
                    " checkpoint directory on storage shared by all hosts")
        loaded = load_checkpoint(ckpt_path)
        params = loaded["swa_params"] if cfg.swa_start else loaded["params"]
        variables = {"params": params}
        if "batch_stats" in loaded:
            variables["batch_stats"] = loaded["batch_stats"]
        for eval_type in ("", "_tta"):
            logger.info("Starting Evaluation %s", eval_type)
            engine.val_step = 0
            suffix = f"_swa{eval_type}" if cfg.swa_start else eval_type
            # incremental flush per case (reference files.py:269-333): a
            # crash mid-eval keeps all completed rows on disk; non-primary
            # processes autosave under a .procN suffix so the shared dir
            # holds one partial per process until the merged final write
            report = EvaluationReport(
                autosave_dir=cfg.save_path,
                name=(f"Evaluation{suffix}" if primary else
                      f"Evaluation{suffix}.proc{jax.process_index()}"))
            if valid_loader is not None and len(valid_loader):
                meters = engine.evaluate(
                    [variables], valid_loader, 0, use_tta=bool(eval_type),
                    save_seg=True,
                    output_path=os.path.join(cfg.save_path,
                                             f"segmentations{eval_type}"),
                    post_kwargs=post_kwargs, report=report,
                    step_mode="metric_val")
            else:
                # empty eval stripe: still join the merge collectives below
                # (count-0 meters, zero report rows) — see the in-training
                # validation note above
                meters = engine.empty_eval_meters()
            if distributed:
                merge_meters(meters)        # collectives: every process
                merge_report_rows(report)   # participates, primary writes
            if primary:
                report.name = f"Evaluation{suffix}"
                report.save(cfg.save_path)
                metric_summary = {
                    f"{k}_mean": float(np.nanmean(m.avg))
                    for k, m in meters.items()
                    if k not in ("batch_time", "data_time")}
                tb.log_hparams({**h_params, "tta": bool(eval_type),
                                "swa": bool(cfg.swa_start)}, metric_summary)
    tb.close()
    logger.info("total time: %.1fs", time.time() - total_start)


if __name__ == "__main__":
    main()
