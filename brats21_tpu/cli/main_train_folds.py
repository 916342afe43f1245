"""Fold-parallel training driver: all 5 CV folds in one run, one fold per
device (see parallel/folds.py). Same flag surface as main_train (--fold is
ignored); produces 5 per-fold run directories each holding config.yaml +
best/last checkpoints, directly consumable by main_inference as an ensemble.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from .. import set_main_logger
from ..config import make_experience_name
from ..data.discovery import kfold_split
from ..data.pipeline import (BraTSDataset, EvalLoader, TrainLoader,
                             create_train_val_records)
from ..learning.checkpoint import CheckpointManager
from ..learning.engine import Engine
from ..learning.losses import make_criterion
from ..learning.optimizers import make_optimizer
from ..learning.train_state import (create_train_state, make_train_step,
                                    model_uses_rng)
from ..models import get_model
from ..parallel.folds import (make_fold_train_step, stack_fold_states,
                              train_folds_epoch, unstack_fold_state)
from ..parallel.mesh import make_mesh
from .arguments import get_train_args
from .main_train import post_kwargs_from_cfg

N_FOLDS = 5


def main(argv=None) -> None:
    total_start = time.time()
    cfg = get_train_args(argv)
    experience_name, _ = make_experience_name(cfg)
    base_dir = os.path.join(cfg.save_path, experience_name + "_folds")
    os.makedirs(base_dir, exist_ok=True)
    logger = set_main_logger(os.path.join(base_dir, "logfile.log"),
                             verbosity=max(cfg.verbosity, 1))
    logger.info("devices: %s", jax.devices())
    from ..utils.profiling import (enable_compilation_cache,
                                    tune_host_allocator)
    tune_host_allocator()
    enable_compilation_cache()

    n_dev = len(jax.devices())
    data = N_FOLDS if n_dev >= N_FOLDS else 1
    mesh = make_mesh(data=data, space=1)
    if data < N_FOLDS:
        logger.warning("only %d devices for %d folds: each device loops "
                       "all folds sequentially", n_dev, N_FOLDS)

    # per-fold records/loaders (definer.py:609-614 split)
    from ..data.discovery import MODALITIES_WITH_SEG, create_database, \
        make_file_records
    db = create_database(cfg.train_data_path,
                         required_modality=MODALITIES_WITH_SEG)
    ids = list(db)
    recs = make_file_records(db, with_seg=True)
    needs_dm = "boundary" in cfg.criterion
    loaders, val_loaders, fold_dirs = [], [], []
    for fold in range(N_FOLDS):
        train_id, val_id = kfold_split(ids, fold, N_FOLDS, cfg.seed)
        train_recs = [r for r in recs if r["patient_id"] in set(train_id)]
        val_recs = [r for r in recs if r["patient_id"] in set(val_id)]
        ds = BraTSDataset(train_recs, with_seg=True,
                          remove_outliers=cfg.remove_outliers,
                          already_preprocess=cfg.already_preprocess,
                          normalize=False)
        # drop_last=True: fold-parallel lock-step needs equal batch shapes
        loaders.append(TrainLoader(ds, cfg.batch_size, cfg.patch_size,
                                   seed=cfg.seed, num_workers=cfg.num_workers,
                                   drop_last=True, compute_dm=needs_dm,
                                   remove_outliers=cfg.remove_outliers))
        vds = BraTSDataset(val_recs, with_seg=True,
                           remove_outliers=cfg.remove_outliers,
                           compute_distance_map=needs_dm,
                           already_preprocess=cfg.already_preprocess)
        val_loaders.append(EvalLoader(vds, num_workers=1))
        fold_dir = os.path.join(base_dir, f"fold_{fold}")
        os.makedirs(fold_dir, exist_ok=True)
        fold_cfg = cfg
        import dataclasses
        fold_cfg = dataclasses.replace(cfg, fold=fold, save_path=fold_dir)
        fold_cfg.to_yaml(os.path.join(fold_dir, "config.yaml"))
        fold_dirs.append(fold_dir)

    model = get_model(cfg)
    criterion = make_criterion(cfg)
    steps_per_epoch = max(min(len(l) for l in loaders), 1)
    tx = make_optimizer(cfg, steps_per_epoch)

    rng = jax.random.PRNGKey(cfg.seed)
    patch = [p if p > 0 else 128 for p in cfg.patch_size]
    sample = np.zeros((max(cfg.batch_size, 1), *patch, 4), np.float32)

    def make_state(r):
        return create_train_state(model, tx, r, sample,
                                  use_swa=bool(cfg.swa_start))

    fold_rngs = [jax.random.fold_in(rng, f) for f in range(N_FOLDS)]
    state = stack_fold_states(make_state, fold_rngs, mesh)

    single_step = make_train_step(criterion, use_amp=not cfg.no_amp,
                                  has_batch_stats=(cfg.norm == "batch"),
                                  has_dropout=model_uses_rng(cfg))
    step_fn = make_fold_train_step(single_step, mesh, N_FOLDS)

    engine = Engine(cfg, model, criterion, mesh=mesh)
    ckpts = [CheckpointManager(d, save_on=cfg.save_on,
                               key_metric=cfg.key_metric[0])
             for d in fold_dirs]
    post_kwargs = post_kwargs_from_cfg(cfg)

    logger.info("training %d folds in parallel on mesh %s", N_FOLDS,
                dict(mesh.shape))
    for epoch in range(1, cfg.epochs + 1):
        t0 = time.time()
        state, fold_losses = train_folds_epoch(
            step_fn, state, loaders, epoch, rng, mesh, needs_dm)
        logger.info("epoch %d (%.1fs): fold losses %s", epoch,
                    time.time() - t0,
                    np.array2string(fold_losses, precision=4))
        if epoch % cfg.val_frequency == 0:
            for fold in range(N_FOLDS):
                fstate = unstack_fold_state(state, fold)
                fold_vars = {"params": fstate.params}
                if fstate.batch_stats:
                    fold_vars["batch_stats"] = fstate.batch_stats
                meters = engine.evaluate([fold_vars],
                                         val_loaders[fold], epoch,
                                         post_kwargs=post_kwargs,
                                         step_mode=f"val_fold{fold}")
                value = (meters["loss"].avg if cfg.save_on == "loss"
                         else float(np.nanmean(
                             meters[cfg.key_metric[0]].avg)))
                ckpts[fold].save(fstate, epoch, float(value))
    logger.info("total time: %.1fs", time.time() - total_start)


if __name__ == "__main__":
    main()
