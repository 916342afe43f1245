"""Fold-parallel training on the virtual CPU mesh."""

import glob
import os

import jax
import numpy as np
import pytest

from brats21_tpu.cli.main_train_folds import main as folds_main


def test_parallel_folds_e2e(tmp_path, synthetic_case):
    save = str(tmp_path / "folds_runs")
    argv = [
        "--train_data_path", synthetic_case,
        "--save_path", save,
        "--model", "equiunet",
        "--width", "4",
        "--criterion", "dice",
        "--optimizer", "adam",
        "--learning_rate", "1e-3",
        "--epochs", "1",
        "--val_frequency", "1",
        "--patch_size", "16", "16", "16",
        "--batch_size", "1",
        "--num_workers", "1",
        "--no_tensorboard",
        "--no_amp",
    ]
    folds_main(argv)
    base = glob.glob(os.path.join(save, "*_folds"))[0]
    fold_dirs = sorted(glob.glob(os.path.join(base, "fold_*")))
    assert len(fold_dirs) == 5
    for d in fold_dirs:
        assert os.path.exists(os.path.join(d, "config.yaml"))
        assert os.path.isdir(os.path.join(d, "best_model"))

    # per-fold checkpoints differ (independent folds, different rngs/data)
    from brats21_tpu.learning.checkpoint import load_checkpoint
    p0 = load_checkpoint(os.path.join(fold_dirs[0], "best_model"))["params"]
    p1 = load_checkpoint(os.path.join(fold_dirs[1], "best_model"))["params"]
    l0 = jax.tree_util.tree_leaves(p0)
    l1 = jax.tree_util.tree_leaves(p1)
    assert any(not np.allclose(a, b) for a, b in zip(l0, l1))


def test_fold_step_single_device_loops_all_folds(eight_devices, rng):
    """With fewer devices than folds each device loops its whole shard —
    all folds must actually train (regression: [0]-indexing trained only
    fold 0)."""
    import jax.numpy as jnp
    from brats21_tpu.config import TrainConfig
    from brats21_tpu.learning.losses import make_criterion
    from brats21_tpu.learning.optimizers import make_optimizer
    from brats21_tpu.learning.train_state import (create_train_state,
                                                  make_train_step)
    from brats21_tpu.models import get_model
    from brats21_tpu.parallel.folds import (make_fold_train_step,
                                            stack_fold_states,
                                            unstack_fold_state)
    from brats21_tpu.parallel.mesh import make_mesh

    mesh1 = make_mesh(eight_devices[:1], data=1, space=1)
    cfg = TrainConfig(model="equiunet", width=4, optimizer="adam",
                      criterion="dice", epochs=2, weight_decay=0.0)
    model = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=2)
    sample = np.zeros((1, 16, 16, 16, 4), np.float32)

    def make_state(r):
        return create_train_state(model, tx, r, sample)

    k = 3
    rngs = [jax.random.PRNGKey(i) for i in range(k)]
    state = stack_fold_states(make_state, rngs, mesh1)
    step = make_fold_train_step(
        make_train_step(make_criterion(cfg), use_amp=False), mesh1, k)
    img = jnp.asarray(np.random.default_rng(0).random(
        (k, 1, 16, 16, 16, 4)).astype(np.float32))
    seg = jnp.asarray((np.random.default_rng(1).random(
        (k, 1, 16, 16, 16, 3)) > 0.5).astype(np.float32))
    rk = jax.vmap(jax.random.PRNGKey)(jnp.arange(k))
    before = [jax.tree_util.tree_leaves(
        unstack_fold_state(state, f).params)[0].copy() for f in range(k)]
    state, metrics = step(state, img, seg, rk)
    assert np.asarray(metrics["loss"]).shape == (k,)
    for f in range(k):
        after = jax.tree_util.tree_leaves(
            unstack_fold_state(state, f).params)[0]
        assert not np.allclose(np.asarray(before[f]), np.asarray(after)), \
            f"fold {f} did not train"
