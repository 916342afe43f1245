"""Fold-parallel training: all K cross-validation folds train simultaneously,
one fold per mesh device.

The reference trains its 5-fold ensembles as five sequential single-GPU runs
(README.md:103-121). On a TPU slice the folds are independent — so the fold
axis becomes a *mapped, sharded* axis: parameters, optimizer state, and
batches all carry a leading [K] dimension laid out over the mesh's 'data'
axis; one jitted ``vmap`` of the train step advances every fold per step with
zero cross-device communication.

K-fold ensemble training cost drops from K sequential runs to ~1.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import get_logger
from ..learning.train_state import TrainState

logger = get_logger("folds")


def stack_fold_states(make_state: Callable[[jax.Array], TrainState],
                      rngs: Sequence[jax.Array], mesh: Mesh) -> TrainState:
    """Initialize K independent states (per-fold rngs) and stack every leaf
    on a leading fold axis sharded over the mesh's 'data' axis."""
    states = [make_state(r) for r in rngs]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *states)
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if x.shape[0] % mesh.shape["data"] == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, stacked)


def make_fold_train_step(train_step: Callable, mesh: Mesh,
                         n_folds: int) -> Callable:
    """Map the single-fold step over the leading fold axis with
    ``shard_map``: each device runs the *unbatched* step once per fold in
    its local shard (vmap would batch the conv kernels, which XLA's conv
    batching rules reject in the backward pass for small channel counts).
    With fewer devices than folds, each device loops its shard
    sequentially. The returned step takes stacked (state, img, target,
    rngs)."""
    k_local = n_folds // mesh.shape["data"]
    assert k_local * mesh.shape["data"] == n_folds,         f"{n_folds} folds must divide over {mesh.shape['data']} devices"

    def per_fold(state, img, target, rng):
        new_states, new_metrics = [], []
        for i in range(k_local):
            local = jax.tree_util.tree_map(lambda x: x[i], state)
            tgt = jax.tree_util.tree_map(lambda x: x[i], target)
            ns, m = train_step(local, img[i], tgt, rng[i])
            new_states.append(ns)
            new_metrics.append(m)
        stack = lambda *xs: jnp.stack([jnp.asarray(x) for x in xs])
        return (jax.tree_util.tree_map(stack, *new_states),
                jax.tree_util.tree_map(stack, *new_metrics))

    def fold_step(state, img, target, rngs):
        fn = jax.shard_map(per_fold, mesh=mesh,
                           in_specs=(P("data"), P("data"), P("data"),
                                     P("data")),
                           out_specs=(P("data"), P("data")),
                           check_vma=False)
        return fn(state, img, target, rngs)

    return fold_step


def unstack_fold_state(state: TrainState, fold: int) -> TrainState:
    """Extract one fold's state (host-side view) for checkpointing/eval."""
    return jax.tree_util.tree_map(lambda x: x[fold], state)


def stack_batches(batches: List[Dict[str, np.ndarray]],
                  keys: Sequence[str]) -> Dict[str, np.ndarray]:
    """[{k: [B,...]}] per fold → {k: [K, B, ...]}."""
    return {k: np.stack([b[k] for b in batches]) for k in keys}


def train_folds_epoch(step_fn: Callable, state: TrainState,
                      loaders: List, epoch: int, rng: jax.Array,
                      mesh: Mesh, criterion_needs_dm: bool = False,
                      ) -> Tuple[TrainState, np.ndarray]:
    """One epoch over K folds in lock-step. Returns (state, mean loss per
    fold). Folds may have different batch counts; the epoch runs
    min(len(loader)) steps so every fold advances equally."""
    k = len(loaders)
    iters = []
    for loader in loaders:
        loader.set_epoch(epoch)
        iters.append(iter(loader))
    n_steps = min(len(l) for l in loaders)
    sharding = NamedSharding(mesh, P("data"))
    losses = np.zeros(k)
    for i in range(n_steps):
        batches = [next(it) for it in iters]
        keys = ["img", "seg"] + (["distance_map"] if criterion_needs_dm else [])
        stacked = stack_batches(batches, keys)
        img = jax.device_put(stacked["img"], sharding)
        target: Any = jax.device_put(stacked["seg"], sharding)
        if criterion_needs_dm:
            target = (target, jax.device_put(stacked["distance_map"], sharding))
        rngs = jax.vmap(lambda f: jax.random.fold_in(
            jax.random.fold_in(rng, epoch * 100000 + i), f))(jnp.arange(k))
        state, metrics = step_fn(state, img, target, rngs)
        losses += np.asarray(metrics["loss"])
    return state, losses / max(n_steps, 1)
