"""Checkpointing with the reference best/last policy on Orbax.

Reference engine.py:454-509: every validation writes ``last_model.pth`` and,
when the tracked value improves, ``best_model.pth``; "best" means min loss,
min hausdorff_distance95, or max key metric. Inference loads best (or last
for SWA runs, main_inference.py:66-68).

Here each checkpoint is an Orbax PyTree directory (``best_model`` /
``last_model``) holding {epoch, params, batch_stats, opt_state-free model
state, swa_params, best_value}; the optimizer state is stored separately in
``last_model`` only (resume continues from last, engine.py:511-525).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .. import get_logger

logger = get_logger("checkpoint")

BEST_NAME = "best_model"
LAST_NAME = "last_model"


def _make_checkpointer(local: bool = False) -> ocp.Checkpointer:
    """On a multi-host runtime, checkpoints are written by the primary only
    (cli/main_train.py), so orbax's cross-process barriers must be scoped to
    process 0 — otherwise a primary-only save deadlocks in an allgather
    waiting for processes that never call save.

    ``local=True`` scopes to the CURRENT process instead: used for restores,
    where every process independently reads the shared checkpoint (striped
    evaluation). The per-process barrier prefix keeps the coordination
    service's barrier names disjoint when processes restore concurrently."""
    import jax
    if jax.process_count() > 1:
        pid = jax.process_index() if local else 0
        mp = ocp.options.MultiprocessingOptions(
            primary_host=pid, active_processes={pid},
            barrier_sync_key_prefix=f"proc{pid}" if local else None)
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(multiprocessing_options=mp),
            multiprocessing_options=mp)
    return ocp.PyTreeCheckpointer()


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """best/last checkpoint pair with the engine.py:474-497 improvement rule."""

    def __init__(self, save_dir: str, save_on: str = "loss",
                 key_metric: str = "dice"):
        if save_on not in ("loss", "key_metric"):
            raise ValueError("save_on must be 'loss' or 'key_metric'")
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self.save_on = save_on
        self.key_metric = key_metric
        # minimize loss / hd95; maximize everything else (engine.py:474-497)
        self.minimize = (save_on == "loss"
                         or key_metric == "hausdorff_distance95")
        self.best_value: Optional[float] = None
        self._ckptr = _make_checkpointer()

    def _payload(self, state: Any, epoch: int, value: float,
                 with_opt: bool) -> Dict[str, Any]:
        payload = {
            "epoch": np.asarray(epoch),
            "step": np.asarray(state.step),
            "params": _to_host(state.params),
            "best_value": np.asarray(value, np.float32),
        }
        bs = _to_host(state.batch_stats)
        if bs:
            payload["batch_stats"] = dict(bs)
        if state.swa_params is not None:
            payload["swa_params"] = _to_host(state.swa_params)
            payload["swa_n"] = np.asarray(state.swa_n)
        if with_opt:
            payload["opt_state"] = _to_host(state.opt_state)
        return payload

    def _write(self, name: str, payload: Dict[str, Any]) -> None:
        path = os.path.join(self.save_dir, name)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, payload)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)

    def save(self, state: Any, epoch: int, value: float) -> bool:
        """Write last; write best if improved. Returns True when best."""
        self._write(LAST_NAME, self._payload(state, epoch, value, with_opt=True))
        improved = (self.best_value is None
                    or (value < self.best_value if self.minimize
                        else value > self.best_value))
        if improved:
            self.best_value = float(value)
            self._write(BEST_NAME, self._payload(state, epoch, value,
                                                 with_opt=False))
            logger.info("epoch %d: new best %s=%.5f", epoch, self.save_on, value)
        return improved

    def save_last(self, state: Any, epoch: int,
                  batch_cursor: int = 0) -> None:
        """Write ONLY last_model (no best-tracking update) — the graceful
        preemption path (SIGTERM mid-training saves a resumable state
        without letting a partial epoch's loss contaminate 'best').

        ``batch_cursor``: number of batches of epoch+1 already applied to
        ``state`` when the stop landed MID-epoch; resume replays epoch+1
        from exactly this batch (Engine.train_epoch start_batch), keeping
        the optimizer step count, step-based schedules, and rng folding
        bit-identical to an uninterrupted run."""
        value = (self.best_value if self.best_value is not None
                 else (float("inf") if self.minimize else float("-inf")))
        payload = self._payload(state, epoch, value, with_opt=True)
        if batch_cursor:
            payload["batch_cursor"] = np.asarray(int(batch_cursor))
        self._write(LAST_NAME, payload)

    def restore(self, name: str = LAST_NAME) -> Dict[str, Any]:
        path = os.path.join(self.save_dir, name)
        return self._ckptr.restore(path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint directory (best_model/last_model) for inference.
    Process-local on multi-host runs: every process restores its own copy
    of the shared checkpoint (striped evaluation needs the weights
    everywhere, and restores are read-only)."""
    return _make_checkpointer(local=True).restore(path)


def resume_state(state: Any, ckpt: Dict[str, Any]) -> Tuple[Any, int]:
    """Reference Engine.resume (engine.py:511-525): reload params, SWA,
    optimizer and epoch into a fresh state. Returns (state, start_epoch)."""
    kwargs: Dict[str, Any] = {
        "params": ckpt["params"],
        "step": np.asarray(ckpt.get("step", 0)),
    }
    if "batch_stats" in ckpt:
        kwargs["batch_stats"] = ckpt["batch_stats"]
    if "opt_state" in ckpt:
        kwargs["opt_state"] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(ckpt["opt_state"]))
    if "swa_params" in ckpt and state.swa_params is not None:
        kwargs["swa_params"] = ckpt["swa_params"]
        kwargs["swa_n"] = np.asarray(ckpt.get("swa_n", 0))
    new_state = state.replace(**kwargs)
    return new_state, int(ckpt.get("epoch", 0))
