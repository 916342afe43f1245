"""Functional train state + the jitted train step.

Replaces the mutable torch Engine internals (engine.py:37-161) with a single
pytree state and a pure step function:

    state, metrics = train_step(state, img, target, rng)

Mixed precision is the TPU policy: params fp32, activations bf16 (unless
cfg.no_amp), losses/grads fp32 — no GradScaler needed (the reference's
main_train.py:110 / engine.py:117-127 is CUDA fp16 machinery).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from .losses import LossFn, deep_supervision_loss

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any                       # flax mutable collections (may be {})
    opt_state: Any
    swa_params: Any                        # running average or None
    swa_n: Array                           # number of models averaged
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def create_train_state(model, tx: optax.GradientTransformation, rng: Array,
                       sample_input: Array, use_swa: bool = False) -> TrainState:
    variables = model.init({"params": rng, "dropout": rng}, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    opt_state = tx.init(params)
    swa_params = jax.tree_util.tree_map(
        lambda p: jnp.array(p, dtype=jnp.float32, copy=True),
        params) if use_swa else None
    return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      swa_params=swa_params, swa_n=jnp.zeros([], jnp.int32),
                      tx=tx, apply_fn=model.apply)


def model_uses_rng(cfg: Any) -> bool:
    """Whether the model consumes the 'dropout' rng stream in training:
    dropout layers, or SegResNetVAE's latent sampling (z = μ + σ·ε)."""
    return (getattr(cfg, "dropout", 0.0) > 0
            or getattr(cfg, "model", "") == "segresnetvae")


def make_train_step(criterion: LossFn, use_amp: bool = True,
                    has_batch_stats: bool = False, has_dropout: bool = False,
                    log_metrics: bool = False) -> Callable:
    """Build the jitted train step: forward (bf16) → deep-supervision loss →
    grad → optimizer update. ``target`` is seg or (seg, dist_map) for the
    boundary losses. With ``log_metrics`` the step also reports per-channel
    batch Dice of the main head (reference log_train_metrics,
    arguments_train.py:158)."""

    def _loss(params, batch_stats, apply_fn, img, target, rng):
        x = img.astype(jnp.bfloat16) if use_amp else img
        variables = {"params": params}
        kwargs: Dict[str, Any] = {"deterministic": not has_dropout}
        if has_dropout:
            kwargs["rngs"] = {"dropout": rng}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            outputs, mutated = apply_fn(variables, x, mutable=["batch_stats"],
                                        **kwargs)
            new_bs = mutated.get("batch_stats", batch_stats)
        else:
            outputs = apply_fn(variables, x, **kwargs)
            new_bs = batch_stats
        loss = deep_supervision_loss(criterion, outputs, target)
        main = outputs[0] if isinstance(outputs, tuple) else outputs
        if isinstance(main, (list, tuple)):
            main = main[0]
        return loss, (new_bs, main)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, img: Array, target: Any, rng: Array
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        grad_fn = jax.value_and_grad(_loss, has_aux=True)
        (loss, (new_bs, main)), grads = grad_fn(
            state.params, state.batch_stats, state.apply_fn, img, target, rng)
        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm}
        if log_metrics:
            from ..utils.metrics import dice_metric
            seg = target[0] if isinstance(target, tuple) else target
            pred = (jax.nn.sigmoid(main.astype(jnp.float32)) >= 0.5)
            metrics["dice"] = dice_metric(pred, seg).mean(axis=0)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt_state)
        return new_state, metrics

    return train_step


def swa_update(state: TrainState) -> TrainState:
    """Equal-average SWA update (torch AveragedModel default;
    main_train.py:113-115, engine.py:155-159): called once per epoch after
    swa_start."""
    if state.swa_params is None:
        return state
    n = state.swa_n.astype(jnp.float32)

    def avg(a, p):
        return a + (p.astype(jnp.float32) - a) / (n + 1.0)

    new_avg = jax.tree_util.tree_map(avg, state.swa_params, state.params)
    return state.replace(swa_params=new_avg, swa_n=state.swa_n + 1)
