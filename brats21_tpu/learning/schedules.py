"""LR schedules mirroring reference learning/lr_scheduler.py + torch
schedulers as wired in definer.py:383-408.

The reference steps schedulers once per *epoch* (main_train.py:151-159); these
schedules are functions of the global step with a known steps_per_epoch, so
they drop straight into the jitted optimizer chain.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax


def _epoch_of(step, steps_per_epoch: int):
    return step // steps_per_epoch


def multistep_lr(base_lr: float, epochs: int, steps_per_epoch: int,
                 milestone_every: int = 30, gamma: float = 0.1) -> optax.Schedule:
    """MultiStepLR(milestones=range(30, epochs, 30), gamma=0.1)
    (definer.py:393)."""
    milestones = list(range(milestone_every, epochs, milestone_every))

    def schedule(step):
        epoch = _epoch_of(step, steps_per_epoch)
        if not milestones:
            return jnp.asarray(base_lr, jnp.float32)
        count = jnp.sum(jnp.asarray([epoch >= m for m in milestones]).astype(jnp.int32))
        return base_lr * (gamma ** count)

    return schedule


def cosine_lr(base_lr: float, epochs: int, steps_per_epoch: int,
              eta_min: float = 0.0) -> optax.Schedule:
    """CosineAnnealingLR(T_max=epochs, eta_min=0) stepped per epoch
    (definer.py:402)."""

    def schedule(step):
        epoch = _epoch_of(step, steps_per_epoch).astype(jnp.float32) \
            if hasattr(step, "astype") else float(_epoch_of(step, steps_per_epoch))
        return eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * epoch / epochs)) / 2

    return schedule


def flat_cosine_lr(base_lr: float, epochs: int, steps_per_epoch: int,
                   step_size: float = 0.70, eta_min: float = 0.0) -> optax.Schedule:
    """FlatplusAnneal (lr_scheduler.py:88-111): flat for 70% of epochs then
    cosine to eta_min (definer.py:404 uses step_size=0.70)."""
    flat_range = int(epochs * step_size)
    t_max = max(epochs - flat_range, 1)

    def schedule(step):
        epoch = _epoch_of(step, steps_per_epoch)
        cr = jnp.maximum(epoch - flat_range, 0).astype(jnp.float32)
        annealed = eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * cr / t_max)) / 2
        return jnp.where(epoch < flat_range, base_lr, annealed)

    return schedule


def warmup_wrap(inner: optax.Schedule, base_lr: float, steps_per_epoch: int,
                total_epoch: int, multiplier: float = 1.0) -> optax.Schedule:
    """GradualWarmupScheduler (lr_scheduler.py:15-85) with multiplier=1:
    linear 0→base over total_epoch epochs, then the inner schedule shifted."""

    def schedule(step):
        epoch = _epoch_of(step, steps_per_epoch)
        warm = base_lr * (epoch.astype(jnp.float32) if hasattr(epoch, "astype")
                          else float(epoch)) / max(total_epoch, 1)
        after = inner(step - total_epoch * steps_per_epoch)
        return jnp.where(epoch <= total_epoch, jnp.minimum(warm, base_lr), after)

    return schedule


def swa_wrap(inner: optax.Schedule, cfg: Any, steps_per_epoch: int) -> optax.Schedule:
    """SWALR behaviour (main_train.py:113-115, engine.py:151-159): after
    swa_start the LR cosine-anneals from the base schedule's value to swa_lr
    over swa_anneal_epochs (torch SWALR anneal_strategy='cos')."""
    if not cfg.swa_start:
        return inner
    swa_start = int(cfg.swa_start)
    swa_lr = float(cfg.swa_lr)
    anneal = max(int(cfg.swa_anneal_epochs), 1)
    start_step = swa_start * steps_per_epoch

    def schedule(step):
        epoch = _epoch_of(step, steps_per_epoch)
        base = inner(jnp.minimum(step, start_step))
        t = jnp.clip((epoch - swa_start).astype(jnp.float32) / anneal, 0.0, 1.0)
        annealed = swa_lr + (base - swa_lr) * (1 + jnp.cos(jnp.pi * t)) / 2
        return jnp.where(epoch < swa_start, inner(step), annealed)

    return schedule


def make_lr_schedule(cfg: Any, steps_per_epoch: int) -> optax.Schedule:
    """Scheduler dispatch mirroring definer.py:383-408 + SWA wrapping."""
    base_lr = float(cfg.learning_rate)
    epochs = int(cfg.epochs)
    decay = cfg.decay_type
    if decay == "step":
        sched = multistep_lr(base_lr, epochs, steps_per_epoch)
    elif decay == "step_warmup":
        sched = warmup_wrap(multistep_lr(base_lr, epochs, steps_per_epoch),
                            base_lr, steps_per_epoch, total_epoch=5)
    elif decay == "cosine_warmup":
        sched = warmup_wrap(cosine_lr(base_lr, epochs, steps_per_epoch),
                            base_lr, steps_per_epoch,
                            total_epoch=max(epochs // 20, 1))
    elif decay == "cosine":
        sched = cosine_lr(base_lr, epochs, steps_per_epoch)
    elif decay == "flat_cosine":
        sched = flat_cosine_lr(base_lr, epochs, steps_per_epoch)
    else:
        raise Exception(f"unknown lr scheduler: {decay}")
    return swa_wrap(sched, cfg, steps_per_epoch)
