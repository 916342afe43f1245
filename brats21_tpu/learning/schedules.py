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
    linear 0→base over total_epoch epochs, then the inner schedule.

    The handoff is shifted by total_epoch+1, not total_epoch: the torch
    wrapper's first post-warmup get_lr returns the after-scheduler's
    *initial* lr before any after.step() has run (lr_scheduler.py:44-49,
    the ``finished`` transition), so the after-scheduler's epoch counter
    lags the wrapper's last_epoch by total_epoch+1. Verified step-by-step
    against the torch composition in tests/test_optim_golden.py."""

    def schedule(step):
        epoch = _epoch_of(step, steps_per_epoch)
        warm = base_lr * (epoch.astype(jnp.float32) if hasattr(epoch, "astype")
                          else float(epoch)) / max(total_epoch, 1)
        after = inner(step - (total_epoch + 1) * steps_per_epoch)
        return jnp.where(epoch <= total_epoch, jnp.minimum(warm, base_lr), after)

    return schedule


def _simulate_reference_swa_lrs(cfg: Any) -> "np.ndarray":
    """Per-epoch lr sequence of the reference's exact SWA stepping
    (engine.py:149-159 + torch scheduler semantics), simulated host-side
    in float64.

    The reference's epoch-end stepping is idiosyncratic:

    * while ``epoch <= swa_start`` the base scheduler is NOT stepped
      (engine.py:152-154) — the lr stays frozen at the base schedule's
      epoch-0 value (for flat_cosine that is base_lr; for warmup
      schedules the reference freezes at 0 — preserved);
    * for each epoch > swa_start, scheduler.step() and SWALR.step() run
      back-to-back. torch's MultiStepLR/CosineAnnealingLR are RECURSIVE
      (they read the group lr SWALR just modified), so the composition
      has no closed form — it must be simulated as the same recurrence.
      SWALR "un-anneals" the previous alpha before applying the new one
      (torch swa_utils.SWALR.get_lr); once alpha reaches 1 the lr is
      exactly swa_lr.

    Verified epoch-by-epoch against the real torch composition in
    tests/test_optim_golden.py.
    """
    import math

    import numpy as np

    base_lr = float(cfg.learning_rate)
    epochs = int(cfg.epochs)
    decay = cfg.decay_type
    swa_start = int(cfg.swa_start)
    swa_lr = float(cfg.swa_lr)
    anneal = max(int(cfg.swa_anneal_epochs), 1)
    milestones = set(range(30, epochs, 30))
    warm_total = 5 if decay == "step_warmup" else max(epochs // 20, 1)
    flat_range = int(epochs * 0.70)
    t_max_flat = max(epochs - flat_range, 1)

    # base-scheduler state: last_epoch ell, current group lr L,
    # warmup-wrapper after-scheduler epoch ell_a (-1 = not finished)
    ell, ell_a = 0, -1
    if decay in ("step_warmup", "cosine_warmup"):
        L = 0.0                                  # warm lr at last_epoch=0
    else:
        L = base_lr

    def base_step():
        nonlocal ell, ell_a, L
        ell += 1
        if decay == "step":
            if ell in milestones:
                L = L * 0.1
        elif decay == "cosine":
            # torch CosineAnnealingLR recursive form (reads group lr)
            L = (L - 0.0) * (1 + math.cos(math.pi * ell / epochs)) \
                / (1 + math.cos(math.pi * (ell - 1) / epochs))
        elif decay == "flat_cosine":
            # FlatplusAnneal is closed-form from base_lrs
            if ell < flat_range:
                L = base_lr
            else:
                cr = ell - flat_range
                L = base_lr * (1 + math.cos(math.pi * cr / t_max_flat)) / 2
        else:                                    # warmup wrappers
            if ell <= warm_total:
                L = base_lr * ell / warm_total
            elif ell_a < 0:
                # 'finished' transition: after-scheduler's initial lr
                ell_a = 0
                L = base_lr
            else:
                ell_a += 1
                if decay == "step_warmup":
                    if ell_a in milestones:
                        L = L * 0.1
                else:
                    L = L * (1 + math.cos(math.pi * ell_a / epochs)) \
                        / (1 + math.cos(math.pi * (ell_a - 1) / epochs))

    def alpha(t):
        return (1 - math.cos(math.pi * min(max(t, 0.0), 1.0))) / 2

    s = 0
    lrs = []
    for epoch in range(1, epochs + 1):
        lrs.append(L)
        if epoch <= swa_start:
            continue
        base_step()
        s += 1
        a_s, a_p = alpha(s / anneal), alpha((s - 1) / anneal)
        prev = swa_lr if a_p >= 1.0 else (L - a_p * swa_lr) / (1 - a_p)
        L = swa_lr * a_s + (1 - a_s) * prev
    return np.asarray(lrs, dtype=np.float32)


def swa_wrap(inner: optax.Schedule, cfg: Any, steps_per_epoch: int) -> optax.Schedule:
    """SWA lr composition (main_train.py:113-115, engine.py:151-159):
    the exact per-epoch sequence is precomputed host-side
    (:func:`_simulate_reference_swa_lrs`) and indexed by epoch — the
    torch recurrence has no closed form once SWALR and a recursive base
    scheduler interleave."""
    if not cfg.swa_start:
        return inner
    table = jnp.asarray(_simulate_reference_swa_lrs(cfg))

    def schedule(step):
        epoch = jnp.clip(_epoch_of(step, steps_per_epoch), 0,
                         table.shape[0] - 1)
        return table[epoch]

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
