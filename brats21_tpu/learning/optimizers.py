"""Optimizer factory — definer.py:291-380 dispatch on optax.

Gradient clipping options from the training args (arguments_train.py:94-97,
engine.py:442-452) compose as optax chain prefixes; gradient accumulation
(engine.py:119-130) wraps the whole chain in ``optax.MultiSteps``.
"""

from __future__ import annotations

from typing import Any

import optax

from .ranger import adaptive_grad_clip, ranger, ranger21
from .schedules import make_lr_schedule


def make_optimizer(cfg: Any, steps_per_epoch: int) -> optax.GradientTransformation:
    """Build the full update chain: [clipping] → optimizer(lr schedule)
    [→ MultiSteps]."""
    lr = make_lr_schedule(cfg, steps_per_epoch)
    wd = float(cfg.weight_decay)
    name = cfg.optimizer

    if name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(lr, momentum=0.9))
    elif name == "adam":
        # torch Adam applies weight decay as L2 into the gradient
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))
    elif name == "adamw":
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    elif name == "ranger":
        tx = ranger(lr, alpha=0.5, k=6, n_sma_threshold=5, b1=0.95, b2=0.999,
                    eps=1e-5, weight_decay=wd, use_gc=cfg.use_gc,
                    use_gcnorm=cfg.use_gcnorm, normloss=cfg.normloss,
                    normloss_factor=cfg.normloss_factor,
                    gc_conv_only=cfg.gc_conv_only)
    elif name == "ranger21":
        # reference overrides the ranger21 default with args.weight_decay
        # unconditionally (definer.py:377-379)
        tx = ranger21(lr, weight_decay=wd, use_gc=cfg.use_gc,
                      gc_conv_only=cfg.gc_conv_only, normloss=cfg.normloss,
                      normloss_factor=cfg.normloss_factor)
    elif name == "novograd":
        tx = optax.novograd(lr, b1=0.9, b2=0.98, eps=1e-8, weight_decay=wd)
    else:
        raise NameError("Not Supported Optimizer")

    prefix = []
    if getattr(cfg, "adaptive_gradient_clipping", False):
        # AGC (lr_scheduler.py:133-241): clipping=1e-2, eps=1e-3; own
        # implementation — optax's raises on 5D conv kernels and uses the
        # opposite linear-layer unit axis (learning/ranger.py)
        prefix.append(adaptive_grad_clip(clipping=1e-2, eps=1e-3))
    elif getattr(cfg, "gradient_clipping", False):
        # torch clip_grad_norm_ over all params (engine.py:450-452)
        prefix.append(optax.clip_by_global_norm(float(cfg.max_grad_norm)))
    if prefix:
        tx = optax.chain(*prefix, tx)

    accum = getattr(cfg, "gradient_accumulation_iter", None)
    if accum:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum))
    return tx
