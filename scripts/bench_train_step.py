"""TPU train-step decomposition: forward / grad / optimizer / full step,
per remat mode, at the BENCHMARKS.md config (equiunet_assp_evo w48, 128³
patch, Ranger+GC, bf16 activations, dice).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py

Every timing forced by scalar D2H (axon relay ignores block_until_ready).
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/brats21_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from brats21_tpu.config import TrainConfig
from brats21_tpu.learning.losses import make_criterion, deep_supervision_loss
from brats21_tpu.learning.optimizers import make_optimizer
from brats21_tpu.learning.train_state import create_train_state, make_train_step
from brats21_tpu.models import get_model

REPS = int(os.environ.get("REPS", "10"))
MODES = os.environ.get("MODES", "norm,block,none").split(",")
PATCH = int(os.environ.get("PATCH", "128"))
WIDTH = int(os.environ.get("WIDTH", "48"))


def timeit(fn, *args, label=""):
    t0 = time.time()
    out = fn(*args)
    first = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    print(f"  {label} compile+1st: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    dt = (time.time() - t0) / REPS
    print(f"  {label}: {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    print(f"devices={jax.devices()} patch={PATCH} width={WIDTH}", flush=True)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, PATCH, PATCH, PATCH, 4), jnp.float32)
    seg = (jax.random.uniform(rng, (1, PATCH, PATCH, PATCH, 3)) > 0.7
           ).astype(jnp.float32)

    for mode in MODES:
        print(f"== remat_mode={mode}", flush=True)
        cfg = TrainConfig(model="equiunet_assp_evo", width=WIDTH,
                          criterion="dice", optimizer="ranger", use_gc=True,
                          remat_mode=mode)
        model = get_model(cfg)
        criterion = make_criterion(cfg)
        tx = make_optimizer(cfg, steps_per_epoch=100)
        state = create_train_state(model, tx, rng,
                                   np.zeros((1, 16, 16, 16, 4), np.float32))
        step = make_train_step(criterion, use_amp=True)

        @jax.jit
        def fwd_loss(params, x, y):
            out = model.apply({"params": params},
                              x.astype(jnp.bfloat16), deterministic=True)
            return deep_supervision_loss(criterion, out, y)

        @jax.jit
        def grad_only(params, x, y):
            return jax.grad(fwd_loss)(params, x, y)

        @jax.jit
        def opt_only(state, grads):
            ups, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
            import optax
            return optax.apply_updates(state.params, ups), opt_state

        try:
            timeit(fwd_loss, state.params, img, seg, label="fwd+loss   ")
            g = grad_only(state.params, img, seg)
            timeit(grad_only, state.params, img, seg, label="fwd+bwd    ")
            timeit(opt_only, state, g, label="optimizer  ")
            timeit(lambda s=state: step(s, img, seg, rng)[0].params,
                   label="full step  ")
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
