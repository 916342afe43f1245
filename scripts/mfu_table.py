"""Model-level MFU table (VERDICT r2 #4): executed FLOPs (XLA
cost_analysis) ÷ measured wall time ÷ 197 TFLOP/s (v5e bf16 peak) for the
EquiUnetASSPEvo family at widths 48/64/128 — full-volume forward and the
128³ train step.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/mfu_table.py
Env:  MFU_WIDTHS (csv, default 48,64,128), MFU_ITERS (default 6)

Timing notes (docs/BENCHMARKS.md): only a D2H read forces execution
through the axon relay, so every iteration forces a scalar; the first
call pays the remote compile and is excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/brats21_jax_cache")

WIDTHS = [int(w) for w in os.environ.get("MFU_WIDTHS", "48,64,128").split(",")]
ITERS = int(os.environ.get("MFU_ITERS", "6"))
PEAK_TFLOPS = 197.0    # TPU v5e bf16


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def median_ms(fn, force):
    ts = []
    for _ in range(ITERS):
        t0 = time.time()
        force(fn())
        ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))


def flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    import jax
    import jax.numpy as jnp

    from brats21_tpu.config import TrainConfig
    from brats21_tpu.learning.engine import Engine
    from brats21_tpu.learning.losses import make_criterion
    from brats21_tpu.learning.optimizers import make_optimizer
    from brats21_tpu.learning.train_state import create_train_state
    from brats21_tpu.models import get_model
    from brats21_tpu.parallel.mesh import local_mesh
    from brats21_tpu.data.synthetic import make_case
    from brats21_tpu.data import transforms as T

    # the bench full-volume shape: synthetic 240×240×155 case, cropped
    # and ÷8-padded exactly like bench.py
    img, _ = make_case((240, 240, 155), seed=0)
    cropped, _, _, _ = T.crop_foreground(img)
    padded, _, _ = T.shape_to_divisible(
        T.normalize_intensity(cropped, nonzero=True, channel_wise=True), k=8)
    fwd_shape = padded.shape
    log(f"devices={jax.devices()} full-volume shape={fwd_shape}")

    r = np.random.default_rng(0)
    rows = []
    for width in WIDTHS:
        cfg = TrainConfig(model="equiunet_assp_evo", width=width,
                          criterion="jaccard", optimizer="ranger",
                          patch_size=[128] * 3, remat_mode="norm",
                          epochs=10, weight_decay=0.0)
        model = get_model(cfg)
        row = {"width": width}

        # ---- full-volume forward (bf16, deterministic)
        try:
            x = jnp.asarray(padded.astype(np.float16))[None]
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 16, 16, 16, 4),
                                             jnp.float32))

            def fwd(v, xx):
                out = model.apply(v, xx.astype(jnp.bfloat16),
                                  deterministic=True)
                main = out[0] if isinstance(out, tuple) else out
                if isinstance(main, (list, tuple)):
                    main = main[0]
                return jnp.sum(main.astype(jnp.float32))

            jfwd = jax.jit(fwd)
            lowered = jfwd.lower(variables, x)
            compiled = lowered.compile()
            fl = flops_of(compiled)
            t0 = time.time()
            float(jfwd(variables, x))
            log(f"w{width} fwd compile+first: {time.time() - t0:.1f}s "
                f"flops={fl:.3e}")
            ms = median_ms(lambda: jfwd(variables, x), float)
            row["fwd_ms"] = round(ms, 1)
            row["fwd_tflops"] = round(fl / 1e12, 2)
            row["fwd_mfu_pct"] = round(fl / (ms / 1e3) / (PEAK_TFLOPS * 1e12)
                                       * 100, 1)
            log(f"w{width} fwd: {ms:.1f} ms  MFU {row['fwd_mfu_pct']}%")
        except Exception as e:  # noqa: BLE001 — record OOMs honestly
            row["fwd_error"] = str(e)[:200]
            log(f"w{width} fwd FAILED: {e}")

        # ---- train step (patch 128³, remat norm, amp, ranger)
        try:
            engine = Engine(cfg, model, make_criterion(cfg),
                            mesh=local_mesh())
            tx = make_optimizer(cfg, steps_per_epoch=10)
            img_b = np.clip(r.standard_normal((1, 128, 128, 128, 4)), -3, 3
                            ).astype(np.float32)
            seg_b = (r.random((1, 128, 128, 128, 3)) > 0.7
                     ).astype(np.float32)
            state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                       img_b)
            img_d = jnp.asarray(img_b.astype(np.float16))
            seg_d = jnp.asarray(seg_b)
            rng = jax.random.PRNGKey(1)
            lowered = engine.train_step_fn.lower(state, img_d, seg_d, rng)
            fl = flops_of(lowered.compile())

            t0 = time.time()
            state, m = engine.train_step_fn(state, img_d, seg_d, rng)
            float(m["loss"])
            log(f"w{width} step compile+first: {time.time() - t0:.1f}s "
                f"flops={fl:.3e}")

            def one_step():
                nonlocal state
                state, m = engine.train_step_fn(state, img_d, seg_d, rng)
                return m["loss"]

            ms = median_ms(one_step, float)
            row["step_ms"] = round(ms, 1)
            row["step_tflops"] = round(fl / 1e12, 2)
            row["step_mfu_pct"] = round(
                fl / (ms / 1e3) / (PEAK_TFLOPS * 1e12) * 100, 1)
            log(f"w{width} step: {ms:.1f} ms  MFU {row['step_mfu_pct']}%")
        except Exception as e:  # noqa: BLE001
            row["step_error"] = str(e)[:200]
            log(f"w{width} step FAILED: {e}")
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"table": rows, "peak_tflops": PEAK_TFLOPS}))


if __name__ == "__main__":
    main()
