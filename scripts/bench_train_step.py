"""Data-inclusive train-step timing on the real accelerator (VERDICT r2 #3).

Measures three numbers for the flagship training config (EquiUnetASSPEvo,
patch 128³, ranger, bf16 activations, --remat_mode norm):

  1. device-resident step (batch already in HBM)  — the BENCHMARKS baseline
  2. step incl. H2D, fp32 wire, synchronous      — the reference's per-batch
     .cuda() pattern (engine.py:88-90)
  3. step incl. H2D through Engine.train_epoch   — the product path: fp16
     img + uint8 seg wire, H2D/compute double buffering

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py
Env:  BENCH_WIDTH (48), BENCH_PATCH (128), BENCH_STEPS (10), BENCH_CHUNKS (4)
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

WIDTH = int(os.environ.get("BENCH_WIDTH", "48"))
PATCH = int(os.environ.get("BENCH_PATCH", "128"))
N_STEPS = int(os.environ.get("BENCH_STEPS", "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


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

    cfg = TrainConfig(model="equiunet_assp_evo", width=WIDTH,
                      criterion="jaccard", optimizer="ranger",
                      patch_size=[PATCH] * 3, remat_mode="norm",
                      epochs=10, weight_decay=0.0)
    model = get_model(cfg)
    criterion = make_criterion(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=N_STEPS)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)

    shape = (1, PATCH, PATCH, PATCH, 4)
    # distinct host buffers per step so no transfer caching hides IO
    imgs = [np.clip(r.standard_normal(shape), -3, 3).astype(np.float32)
            for _ in range(N_STEPS)]
    segs = [(r.random((1, PATCH, PATCH, PATCH, 3)) > 0.7).astype(np.float32)
            for _ in range(N_STEPS)]
    wire_mb = (imgs[0].astype(np.float16).nbytes + segs[0].astype(np.uint8)
               .nbytes) / 1e6
    full_mb = (imgs[0].nbytes + segs[0].nbytes) / 1e6
    log(f"devices={jax.devices()} patch={PATCH} width={WIDTH} "
        f"wire={wire_mb:.1f}MB (fp32 {full_mb:.1f}MB)")

    engine = Engine(cfg, model, criterion, mesh=local_mesh())
    state = create_train_state(model, tx, rng, imgs[0])

    img_dev = jnp.asarray(imgs[0].astype(np.float16))
    seg_dev = jnp.asarray(segs[0])
    t0 = time.time()
    state, m = engine.train_step_fn(state, img_dev, seg_dev, rng)
    float(m["loss"])
    log(f"compile+first step: {time.time() - t0:.1f}s")

    class _Loader:
        def __len__(self):
            return N_STEPS

        def set_epoch(self, epoch):
            pass

        def __iter__(self):
            return iter({"img": im, "seg": sg}
                        for im, sg in zip(imgs, segs))

    cfg.log_train_interval = 10 ** 6

    def run_resident():
        nonlocal state
        t0 = time.time()
        for _ in range(N_STEPS):
            state, m = engine.train_step_fn(state, img_dev, seg_dev, rng)
            float(m["loss"])
        return (time.time() - t0) / N_STEPS * 1e3

    def run_sync_fp32():
        nonlocal state
        t0 = time.time()
        for i in range(N_STEPS):
            img_d = jnp.asarray(imgs[i])           # fp32 over the wire
            seg_d = jnp.asarray(segs[i])
            state, m = engine.train_step_fn(
                state, img_d.astype(jnp.float16), seg_d, rng)
            float(m["loss"])
        return (time.time() - t0) / N_STEPS * 1e3

    def run_epoch():
        nonlocal state
        t0 = time.time()
        state, _ = engine.train_epoch(state, _Loader(), 2, rng)
        return (time.time() - t0) / N_STEPS * 1e3

    # the relay bandwidth drifts several× over minutes — interleave the
    # three variants per chunk and take per-variant medians so they see
    # the same link conditions (same rationale as bench.py's
    # median-of-chunks)
    state, _ = engine.train_epoch(state, _Loader(), 1, rng)   # warm path
    chunks = {"resident": [], "sync_fp32": [], "pipelined": []}
    for ci in range(int(os.environ.get("BENCH_CHUNKS", "4"))):
        chunks["resident"].append(run_resident())
        chunks["sync_fp32"].append(run_sync_fp32())
        chunks["pipelined"].append(run_epoch())
        log(f"chunk {ci}: resident {chunks['resident'][-1]:.0f} | "
            f"sync_fp32 {chunks['sync_fp32'][-1]:.0f} | "
            f"pipelined {chunks['pipelined'][-1]:.0f} ms/step")

    dev_ms = float(np.median(chunks["resident"]))
    sync_ms = float(np.median(chunks["sync_fp32"]))
    epoch_ms = float(np.median(chunks["pipelined"]))
    print(json.dumps({
        "metric": f"train_step_w{WIDTH}_p{PATCH}",
        "device_resident_ms": round(dev_ms, 1),
        "sync_fp32_wire_ms": round(sync_ms, 1),
        "pipelined_compact_wire_ms": round(epoch_ms, 1),
        "wire_mb": round(wire_mb, 1),
        "overhead_vs_resident": round(epoch_ms / dev_ms, 3),
    }))


if __name__ == "__main__":
    main()
