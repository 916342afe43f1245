"""TPU microbenchmark: Pallas im2col 3x3x3 conv vs the XLA lowering at the
flagship's (EquiUnetASSPEvo w48) per-level shapes.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_conv_kernel.py

Timing note: jax.block_until_ready does NOT synchronize through the axon
relay — every timing below is forced by a scalar D2H (CLAUDE.md).
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

from brats21_tpu.ops.pallas.conv3d_kernel import _conv3x3x3_pallas, _conv3x3x3_xla

# flagship levels: full volume 200x200x136 cropped case, w48
SHAPES = [
    ("L0 200x200x136 c48", (1, 200, 200, 136, 48), 48),
    ("L1 100x100x68 c96", (1, 100, 100, 68, 96), 96),
    ("L2 50x50x34 c192", (1, 50, 50, 34, 192), 192),
    ("L3 25x25x17 c384", (1, 25, 25, 17, 384), 384),
    ("T0 128x128x128 c48", (1, 128, 128, 128, 48), 48),  # train-patch L0
    ("T1 64x64x64 c96", (1, 64, 64, 64, 96), 96),
]

REPS = int(os.environ.get("REPS", "20"))
ONLY = os.environ.get("ONLY", "")  # substring filter on shape names
if ONLY:
    SHAPES = [s for s in SHAPES if ONLY in s[0]]
PEAK = 197e12  # TPU v5e bf16 peak FLOP/s


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, x, w, b, label):
    y = fn(x, w, b)
    sync(y)  # compile + warm
    t0 = time.time()
    acc = 0.0
    for _ in range(REPS):
        y = fn(x, w, b)
    acc += sync(y)
    # one sync at the end: REPS dispatches queue on-device; per-iter D2H
    # would measure the tunnel. Conservative: also time with per-iter sync.
    dt_q = (time.time() - t0) / REPS
    t0 = time.time()
    for _ in range(3):
        sync(fn(x, w, b))
    dt_s = (time.time() - t0) / 3
    print(f"  {label}: queued {dt_q*1e3:8.2f} ms  synced {dt_s*1e3:8.2f} ms",
          flush=True)
    return dt_q


def main():
    print(f"devices={jax.devices()}", flush=True)
    jit_pallas = jax.jit(_conv3x3x3_pallas)
    jit_xla = jax.jit(_conv3x3x3_xla)
    key = jax.random.PRNGKey(0)
    for name, shape, cout in SHAPES:
        cin = shape[-1]
        x = jax.random.normal(key, shape, jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32)
             * 0.05).astype(jnp.bfloat16)
        b = jnp.zeros((cout,), jnp.float32)
        vox = shape[1] * shape[2] * shape[3]
        flops = 2 * vox * 27 * cin * cout
        print(f"{name}  ({flops/1e9:.1f} GFLOP)", flush=True)
        try:
            tx = bench(jit_xla, x, w, b, "xla   ")
            print(f"    xla    util: {flops/tx/PEAK*100:5.1f}% of v5e "
                  f"bf16 peak", flush=True)
        except Exception as e:
            print(f"  xla FAILED: {type(e).__name__}: {e}", flush=True)
            tx = None
        try:
            tp = bench(jit_pallas, x, w, b, "pallas")
            print(f"    pallas util: {flops/tp/PEAK*100:5.1f}% of v5e "
                  f"bf16 peak", flush=True)
            if tx:
                print(f"    speedup: {tx/tp:.2f}x", flush=True)
        except Exception as e:
            print(f"  pallas FAILED: {type(e).__name__}: {e}", flush=True)
        # parity spot check (bf16 tolerance)
        try:
            ya = np.asarray(jit_xla(x, w, b), np.float32)
            yp = np.asarray(jit_pallas(x, w, b), np.float32)
            err = np.max(np.abs(ya - yp)) / (np.max(np.abs(ya)) + 1e-9)
            print(f"    rel err: {err:.2e}", flush=True)
        except Exception as e:
            print(f"  parity FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
