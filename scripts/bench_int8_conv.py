"""Does an int8 conv beat bf16 on v5e at the flagship widths?

v5e's MXU does 394 int8 TOPS vs 197 bf16 TFLOPS. If XLA lowers
s8 x s8 -> s32 convs on the MXU, a post-training-quantized inference mode
could double conv throughput at unchanged lane fill.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int8_conv.py
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

REPS = int(os.environ.get("REPS", "10"))


def conv(x, w, out_dtype=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=out_dtype)


def sync(y):
    return float(jnp.sum(y.astype(jnp.float32)[::97, ::97]))


def bench(fn, *args, label):
    y = fn(*args)
    sync(y)
    t0 = time.time()
    for _ in range(REPS):
        y = fn(*args)
    sync(y)
    dt = (time.time() - t0) / REPS
    print(f"  {label}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    print(f"devices={jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    for shape, cout in [((1, 128, 128, 128, 48), 48),
                        ((1, 128, 128, 128, 64), 64)]:
        cin = shape[-1]
        print(f"{shape} -> {cout}", flush=True)
        xb = jax.random.normal(key, shape, jnp.bfloat16)
        wb = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32)
              * 0.05).astype(jnp.bfloat16)
        xi = jax.random.randint(key, shape, -127, 127, jnp.int8)
        wi = jax.random.randint(key, (3, 3, 3, cin, cout), -127, 127,
                                jnp.int8)
        try:
            tb = bench(jax.jit(lambda a, b: conv(a, b)), xb, wb,
                       label="bf16    ")
        except Exception as e:
            print(f"  bf16 FAILED: {str(e)[:200]}", flush=True)
            tb = None
        try:
            ti = bench(jax.jit(lambda a, b: conv(a, b, jnp.int32)), xi, wi,
                       label="int8->32")
            if tb:
                print(f"    int8 speedup: {tb/ti:.2f}x", flush=True)
        except Exception as e:
            print(f"  int8 FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
