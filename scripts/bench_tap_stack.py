"""TPU microbenchmark: tap-stacked 3x3x3 convs in PURE XLA.

Fifth attempt at the w48 MXU K-dim lane-fill floor (docs/BENCHMARKS.md
"MXU utilization"): XLA contracts K=C_in per MXU pass, so C=48 fills
48/128 lanes. The Pallas im2col (K=27*C_in) was defeated by Mosaic layout
rules; this experiment does the SAME K-inflation *inside XLA* by
materializing shifted copies of the input along one or more kernel axes
and shrinking the kernel window accordingly — every step is a legal XLA
op, no Pallas:

- z-stack : 3 z-shifted copies, C_in 48->144, kernel (3,3,1). K-fill
  144/(2*128)=56% vs 48/128=37.5% (ceil-division passes), ~1.5x ideal,
  at 3x input HBM materialization.
- zy-stack: 9 copies, C_in 432, kernel (3,1,1). K-fill 432/512=84%,
  ~2.25x ideal, at 9x input materialization.
- im2col  : 27 copies, C_in 1296, kernel (1,1,1) = the GEMM form.
  K-fill 1296/1408=92% at 27x input materialization.

Numerically identical to the direct conv (same MACs, same order up to
reassociation). Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_tap_stack.py
Measured result: see docs/BENCHMARKS.md ("tap-stacked" entry).
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

from brats21_tpu.ops.pallas.conv3d_kernel import _conv3x3x3_xla

REPS = int(os.environ.get("REPS", "20"))
PEAK = 197e12

SHAPES = [
    ("T0 128x128x128 c48", (1, 128, 128, 128, 48), 48),
    ("L0 200x200x136 c48", (1, 200, 200, 136, 48), 48),
]
ONLY = os.environ.get("ONLY", "")
if ONLY:
    SHAPES = [s for s in SHAPES if ONLY in s[0]]


def _shifted(x, axis, tap):
    """copy[i] = x[i + tap - 1] along ``axis`` with zero fill (= the SAME
    zero-pad the direct conv applies)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)
    start = [0] * x.ndim
    start[axis] = tap
    sizes = list(x.shape)
    return jax.lax.dynamic_slice(xp, start, sizes)


def conv_zstack(x, w, bias):
    """3 z-shifted copies stacked on C (t-major), kernel (3,3,1,3C,F)."""
    xs = jnp.concatenate([_shifted(x, 3, t) for t in range(3)], axis=-1)
    # w: (kx,ky,kz,c,f) -> channel index kz*C+c  == concat block order
    k = w.transpose(0, 1, 2, 3, 4).reshape(3, 3, 1, -1, w.shape[-1])
    y = jax.lax.conv_general_dilated(
        xs, k.astype(x.dtype), (1, 1, 1), [(1, 1), (1, 1), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + bias.astype(y.dtype)


def conv_zystack(x, w, bias):
    """9 (y,z)-shifted copies, kernel (3,1,1,9C,F)."""
    xs = jnp.concatenate(
        [_shifted(_shifted(x, 2, ty), 3, tz)
         for ty in range(3) for tz in range(3)], axis=-1)
    # channel index (ky*3+kz)*C+c: flatten (ky,kz,c) contiguously
    k = w.transpose(0, 1, 2, 3, 4).reshape(3, 1, 1, -1, w.shape[-1])
    y = jax.lax.conv_general_dilated(
        xs, k.astype(x.dtype), (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + bias.astype(y.dtype)


def conv_im2col(x, w, bias):
    """27 shifted copies, kernel (1,1,1,27C,F) — the pure-GEMM form."""
    xs = jnp.concatenate(
        [_shifted(_shifted(_shifted(x, 1, tx), 2, ty), 3, tz)
         for tx in range(3) for ty in range(3) for tz in range(3)], axis=-1)
    k = w.reshape(1, 1, 1, -1, w.shape[-1])
    y = jax.lax.conv_general_dilated(
        xs, k.astype(x.dtype), (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + bias.astype(y.dtype)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, x, w, b, label, flops):
    y = fn(x, w, b)
    sync(y)
    t0 = time.time()
    for _ in range(REPS):
        y = fn(x, w, b)
    sync(y)
    dt = (time.time() - t0) / REPS
    print(f"  {label}: {dt*1e3:8.2f} ms  ({flops/dt/PEAK*100:5.1f}% peak)",
          flush=True)
    return dt


def main():
    print(f"devices={jax.devices()}", flush=True)
    variants = [("xla3d ", jax.jit(_conv3x3x3_xla)),
                ("zstack", jax.jit(conv_zstack)),
                ("zystck", jax.jit(conv_zystack)),
                ("im2col", jax.jit(conv_im2col))]
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
        ref = None
        base = None
        for label, fn in variants:
            try:
                dt = bench(fn, x, w, b, label, flops)
                y = np.asarray(fn(x, w, b), np.float32)
                if ref is None:
                    ref, base = y, dt
                else:
                    err = np.max(np.abs(y - ref)) / (np.max(np.abs(ref)) + 1e-9)
                    print(f"           rel err {err:.2e}  "
                          f"speedup {base/dt:.2f}x", flush=True)
            except Exception as e:  # noqa: BLE001 — record and continue
                print(f"  {label} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
