"""Prototype: Winograd F(2,3)^3 3D conv in pure XLA vs lax.conv on TPU.

F(2x2x2, 3x3x3): 4^3 input tiles (stride 2) -> per-point batched GEMM over
64 transform points -> 2^3 output tiles. 3.375x fewer MACs than direct;
the question is whether XLA's batched-GEMM util + transform traffic nets a
wall-clock win at the flagship's lane-starved widths.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/winograd_proto.py
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

# F(2,3) transforms (Lavin & Gray, "Fast Algorithms for CNNs", 2016)
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)

REPS = int(os.environ.get("REPS", "10"))


def winograd_conv3d(x, w, dtype=jnp.bfloat16):
    """x [B,D,H,W,C] (D,H,W even), w [3,3,3,C,K] -> SAME conv [B,D,H,W,K]."""
    b, d, h, ww, c = x.shape
    k = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    nd, nh, nw = d // 2, h // 2, ww // 2
    # overlapping 4^3 tiles, stride 2, via advanced-index gathers
    idx_d = (np.arange(nd) * 2)[:, None] + np.arange(4)[None, :]
    idx_h = (np.arange(nh) * 2)[:, None] + np.arange(4)[None, :]
    idx_w = (np.arange(nw) * 2)[:, None] + np.arange(4)[None, :]
    tiles = xp[:, idx_d]                        # [B, nd, 4, H+2, W+2, C]
    tiles = tiles[:, :, :, idx_h]               # [B, nd, 4, nh, 4, W+2, C]
    tiles = tiles[:, :, :, :, :, idx_w]         # [B, nd, 4, nh, 4, nw, 4, C]
    tiles = tiles.transpose(0, 1, 3, 5, 2, 4, 6, 7).astype(dtype)

    bt = jnp.asarray(BT, dtype)
    # input transform U = (BT (x) BT (x) BT) tiles, one axis at a time
    u = jnp.einsum("ai,...ijkc->...ajkc", bt, tiles)
    u = jnp.einsum("bj,...ajkc->...abkc", bt, u)
    u = jnp.einsum("ck,...abkd->...abcd", bt, u)
    nt = b * nd * nh * nw
    u = u.reshape(nt, 64, c).transpose(1, 0, 2)          # [64, NT, C]

    # weight transform V = (G (x) G (x) G) w -> [64, C, K]
    g = jnp.asarray(G, dtype)
    v = jnp.einsum("ai,ijkcz->ajkcz", g, w.astype(dtype))
    v = jnp.einsum("bj,ajkcz->abkcz", g, v)
    v = jnp.einsum("ck,abkdz->abcdz", g, v)
    v = v.reshape(64, c, k)

    # the 64 pointwise GEMMs as one batched dot
    m = jnp.einsum("tnc,tck->tnk", u, v,
                   preferred_element_type=jnp.float32).astype(dtype)

    # output transform Y = (AT (x) AT (x) AT) M
    m = m.transpose(1, 0, 2).reshape(b, nd, nh, nw, 4, 4, 4, k)
    at = jnp.asarray(AT, dtype)
    y = jnp.einsum("ai,...ijkc->...ajkc", at, m)
    y = jnp.einsum("bj,...ajkc->...abkc", at, y)
    y = jnp.einsum("ck,...abkd->...abcd", at, y)
    return y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, ww, k)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


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
    for shape, cout in [((1, 200, 200, 136, 48), 48),
                        ((1, 128, 128, 128, 48), 48),
                        ((1, 100, 100, 68, 96), 96)]:
        cin = shape[-1]
        x = jax.random.normal(key, shape, jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32)
             * 0.05).astype(jnp.float32)
        print(f"{shape} -> {cout}", flush=True)
        jw = jax.jit(lambda a, b: winograd_conv3d(a, b))
        jx = jax.jit(xla_conv)
        try:
            tx = bench(jx, x, w, label="xla     ")
            tw = bench(jw, x, w, label="winograd")
            print(f"    speedup: {tx/tw:.2f}x", flush=True)
            ya = np.asarray(jx(x, w), np.float32)
            yw = np.asarray(jw(x, w), np.float32)
            denom = np.abs(ya).max() + 1e-9
            print(f"    rel err (bf16): {np.abs(ya-yw).max()/denom:.2e}",
                  flush=True)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
