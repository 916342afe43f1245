"""Device-resident full-volume forward timing (no tunnel transfers in the
timed loop), flagship shapes. WIDTH env selects the model width.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_forward.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/brats21_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from brats21_tpu.config import TrainConfig
from brats21_tpu.models import get_model

REPS = int(os.environ.get("REPS", "10"))
WIDTH = int(os.environ.get("WIDTH", "48"))
SHAPE = tuple(int(s) for s in
              os.environ.get("SHAPE", "200,200,136").split(","))


def main():
    print(f"devices={jax.devices()} width={WIDTH} shape={SHAPE}", flush=True)
    cfg = TrainConfig(model="equiunet_assp_evo", width=WIDTH)
    model = get_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, *SHAPE, 4),
                          jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(v, inp):
        out = model.apply(v, inp, deterministic=True)
        out = out[0] if isinstance(out, tuple) else out
        if isinstance(out, (list, tuple)):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    float(fwd(variables, x))
    print(f"compile+1st: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(REPS):
        r = fwd(variables, x)
    float(r)
    dt = (time.time() - t0) / REPS
    print(f"forward: {dt*1e3:.1f} ms  ({60.0/dt:.1f} volumes/min "
          f"device-resident)", flush=True)


if __name__ == "__main__":
    main()
