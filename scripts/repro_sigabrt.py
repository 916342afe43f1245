"""SIGABRT stress repro (VERDICT r3 next-round #2).

Reproduces the in-suite crash mix on the 8-virtual-device CPU mesh in ONE
long-lived process, amplified far beyond what a suite run exercises:

  * STAGED eval (BRATS21_EVAL_STAGES=1: _IterStage + _SinkStage background
    threads) on a small model — the threads the crash correlated with;
  * member-striped shard_map STAPLE eval (the test that aborted:
    tests/test_parallel.py::test_engine_staple_member_striped_matches_serial);
  * case-parallel vmap eval groups;
  * ``jax.clear_caches()`` between "modules" (tests/conftest.py does this),
    which destroys live executables/thread pools while stage threads idle.

Run standalone (never needs the TPU):

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/repro_sigabrt.py --iters 40

faulthandler is armed for SIGABRT so a native abort leaves a Python-side
thread dump on stderr even when pytest-style capture would eat it.
"""

from __future__ import annotations

import argparse
import faulthandler
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# enable() installs handlers for SIGSEGV/SIGFPE/SIGABRT/SIGBUS/SIGILL —
# a native abort leaves a Python-side all-thread dump on stderr
faulthandler.enable(all_threads=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


class _Loader:
    def __init__(self, batches):
        self._b = batches

    def __len__(self):
        return len(self._b)

    def __iter__(self):
        return iter(self._b)


def make_batches(rng, n, shape=(16, 16, 8)):
    out = []
    for i in range(n):
        img = rng.random((1, *shape, 4)).astype(np.float32)
        img[:, :2] = 0.0
        seg = (rng.random((1, *shape, 3)) > 0.6).astype(np.float32)
        out.append({
            "img": img, "seg": seg, "patient_id": [f"r{i:02d}"],
            "foreground_start_coord": np.array([[0, 0, 0]]),
            "foreground_end_coord": np.array([[*shape]]),
            "original_shape": np.array([[*shape]]),
            "affine": np.eye(4)[None],
        })
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--clear_caches", type=int, default=1)
    ap.add_argument("--staged", type=int, default=1,
                    help="1: threaded prep/finish stages (product default)")
    args = ap.parse_args()

    os.environ["BRATS21_EVAL_STAGES"] = "1" if args.staged else "0"

    from brats21_tpu.config import TrainConfig
    from brats21_tpu.learning.engine import Engine
    from brats21_tpu.learning.losses import make_criterion
    from brats21_tpu.models import get_model
    from brats21_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    assert len(devs) >= 8, f"need 8 forced CPU devices, got {devs}"
    mesh = make_mesh(devs, data=8, space=1)
    rng = np.random.default_rng(0)

    cfg = TrainConfig(model="equiunet", width=4, criterion="dice",
                      no_amp=True)
    model = get_model(cfg)
    members = [{"params": model.init(jax.random.PRNGKey(s),
                                     jnp.zeros((1, 16, 16, 8, 4),
                                               jnp.float32))["params"]}
               for s in range(3)]
    batches = make_batches(rng, 9)
    post = dict(cleaning_areas=True, cleaning_areas_threshold=2)

    t0 = time.time()
    for it in range(args.iters):
        engine = Engine(cfg, model, make_criterion(cfg), mesh=mesh)
        # STAPLE member-striped shard_map eval (the aborting test's path)
        m = engine.evaluate(members, _Loader(batches[:3]), it,
                            perform_staple=True, post_kwargs=post)
        # case-parallel grouped eval (vmap over the mesh) with staged host
        engine2 = Engine(cfg, model, make_criterion(cfg), mesh=mesh)
        m2 = engine2.evaluate([members[0]], _Loader(batches), it,
                              post_kwargs=post)
        assert np.isfinite(m["loss"].avg) and np.isfinite(m2["loss"].avg)
        if args.clear_caches:
            jax.clear_caches()
        print(f"iter {it + 1}/{args.iters} ok "
              f"({time.time() - t0:.1f}s)", flush=True)
    print("PASS: no abort", flush=True)


if __name__ == "__main__":
    main()
