"""Mesh construction and sharding helpers.

The reference is single-GPU with no communication layer (SURVEY.md §2.10);
here every execution path is mesh-aware from the start:

* axis ``data``  — batch (data parallel; grads all-reduced by GSPMD over ICI)
* axis ``space`` — optional spatial sharding of the volume D-axis for
  full-volume inference with halo exchange (ops/spatial.py)

On a single chip everything degrades to a trivial 1×1 mesh; tests force 8
virtual CPU devices to exercise the collective paths.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, space: int = 1) -> Mesh:
    """Mesh of shape (data, space); ``data`` defaults to all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // space
    assert data * space <= n, f"mesh {data}x{space} > {n} devices"
    arr = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def local_mesh() -> Mesh:
    return make_mesh()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put every array in a batch dict with the batch sharding;
    non-arrays (ids, affines) pass through on host."""
    bs = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1 \
                and x.shape[0] % mesh.shape["data"] == 0:
            return jax.device_put(np.asarray(x), bs)
        return x

    return {k: put(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items()}
