"""Pallas TPU kernels for the hot ops: EDT min-plus envelope, fused
EvoNorm-S0 apply. Each has an XLA fallback; selection via
``brats21_tpu.ops.pallas.enabled()``."""

from __future__ import annotations

import os

import jax


def enabled() -> bool:
    """Use Pallas kernels when running on TPU (or when forced for tests via
    BRATS21_PALLAS=interpret)."""
    mode = os.environ.get("BRATS21_PALLAS", "auto")
    if mode == "0":
        return False
    if mode == "interpret":
        return True
    return jax.default_backend() not in ("cpu",)


def interpret_mode() -> bool:
    return os.environ.get("BRATS21_PALLAS", "auto") == "interpret"
