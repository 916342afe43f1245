"""brats21_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for BraTS 2021
3D brain-tumor segmentation.

Capability-parity rebuild of the Alxaline/BraTS21 reference (PyTorch/CUDA),
re-designed TPU-first:

* models run channels-last (``[B, D, H, W, C]``) in bf16 on the MXU,
* the training step is a single jitted function (forward, deep-supervision
  loss, grad, Ranger update) sharded over a ``jax.sharding.Mesh``,
* inference fuses sliding-window + 16-way TTA + ensemble mean entirely
  on-device (no host round-trips, unlike reference engine.py:224-249),
* the host side (NIfTI IO, dataset discovery, reporting) stays numpy.

Reference logger setup: src/__init__.py:6-37.
"""

from __future__ import annotations

import logging
import sys

__version__ = "0.1.0"

_LOGGER_NAME = "brats21_tpu"


def get_logger_lvl(verbosity: int) -> int:
    """Map a ``-v`` count to a logging level (reference src/__init__.py:6-18)."""
    if verbosity >= 2:
        return logging.DEBUG
    if verbosity == 1:
        return logging.INFO
    return logging.WARNING


def set_main_logger(log_file: str | None = None, verbosity: int = 1) -> logging.Logger:
    """Configure the root framework logger: stdout + optional logfile
    (reference src/__init__.py:21-37)."""
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(get_logger_lvl(verbosity))
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def get_logger(name: str | None = None) -> logging.Logger:
    if name:
        return logging.getLogger(f"{_LOGGER_NAME}.{name}")
    return logging.getLogger(_LOGGER_NAME)
