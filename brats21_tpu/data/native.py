"""ctypes binding for the native C++ data path (native/nifti_native.cc).

``load_case_native(paths)`` decodes + crops + normalizes a 4-modality case
entirely in C++ (threaded zlib inflate, single-pass stats); the pipeline
falls back to the numpy path when the shared library isn't built.

Build once with ``make -C native`` (or let :func:`ensure_built` do it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

from .. import get_logger

logger = get_logger("native")

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libbrats21_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def ensure_built(force: bool = False) -> bool:
    """Build the shared library if missing; returns availability."""
    if os.path.exists(_SO_PATH) and not force:
        return True
    if not os.path.isdir(_NATIVE_DIR):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True)
        return os.path.exists(_SO_PATH)
    except Exception as e:  # toolchain missing → numpy fallback
        logger.warning("native build failed: %s", e)
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_SO_PATH) and not ensure_built():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.bt_load_case.restype = ctypes.c_void_p
        lib.bt_load_case.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.bt_case_data.restype = ctypes.POINTER(ctypes.c_float)
        lib.bt_case_data.argtypes = [ctypes.c_void_p]
        lib.bt_case_shape.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.bt_case_bbox.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int64)]
        lib.bt_case_orig_shape.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_int64)]
        lib.bt_case_affine.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_double)]
        lib.bt_free_case.argtypes = [ctypes.c_void_p]
        lib.bt_last_error.restype = ctypes.c_char_p
        _lib = lib
    except OSError as e:
        logger.warning("cannot load native library: %s", e)
        _load_failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def load_case_native(paths: Sequence[str], crop: bool = True,
                     normalize: bool = True, remove_outliers: bool = False
                     ) -> Optional[Dict[str, np.ndarray]]:
    """Returns {img [X,Y,Z,C] fp32, foreground_start_coord,
    foreground_end_coord, original_shape, affine} or None when the native
    path is unavailable / errors."""
    lib = _get_lib()
    if lib is None:
        return None
    arr = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths])
    handle = lib.bt_load_case(arr, len(paths), int(crop), int(normalize),
                              int(remove_outliers))
    if not handle:
        logger.warning("native load failed: %s",
                       lib.bt_last_error().decode())
        return None
    try:
        shape = (ctypes.c_int64 * 4)()
        lib.bt_case_shape(handle, shape)
        n = int(np.prod(shape[:]))
        data_ptr = lib.bt_case_data(handle)
        img = np.ctypeslib.as_array(data_ptr, shape=(n,)).reshape(
            tuple(shape[:])).copy()
        bbox = (ctypes.c_int64 * 6)()
        lib.bt_case_bbox(handle, bbox)
        orig = (ctypes.c_int64 * 3)()
        lib.bt_case_orig_shape(handle, orig)
        aff = (ctypes.c_double * 16)()
        lib.bt_case_affine(handle, aff)
        return {
            "img": img,
            "foreground_start_coord": np.asarray(bbox[:3], np.int64),
            "foreground_end_coord": np.asarray(bbox[3:], np.int64),
            "original_shape": np.asarray(orig[:], np.int64),
            "affine": np.asarray(aff[:], np.float64).reshape(4, 4),
        }
    finally:
        lib.bt_free_case(handle)
