"""Host decode micro-benchmark (VERDICT r3 #8).

Breaks the CLI's per-case host cost into its passes on THIS host:

  * gunzip floor: zlib inflate of the 4 modality files (python, 1 core)
  * native:       bt_load_case (C++ inflate + bbox + crop + z-score)
  * numpy:        read_nifti ×4 + crop_foreground + normalize_intensity

over synthetic BraTS-sized cases in both on-disk dtypes (fp32 = worst
case, int16 = real BraTS). Prints one JSON line per dtype.

    PYTHONPATH=/root/repo python scripts/bench_decode.py [--shape 240,240,155]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# warm-page allocator tuning: without it this VM refaults ~150 MB/case at
# ~11 MB/s and every number is garbage (CLAUDE.md)
from brats21_tpu.utils.profiling import tune_host_allocator  # noqa: E402

MODS = ("t1", "t1ce", "t2", "flair")


def make_files(root: str, shape, dtype) -> list:
    from brats21_tpu.data.nifti import write_nifti
    from brats21_tpu.data.synthetic import make_case
    img, _ = make_case(shape, seed=0)
    paths = []
    for c, m in enumerate(MODS):
        p = os.path.join(root, f"BraTS2021_00000_{m}.nii.gz")
        vol = img[..., c]
        if dtype == np.int16:
            vol = np.round(vol * 100).astype(np.int16)
        write_nifti(p, vol.astype(dtype))
        paths.append(p)
    return paths


def timed(fn, n=5):
    vals = []
    fn()  # warm (page faults, lazy build)
    for _ in range(n):
        t0 = time.time()
        fn()
        vals.append(time.time() - t0)
    return float(np.median(vals))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="240,240,155")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))
    tune_host_allocator()

    from brats21_tpu.data import native
    from brats21_tpu.data import transforms as T
    from brats21_tpu.data.nifti import read_nifti

    assert native.ensure_built(), "native lib must build for this benchmark"

    for dtype, name in ((np.float32, "fp32"), (np.int16, "int16")):
        with tempfile.TemporaryDirectory() as root:
            paths = make_files(root, shape, dtype)
            gz_bytes = sum(os.path.getsize(p) for p in paths)

            def gunzip_only():
                for p in paths:
                    with gzip.open(p, "rb") as f:
                        f.read()

            def native_load():
                os.environ.pop("BRATS21_DECODE_V1", None)
                out = native.load_case_native(paths)
                assert out is not None, "native load failed"

            def native_v1_load():
                os.environ["BRATS21_DECODE_V1"] = "1"
                try:
                    out = native.load_case_native(paths)
                    assert out is not None, "native v1 load failed"
                finally:
                    os.environ.pop("BRATS21_DECODE_V1", None)

            def numpy_load():
                img = np.stack([read_nifti(p).data.astype(np.float32)
                                for p in paths], axis=-1)
                cropped, _, _, _ = T.crop_foreground(img)
                T.normalize_intensity(cropped, nonzero=True,
                                      channel_wise=True)

            row = {
                "metric": "host_decode_per_case",
                "dtype": name,
                "shape": list(shape),
                "gz_mb": round(gz_bytes / 1e6, 1),
                "gunzip_s": round(timed(gunzip_only, args.reps), 3),
                "native_fused_s": round(timed(native_load, args.reps), 3),
                "native_v1_s": round(timed(native_v1_load, args.reps), 3),
                "numpy_s": round(timed(numpy_load, args.reps), 3),
            }
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
