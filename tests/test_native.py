"""Native C++ loader vs the numpy reference path."""

import numpy as np
import pytest

from brats21_tpu.data import native
from brats21_tpu.data.discovery import create_database, make_file_records
from brats21_tpu.data.pipeline import BraTSDataset, load_case
from brats21_tpu.data.transforms import (crop_foreground, normalize_intensity)


pytestmark = pytest.mark.skipif(not native.ensure_built(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def records(synthetic_case):
    db = create_database(synthetic_case,
                        required_modality=["t1", "t1ce", "flair", "t2", "seg"])
    return make_file_records(db, with_seg=True)


def test_native_matches_numpy(records):
    rec = records[0]
    out = native.load_case_native(rec["img"], crop=True, normalize=True)
    assert out is not None
    img, _, _ = load_case(rec)
    cropped, _, start, end = crop_foreground(img)
    want = normalize_intensity(cropped, nonzero=True, channel_wise=True)
    np.testing.assert_array_equal(out["foreground_start_coord"], start)
    np.testing.assert_array_equal(out["foreground_end_coord"], end)
    np.testing.assert_allclose(out["img"], want, atol=2e-3)
    np.testing.assert_allclose(out["affine"], np.eye(4))


def test_native_remove_outliers(records):
    out = native.load_case_native(records[0]["img"], crop=True,
                                  normalize=True, remove_outliers=True)
    assert out["img"].max() <= 3.0 and out["img"].min() >= -3.0


def test_dataset_uses_native(records):
    ds = BraTSDataset(records, with_seg=True)
    sample = ds[0]
    assert sample["img"].dtype == np.float32
    assert sample["seg"].shape[:3] == sample["img"].shape[:3]
    # seg channels binary
    assert set(np.unique(sample["seg"])) <= {0.0, 1.0}


def test_native_nocrop(records):
    out = native.load_case_native(records[0]["img"], crop=False,
                                  normalize=False)
    assert tuple(out["original_shape"]) == out["img"].shape[:3]


def test_fused_decoder_matches_v1(records, monkeypatch):
    """Round 4: the fused single-pass decode (raw-body stats+bbox + tiled
    cast/normalize/transpose) must be voxel-identical to the round-2
    cast-everything-first implementation (BRATS21_DECODE_V1=1)."""
    rec = records[0]
    monkeypatch.delenv("BRATS21_DECODE_V1", raising=False)
    fused = native.load_case_native(rec["img"], crop=True, normalize=True,
                                    remove_outliers=True)
    monkeypatch.setenv("BRATS21_DECODE_V1", "1")
    v1 = native.load_case_native(rec["img"], crop=True, normalize=True,
                                 remove_outliers=True)
    assert fused is not None and v1 is not None
    np.testing.assert_array_equal(fused["foreground_start_coord"],
                                  v1["foreground_start_coord"])
    np.testing.assert_array_equal(fused["foreground_end_coord"],
                                  v1["foreground_end_coord"])
    # identical stats accumulation order -> bitwise-equal voxels
    np.testing.assert_array_equal(fused["img"], v1["img"])
