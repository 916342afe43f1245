"""Data layer tests: NIfTI roundtrip, discovery, codecs, transforms, loaders."""

import numpy as np
import pytest

from brats21_tpu.config import TrainConfig
from brats21_tpu.data import nifti, transforms as T
from brats21_tpu.data.discovery import (create_database, kfold_split,
                                        make_file_records)
from brats21_tpu.data.pipeline import (BraTSDataset, EvalLoader, TrainLoader,
                                       make_train_val_loaders)


def test_nifti_roundtrip(tmp_path, rng):
    data = rng.random((7, 9, 11)).astype(np.float32)
    affine = np.diag([2.0, 2.0, 2.5, 1.0])
    affine[:3, 3] = [1, 2, 3]
    p = str(tmp_path / "x.nii.gz")
    nifti.write_nifti(p, data, affine)
    img = nifti.read_nifti(p)
    np.testing.assert_allclose(img.data, data)
    np.testing.assert_allclose(img.affine, affine)


def test_nifti_uint8_roundtrip(tmp_path):
    seg = np.random.default_rng(0).integers(0, 5, (5, 6, 7)).astype(np.uint8)
    p = str(tmp_path / "seg.nii")
    nifti.write_nifti(p, seg)
    np.testing.assert_array_equal(nifti.read_nifti(p).data, seg)


def test_nifti_big_endian_read(tmp_path):
    """Big-endian NIfTI-1 (e.g. written on SPARC-era scanners): the reader
    must detect byte order from sizeof_hdr and byteswap data + header
    fields (nifti.py:75-79)."""
    import struct

    data = np.arange(3 * 4 * 5, dtype=np.int16).reshape(3, 4, 5)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 3, 4, 5, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 4)              # int16
    struct.pack_into(">h", hdr, 72, 16)
    struct.pack_into(">8f", hdr, 76, 1.0, 1.5, 2.0, 2.5, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into(">f", hdr, 108, 352.0)
    struct.pack_into(">2f", hdr, 112, 1.0, 0.0)
    hdr[344:348] = b"n+1\x00"
    p = tmp_path / "be.nii"
    p.write_bytes(bytes(hdr) + b"\x00" * 4
                  + data.astype(">i2").tobytes(order="F"))
    img = nifti.read_nifti(str(p))
    np.testing.assert_array_equal(img.data, data)
    assert img.data.dtype == np.dtype("=i2")        # native order out
    np.testing.assert_allclose(img.spacing, (1.5, 2.0, 2.5))


def test_nifti_scl_slope_inter_scaling(tmp_path):
    """scl_slope/scl_inter (nifti.py:103-105): stored int16 values are
    rescaled to float — the same contract nibabel's get_fdata applies."""
    import struct

    stored = np.array([[[0, 10], [20, 30]]], dtype=np.int16)
    p = str(tmp_path / "scl.nii")
    nifti.write_nifti(p, stored)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<2f", raw, 112, 2.5, -1.0)    # slope 2.5, inter -1
    open(p, "wb").write(bytes(raw))
    img = nifti.read_nifti(p)
    np.testing.assert_allclose(img.data, stored.astype(np.float32) * 2.5 - 1.0)


def test_nifti_gzip_sniff_without_extension(tmp_path):
    """A gzipped file with a bare .nii name still reads (magic sniffing,
    nifti.py:59-64) — some BraTS mirrors misname files."""
    import shutil

    data = np.random.default_rng(1).random((4, 5, 6)).astype(np.float32)
    gz = tmp_path / "x.nii.gz"
    nifti.write_nifti(str(gz), data)
    misnamed = tmp_path / "misnamed.nii"
    shutil.move(str(gz), str(misnamed))
    np.testing.assert_allclose(nifti.read_nifti(str(misnamed)).data, data)


def test_nifti_4d_roundtrip(tmp_path):
    data = np.random.default_rng(2).random((3, 4, 5, 2)).astype(np.float32)
    p = str(tmp_path / "t.nii.gz")
    nifti.write_nifti(p, data)
    np.testing.assert_allclose(nifti.read_nifti(p).data, data)


def test_nifti_header_extension_vox_offset(tmp_path):
    """Files with header extensions place data past 352; the reader must
    honor vox_offset (nifti.py:90,100-101), not assume 352."""
    import struct

    data = np.random.default_rng(3).random((2, 3, 4)).astype(np.float32)
    p = str(tmp_path / "ext.nii")
    nifti.write_nifti(p, data)
    raw = bytearray(open(p, "rb").read())
    ext = bytes([1, 0, 0, 0]) + struct.pack("<2i", 16, 4) + b"cmnt" + b"\x00" * 4
    # extension flag + one 16-byte extension between header and data
    body = raw[352:]
    struct.pack_into("<f", raw, 108, 352.0 + 16)
    open(p, "wb").write(bytes(raw[:348]) + ext + body)
    np.testing.assert_allclose(nifti.read_nifti(p).data, data)


def test_nifti_write_noncontiguous_view(tmp_path):
    """Flipped / transposed views (TTA de-augmentation output) must write
    correctly — tobytes(order='F') serializes any layout."""
    base = np.random.default_rng(4).random((5, 6, 7)).astype(np.float32)
    view = base[::-1, :, ::-2].transpose(1, 0, 2)
    assert not view.flags["C_CONTIGUOUS"] and not view.flags["F_CONTIGUOUS"]
    p = str(tmp_path / "v.nii.gz")
    nifti.write_nifti(p, view)
    np.testing.assert_allclose(nifti.read_nifti(p).data, view)


def test_discovery(synthetic_case):
    db = create_database(synthetic_case,
                         required_modality=["t1", "t1ce", "flair", "t2", "seg"])
    assert len(db) == 5
    first = next(iter(db.values()))
    assert list(first.keys()) == ["t1", "t1ce", "flair", "t2", "seg"]
    recs = make_file_records(db, with_seg=True)
    assert len(recs[0]["img"]) == 4 and "seg" in recs[0]


def test_kfold_matches_sklearn():
    ids = [f"p{i}" for i in range(10)]
    tr, va = kfold_split(ids, fold=0, seed=123)
    assert len(tr) == 8 and len(va) == 2
    assert set(tr) | set(va) == set(ids)
    # deterministic
    tr2, va2 = kfold_split(ids, fold=0, seed=123)
    assert tr == tr2 and va == va2


def test_label_codec_roundtrip():
    seg = np.zeros((8, 8, 8), np.float32)
    seg[1:4, 1:4, 1:4] = 2
    seg[2:3, 2:3, 2:3] = 1
    seg[2, 2, 2] = 4
    mc = T.brats_labels_to_multichannel(seg)
    assert mc.shape == (8, 8, 8, 3)
    labels = T.change_label_3_to_4(T.multichannel_to_brats_labels(mc))
    np.testing.assert_array_equal(labels, seg)


def test_normalize_intensity_nonzero():
    img = np.zeros((6, 6, 6, 2), np.float32)
    img[1:5, 1:5, 1:5, :] = np.random.default_rng(0).random((4, 4, 4, 2)) + 1
    out = T.normalize_intensity(img)
    mask = img[..., 0] != 0
    assert abs(out[..., 0][mask].mean()) < 1e-5
    assert abs(out[..., 0][mask].std() - 1) < 1e-4
    assert (out[~mask] == 0).all()


def test_normalize_remove_outliers():
    img = np.random.default_rng(0).normal(5, 2, (8, 8, 8, 1)).astype(np.float32)
    img[0, 0, 0, 0] = 1000.0
    out = T.normalize_intensity(img, remove_outliers=True)
    assert out.max() <= 3.0 and out.min() >= -3.0


def test_crop_foreground_and_pad_back():
    img = np.zeros((10, 12, 14, 4), np.float32)
    img[2:7, 3:9, 4:11, :] = 1.0
    cropped, _, start, end = T.crop_foreground(img)
    assert cropped.shape == (5, 6, 7, 4)
    np.testing.assert_array_equal(start, [2, 3, 4])
    np.testing.assert_array_equal(end, [7, 9, 11])
    out = T.pad_back_to_shape_before_compose(
        np.ones((5, 6, 7)), start, end, (10, 12, 14))
    assert out.shape == (10, 12, 14)
    assert out.sum() == 5 * 6 * 7


def test_shape_to_divisible_roundtrip(rng):
    x = rng.random((13, 17, 9, 3)).astype(np.float32)
    padded, p_b, p_a = T.shape_to_divisible(x, k=8)
    assert all(s % 8 == 0 for s in padded.shape[:3])
    back = T.shape_to_original(padded, p_b, p_a)
    np.testing.assert_array_equal(back, x)


def test_divisible_pad():
    x = np.ones((13, 16, 9, 1))
    assert T.divisible_pad(x, 8).shape == (16, 16, 16, 1)


def test_remove_background_voxels():
    img = np.zeros((4, 4, 4, 4), np.float32)
    img[1:3, 1:3, 1:3, 0] = 1
    pred = np.ones((4, 4, 4, 3), np.float32)
    out = T.remove_background_voxels(img, pred)
    assert out.sum() == 8 * 3


def test_train_loader_shapes(synthetic_case):
    cfg = TrainConfig(train_data_path=synthetic_case, fold=0, batch_size=2,
                      patch_size=[32, 32, 32], num_workers=2)
    train_loader, val_loader = make_train_val_loaders(cfg)
    batch = next(iter(train_loader))
    assert batch["img"].shape == (2, 32, 32, 32, 4)
    assert batch["seg"].shape == (2, 32, 32, 32, 3)
    assert set(batch["seg"].ravel().tolist()) <= {0.0, 1.0}
    vb = next(iter(val_loader))
    assert vb["img"].shape[0] == 1 and vb["img"].shape[-1] == 4


def test_train_loader_determinism(synthetic_case):
    cfg = TrainConfig(train_data_path=synthetic_case, fold=0, batch_size=1,
                      patch_size=[32, 32, 32], num_workers=1)
    loader, _ = make_train_val_loaders(cfg)
    loader.set_epoch(5)
    a = next(iter(loader))["img"]
    b = next(iter(loader))["img"]
    np.testing.assert_array_equal(a, b)
    loader.set_epoch(6)
    c = next(iter(loader))["img"]
    assert not np.array_equal(a, c)


def test_augmentations_preserve_shapes(rng):
    img = rng.random((16, 16, 16, 4)).astype(np.float32)
    seg = (rng.random((16, 16, 16, 3)) > 0.5).astype(np.float32)
    g = np.random.default_rng(0)
    (i2, s2) = T.rand_rotate90(g, 1.0, (0, 2), img, seg)
    assert i2.shape == img.shape and s2.shape == seg.shape
    (i3, s3) = T.rand_flip(g, 1.0, (0, 1, 2), img, seg)
    assert i3.shape == img.shape
    assert T.rand_adjust_contrast(g, 1.0, (0.5, 4.5), img).shape == img.shape
    assert T.rand_gaussian_smooth(g, 1.0, img).shape == img.shape


def test_convert_label():
    arr = np.array([[0, 1], [2, 4]], np.float32)
    out = T.convert_label(arr, [4, 1], [3, 7])
    np.testing.assert_array_equal(out, [[0, 7], [2, 3]])
    with pytest.raises(ValueError):
        T.convert_label(arr, [1], [2, 3])
