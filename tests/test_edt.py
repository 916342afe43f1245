"""EDT exactness vs scipy distance_transform_edt."""

import numpy as np
from scipy import ndimage

from brats21_tpu.ops import edt as jedt


def test_edt_matches_scipy_random(rng):
    mask = rng.random((17, 23, 9)) > 0.7
    got = np.asarray(jedt.edt(mask))
    want = ndimage.distance_transform_edt(mask)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_edt_2d_and_sampling(rng):
    mask = rng.random((31, 14)) > 0.5
    got = np.asarray(jedt.edt(mask, sampling=(2.0, 0.5)))
    want = ndimage.distance_transform_edt(mask, sampling=(2.0, 0.5))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_one_hot2dist_matches_reference_formula(rng):
    seg = (rng.random((2, 12, 12, 8)) > 0.6).astype(np.float32)
    got = np.asarray(jedt.one_hot2dist(seg))
    want = np.zeros_like(seg)
    for k in range(seg.shape[0]):
        pos = seg[k].astype(bool)
        if pos.any():
            neg = ~pos
            want[k] = (ndimage.distance_transform_edt(neg) * neg
                       - (ndimage.distance_transform_edt(pos) - 1) * pos)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_one_hot2hd_dist_empty_channel():
    seg = np.zeros((1, 8, 8, 8), np.float32)
    got = np.asarray(jedt.one_hot2hd_dist(seg))
    assert (got == 0).all()
