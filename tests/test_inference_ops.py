"""Tests for TTA, sliding-window, post-processing, STAPLE ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats21_tpu.ops import postprocess as P
from brats21_tpu.ops import tta
from brats21_tpu.ops.sliding_window import (dense_patch_starts,
                                            gaussian_importance_map,
                                            get_scan_interval,
                                            sliding_window_inference)
from brats21_tpu.ops.staple import staple_binary, staple_multichannel


# ---------------------------------------------------------------- TTA

@pytest.mark.parametrize("combo", tta.COMBOS)
def test_tta_aug_deaug_inverse(rng, combo):
    axe, f, r = combo
    x = jnp.asarray(rng.random((1, 6, 6, 4, 2)), jnp.float32)
    y = tta.aug_flip_rot(tta.aug_axes(x, axe), f, r)
    back = tta.deaug_axes(tta.deaug_flip_rot(y, f, r), axe)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_tta_identity_model_mean(rng):
    # identity 'model': de-augmented mean of probs == sigmoid(x) exactly
    x = jnp.asarray(rng.random((1, 8, 8, 6, 3)), jnp.float32)
    probs, loss = tta.tta_mean_probs(lambda v: v, x)
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(jax.nn.sigmoid(x)), atol=1e-6)


def test_tta_equivariant_model(rng):
    # a per-voxel (1x1-conv-like) model commutes with all TTA transforms:
    # the 16-member mean must equal the single forward
    w = jnp.asarray(rng.random((3, 3)), jnp.float32)

    def model(v):
        return jnp.einsum("bxyzc,cd->bxyzd", v, w)

    x = jnp.asarray(rng.random((1, 6, 6, 4, 3)), jnp.float32)
    probs, _ = tta.tta_mean_probs(model, x)
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(jax.nn.sigmoid(model(x))), atol=1e-5)


def test_tta_combo_count_and_order():
    assert len(tta.COMBOS) == 16
    assert tta.COMBOS[0] == ("zxy", False, 0)    # identity first


def test_pad_to_square():
    x = jnp.ones((1, 10, 7, 5, 2))
    padded, pads = tta.pad_to_square_tta(x)
    assert padded.shape == (1, 10, 10, 5, 2)
    assert tta.crop_from_square_tta(padded, pads).shape == x.shape


# ------------------------------------------------------- sliding window

def test_scan_interval_matches_reference():
    assert get_scan_interval((256, 256, 160), (128, 128, 128)) == (96, 96, 96)
    assert get_scan_interval((128, 128, 128), (128, 128, 128)) == (128, 128, 128)


def test_dense_patch_starts_cover():
    starts = dense_patch_starts((64, 48, 32), (32, 32, 32), (24, 24, 32))
    assert starts.min() == 0
    assert (starts[:, 0].max() == 32 and starts[:, 1].max() == 16
            and starts[:, 2].max() == 0)


def test_gaussian_map_properties():
    m = gaussian_importance_map((16, 16, 16))
    assert m.shape == (16, 16, 16)
    assert m.max() == 1.0 and m.min() > 0
    assert m[8, 8, 8] >= m[0, 0, 0]


def test_sliding_window_identity_predictor(rng):
    # identity predictor → stitched output equals input exactly (any blend)
    x = jnp.asarray(rng.random((1, 40, 33, 27, 3)), jnp.float32)
    out = sliding_window_inference(x, (16, 16, 16), lambda v: v,
                                   sw_batch_size=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_sliding_window_matches_direct_conv(rng):
    # a conv-like local model: windows overlap enough that centre voxels
    # match a direct full-volume application
    k = jnp.asarray(rng.random((3, 3, 3, 2, 2)), jnp.float32)

    def model(v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    x = jnp.asarray(rng.random((1, 32, 32, 24, 2)), jnp.float32)
    direct = model(x)
    stitched = sliding_window_inference(x, (16, 16, 16), model, overlap=0.5,
                                        mode="gaussian")
    # interior agreement (window borders differ by conv halo)
    d = np.asarray(direct)[0, 4:-4, 4:-4, 4:-4]
    s = np.asarray(stitched)[0, 4:-4, 4:-4, 4:-4]
    np.testing.assert_allclose(s, d, atol=0.15)


def test_sliding_window_deep_supervision_head0(rng):
    x = jnp.asarray(rng.random((1, 20, 20, 20, 1)), jnp.float32)
    out = sliding_window_inference(x, (16, 16, 16),
                                   lambda v: (v * 2.0, [v * 5.0]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, atol=1e-4)


# ------------------------------------------------------- post-processing

def test_codec_roundtrip_device(rng):
    binary = (rng.random((4, 4, 4, 3)) > 0.5).astype(np.float32)
    # make channels consistent (WT ⊇ TC ⊇ ET)
    binary[..., 1] *= binary[..., 0]
    binary[..., 2] *= binary[..., 1]
    labels = P.change_label_3_to_4(P.multichannel_to_brats(jnp.asarray(binary)))
    back = P.brats_to_multichannel(labels)
    np.testing.assert_array_equal(np.asarray(back), binary)


def test_label_components_matches_scipy(rng):
    mask = rng.random((12, 12, 12)) > 0.7
    got = np.asarray(P.label_components(jnp.asarray(mask)))
    want = P.label_components_host(mask)
    # same partition: bijection between label sets
    assert (got != 0).sum() == (want != 0).sum()
    for lbl in np.unique(want)[1:]:
        comp = want == lbl
        assert len(np.unique(got[comp])) == 1
        assert not (got[comp][0] == got[~comp & (got != 0)]).any()


def test_filter_components_threshold():
    vol = np.zeros((16, 16, 16), np.float32)
    vol[1:3, 1:3, 1:3] = 4     # size 8
    vol[8:13, 8:13, 8:13] = 2  # size 125
    got = np.asarray(P.filter_components(jnp.asarray(vol), jnp.float32(20.0)))
    want = P.filter_components_host(vol, threshold=20)
    np.testing.assert_array_equal(got, want)
    assert got[2, 2, 2] == 0 and got[10, 10, 10] == 2


def test_replace_small_values_matches_host():
    vol = np.zeros((10, 10, 4), np.float32)
    vol[2:8, 2:8, :] = 2.0
    vol[4:6, 4:6, :] = 1.0
    vol[5, 5, 1] = 4.0  # single tiny ET voxel → replaced
    got = np.asarray(P.replace_small_values_axial(jnp.asarray(vol), 5.0))
    want = P.replace_small_values_axial_host(vol, 5.0)
    np.testing.assert_array_equal(got, want)
    assert got[5, 5, 1] != 4.0


def test_post_process_chain(rng):
    probs = jnp.asarray(rng.random((1, 12, 12, 8, 3)), jnp.float32) * 0.4
    out = P.post_process(probs, cleaning_areas=True, cleaning_areas_threshold=2,
                         replace_value=True, replace_value_threshold=3)
    assert out.shape == probs.shape
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


# ------------------------------------------------------------ STAPLE

def test_staple_unanimous():
    d = np.zeros((3, 8, 8, 8), np.float32)
    d[:, 2:5, 2:5, 2:5] = 1
    w = np.asarray(staple_binary(jnp.asarray(d)))
    assert (w[2:5, 2:5, 2:5] > 0.9).all()
    assert (w[6:, 6:, 6:] < 0.1).all()


def test_staple_majority_overrules_outlier():
    d = np.zeros((3, 6, 6, 6), np.float32)
    d[0, 1:4, 1:4, 1:4] = 1
    d[1, 1:4, 1:4, 1:4] = 1
    d[2] = 0  # outlier rater says nothing
    w = np.asarray(staple_binary(jnp.asarray(d)))
    assert (w[2, 2, 2] > 0.5)


def test_staple_multichannel_shape():
    members = jnp.asarray(
        (np.random.default_rng(0).random((4, 1, 6, 6, 6, 3)) > 0.5)
        .astype(np.float32))
    fused = staple_multichannel(members)
    assert fused.shape == (1, 6, 6, 6, 3)


# ------------------------------------------------------- device preprocess

def test_normalize_intensity_device_matches_host(rng):
    from brats21_tpu.ops.preprocess import normalize_intensity_device
    from brats21_tpu.data.transforms import normalize_intensity
    img = np.zeros((10, 10, 8, 4), np.float32)
    img[2:8, 2:8, 2:6, :] = np.round(
        rng.random((6, 6, 4, 4)) * 100 + 1).astype(np.float32)
    want = normalize_intensity(img, nonzero=True, channel_wise=True)
    got = np.asarray(normalize_intensity_device(jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # int16 input path (integer-valued data → identical result)
    got16 = np.asarray(normalize_intensity_device(
        jnp.asarray(img.astype(np.int16))))
    np.testing.assert_allclose(got16, want, atol=1e-4)


def test_normalize_intensity_device_outliers(rng):
    from brats21_tpu.ops.preprocess import normalize_intensity_device
    img = rng.normal(50, 10, (8, 8, 8, 1)).astype(np.float32)
    img[0, 0, 0, 0] = 5000.0
    out = np.asarray(normalize_intensity_device(jnp.asarray(img), True))
    assert out.max() <= 3.0 and out.min() >= -3.0


# -------------------------------------------------- composable TTA (API parity)

def test_tta_compose_matches_scan_path(rng):
    from brats21_tpu.ops.tta_compose import default_compose
    from brats21_tpu.ops.tta import tta_mean_probs
    x = jnp.asarray(rng.random((1, 8, 8, 6, 3)), jnp.float32)
    w = jnp.asarray(rng.random((3, 3)), jnp.float32)
    model = lambda v: jnp.einsum("bxyzc,cd->bxyzd", v, w)
    compose = default_compose()
    assert len(compose) == 16
    total = jnp.zeros_like(x)
    for tr in compose:
        out = model(tr.augment_image(x))
        total = total + jax.nn.sigmoid(tr.deaugment_mask(out))
    serial = total / 16
    fast, _ = tta_mean_probs(model, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(serial), atol=1e-5)


def test_tta_compose_inverse(rng):
    from brats21_tpu.ops import tta_compose as tc
    x = jnp.asarray(rng.random((1, 6, 6, 4, 2)), jnp.float32)
    compose = tc.Compose([tc.OnAxes(["zxy", "xyz"]), tc.VerticalFlip(),
                          tc.Rotate90([0, 90, 180, 270])])
    for tr in compose:
        back = tr.deaugment_mask(tr.augment_image(x))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_sparse_wire_roundtrip_exact(rng):
    """ops/wire: packed brain-mask volume reconstructs bit-exactly on
    device; 2-bit BraTS label packing round-trips."""
    import jax.numpy as jnp
    from brats21_tpu.ops import wire

    vol = (rng.integers(-500, 3000, size=(20, 24, 16, 4))
           .astype(np.int16))
    vol[rng.random(vol.shape[:3]) > 0.55] = 0   # background zeros
    bits, vals = wire.pack_volume(vol, cap_step=1024)
    assert vals.shape[0] <= vol.size // 4
    got = np.asarray(wire.unpack_volume_device(
        jnp.asarray(bits), jnp.asarray(vals), vol.shape[:3]))[0]
    np.testing.assert_array_equal(got, vol)

    labels = rng.choice(np.array([0, 1, 2, 4], np.uint8),
                        size=(20, 24, 16))
    packed = np.asarray(wire.pack_labels_device(jnp.asarray(labels)))
    assert packed.nbytes * 4 == labels.size
    np.testing.assert_array_equal(
        wire.unpack_labels(packed, labels.shape), labels)


@pytest.mark.parametrize("b", [1, 5, 8, 9, 12, 15])
def test_narrow_values_roundtrip_exact(rng, b):
    """ops/wire narrow bitstream: host pack → (host twin, device decode)
    both reconstruct every b-bit value exactly, including field layouts
    that straddle byte boundaries (b not a multiple of 8)."""
    import jax.numpy as jnp
    from brats21_tpu.ops import wire

    n, c = 137, 4                       # odd row count: stream padding hits
    vals = rng.integers(0, 1 << b, size=(n, c)).astype(np.int32)
    packed = wire.pack_values_narrow(vals, b)
    assert packed.nbytes == -(-n * c * b // 8)
    np.testing.assert_array_equal(
        wire.unpack_values_narrow(packed, n, c, b), vals)
    got = np.asarray(wire.unpack_values_narrow_device(
        jnp.asarray(packed), n, c, b, dtype=jnp.int32))
    np.testing.assert_array_equal(got, vals)


def test_narrow_volume_roundtrip_and_autowidth(rng):
    """pack_volume_narrow reconstructs the volume bit-exactly on device;
    narrow_bits_for picks the smallest lossless width and refuses
    negatives / floats / full-width data."""
    import jax.numpy as jnp
    from brats21_tpu.ops import wire

    vol = rng.integers(0, 1 << 11, size=(20, 24, 16, 4)).astype(np.int16)
    vol[rng.random(vol.shape[:3]) > 0.55] = 0
    b = wire.narrow_bits_for(vol)
    assert b == int(vol.max()).bit_length()
    bits, stream, cap = wire.pack_volume_narrow(vol, b, cap_step=1024)
    dense_bytes = vol.nbytes
    assert bits.nbytes + stream.nbytes < dense_bytes * 0.6
    got = np.asarray(wire.unpack_volume_narrow_device(
        jnp.asarray(bits), jnp.asarray(stream), vol.shape[:3],
        channels=4, cap=cap, bits_per_value=b))[0]
    np.testing.assert_array_equal(got, vol)

    assert wire.narrow_bits_for(np.array([-1, 4], np.int16)) == 0
    assert wire.narrow_bits_for(np.array([0.5], np.float16)) == 0
    assert wire.narrow_bits_for(np.array([1 << 15], np.int32)) == 0
    assert wire.narrow_bits_for(np.array([0], np.int16)) == 1
