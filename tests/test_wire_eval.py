"""The productized eval wire (round 3): --wire config flag, bit-packed D2H,
and the 2-in-flight transfer/compute pipeline in Engine.evaluate's serial
path. All modes must be output-identical — the wire only changes how bytes
cross the host link (ops/wire.py), never what they decode to."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats21_tpu.config import TrainConfig
from brats21_tpu.learning.engine import Engine, probe_wire_bandwidth
from brats21_tpu.learning.losses import make_criterion
from brats21_tpu.models import get_model
from brats21_tpu.ops import wire
from brats21_tpu.parallel.mesh import make_mesh


# --------------------------------------------------------------- wire codec

@pytest.mark.parametrize("shape", [(1, 8, 8, 8, 3), (1, 5, 7, 3, 3), (13,)])
def test_pack_bits_roundtrip(rng, shape):
    binary = (rng.random(shape) > 0.5).astype(np.float32)
    packed = np.asarray(wire.pack_bits_device(jnp.asarray(binary)))
    assert packed.dtype == np.uint8
    assert packed.nbytes <= -(-int(np.prod(shape)) // 8)
    got = wire.unpack_bits(packed, shape)
    np.testing.assert_array_equal(got, binary)


def test_pack_bits_matches_numpy_packbits(rng):
    """Big-endian bit order contract with np.packbits (host twin)."""
    binary = (rng.random((64,)) > 0.3).astype(np.uint8)
    packed = np.asarray(wire.pack_bits_device(jnp.asarray(binary)))
    np.testing.assert_array_equal(packed, np.packbits(binary))


# ------------------------------------------------------------- wire resolve

def _make_engine(cfg, model, mesh):
    return Engine(cfg, model, make_criterion(cfg), mesh=mesh)


def test_resolve_wire_precedence(monkeypatch):
    cfg = TrainConfig(model="equiunet", width=4, wire="sparse")
    model = get_model(cfg)
    mesh = make_mesh(jax.devices()[:1], data=1, space=1)

    # explicit config value
    assert _make_engine(cfg, model, mesh)._resolve_wire() == "sparse"
    cfg.wire = "dense"
    assert _make_engine(cfg, model, mesh)._resolve_wire() == "dense"

    # env override beats the config (back-compat with round-2 flag)
    monkeypatch.setenv("BRATS21_SPARSE_WIRE", "1")
    assert _make_engine(cfg, model, mesh)._resolve_wire() == "sparse"
    cfg.wire = "sparse"
    monkeypatch.setenv("BRATS21_SPARSE_WIRE", "0")
    assert _make_engine(cfg, model, mesh)._resolve_wire() == "dense"


def test_resolve_wire_auto_probes(monkeypatch):
    import brats21_tpu.learning.engine as eng
    cfg = TrainConfig(model="equiunet", width=4, wire="auto")
    model = get_model(cfg)
    mesh = make_mesh(jax.devices()[:1], data=1, space=1)
    monkeypatch.delenv("BRATS21_SPARSE_WIRE", raising=False)

    monkeypatch.setattr(eng, "probe_wire_bandwidth", lambda: 40.0)
    assert _make_engine(cfg, model, mesh)._resolve_wire() == "sparse"
    monkeypatch.setattr(eng, "probe_wire_bandwidth", lambda: 4000.0)
    assert _make_engine(cfg, model, mesh)._resolve_wire() == "dense"
    # threshold is env-tunable
    monkeypatch.setenv("BRATS21_WIRE_AUTO_MBPS", "8000")
    assert _make_engine(cfg, model, mesh)._resolve_wire() == "sparse"


def test_probe_wire_bandwidth_is_finite_and_cached():
    a = probe_wire_bandwidth()
    b = probe_wire_bandwidth()
    assert np.isfinite(a) and a > 0 and a == b


# ---------------------------------------------------- eval-mode equivalence

def _case_batches(rng, n=3):
    batches = []
    for i in range(n):
        img = rng.random((1, 16, 16, 8, 4)).astype(np.float32)
        img[:, : 3 + i] = 0.0                     # background region
        seg = (rng.random((1, 16, 16, 8, 3)) > 0.6).astype(np.float32)
        batches.append({
            "img": img, "seg": seg, "patient_id": [f"wc{i}"],
            "foreground_start_coord": np.array([[0, 0, 0]]),
            "foreground_end_coord": np.array([[16, 16, 8]]),
            "original_shape": np.array([[16, 16, 8]]),
            "affine": np.eye(4)[None],
        })
    return batches


class _Loader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


@pytest.fixture(scope="module")
def eval_setup(rng):
    cfg = TrainConfig(model="equiunet", width=4, criterion="dice",
                      no_amp=True)
    model = get_model(cfg)
    batches = _case_batches(rng)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batches[0]["img"]))
    return cfg, model, variables, batches


def _run_eval(eval_setup, tmp_path, tag, wire_mode, monkeypatch, depth=None,
              **eval_kw):
    cfg, model, variables, batches = eval_setup
    monkeypatch.delenv("BRATS21_SPARSE_WIRE", raising=False)
    if depth is not None:
        monkeypatch.setenv("BRATS21_EVAL_PIPELINE", str(depth))
    else:
        monkeypatch.delenv("BRATS21_EVAL_PIPELINE", raising=False)
    cfg.wire = wire_mode
    mesh = make_mesh(jax.devices()[:1], data=1, space=1)
    engine = _make_engine(cfg, model, mesh)
    out = str(tmp_path / tag)
    meters = engine.evaluate([{"params": variables["params"]}],
                             _Loader(batches), 0, save_seg=True,
                             output_path=out, **eval_kw)
    segs = _read_segs(out)
    return meters, segs


def _read_segs(out):
    # decompressed: gzip headers embed an mtime byte that differs per run
    import gzip
    return {f: gzip.decompress(open(os.path.join(out, f), "rb").read())
            for f in sorted(os.listdir(out))}


def _assert_same(res_a, res_b):
    m_a, segs_a = res_a
    m_b, segs_b = res_b
    assert m_a["loss"].avg == m_b["loss"].avg
    for k in m_a:
        if k in ("loss", "batch_time", "data_time"):
            continue
        np.testing.assert_array_equal(np.asarray(m_a[k].avg),
                                      np.asarray(m_b[k].avg))
    assert sorted(segs_a) == sorted(segs_b)
    for f in segs_a:
        assert segs_a[f] == segs_b[f], f"saved NIfTI differs: {f}"


def test_eval_wire_modes_identical(eval_setup, tmp_path, monkeypatch):
    """cfg.wire='sparse' (packed H2D + bit-packed D2H) is byte-identical
    to 'dense' through Engine.evaluate: meters AND saved NIfTIs."""
    dense = _run_eval(eval_setup, tmp_path, "dense", "dense", monkeypatch)
    sparse = _run_eval(eval_setup, tmp_path, "sparse", "sparse", monkeypatch)
    _assert_same(dense, sparse)


def test_eval_pipeline_depth_invariant(eval_setup, tmp_path, monkeypatch):
    """BRATS21_EVAL_PIPELINE=1 (fully synchronous, round-2 behavior) vs 3
    (deep pipeline) — identical outputs, only scheduling differs."""
    d1 = _run_eval(eval_setup, tmp_path, "d1", "sparse", monkeypatch,
                   depth=1)
    d3 = _run_eval(eval_setup, tmp_path, "d3", "sparse", monkeypatch,
                   depth=3)
    _assert_same(d1, d3)


def test_train_wire_parity(rng, monkeypatch):
    """The compact train wire (fp16 img under amp, uint8 one-hot targets)
    vs BRATS21_TRAIN_WIRE=fp32 through Engine.train_epoch: bit-identical
    under no_amp (wire is exact there), allclose under amp (fp16 keeps
    more mantissa than the bf16 the step casts to anyway)."""
    import jax.numpy as jnp
    import optax

    from brats21_tpu.learning.optimizers import make_optimizer
    from brats21_tpu.learning.train_state import create_train_state

    imgs = rng.random((3, 1, 16, 16, 16, 4)).astype(np.float32)
    segs = (rng.random((3, 1, 16, 16, 16, 3)) > 0.6).astype(np.float32)

    class _TrainLoader:
        def __len__(self):
            return 3

        def set_epoch(self, epoch):
            pass

        def __iter__(self):
            return iter({"img": im, "seg": sg} for im, sg in zip(imgs, segs))

    def run(wire_env, no_amp):
        if wire_env:
            monkeypatch.setenv("BRATS21_TRAIN_WIRE", wire_env)
        else:
            monkeypatch.delenv("BRATS21_TRAIN_WIRE", raising=False)
        cfg = TrainConfig(model="equiunet", width=4, criterion="dice",
                          optimizer="adam", no_amp=no_amp, epochs=1,
                          weight_decay=0.0)
        model = get_model(cfg)
        mesh = make_mesh(jax.devices()[:1], data=1, space=1)
        engine = Engine(cfg, model, make_criterion(cfg), mesh=mesh)
        tx = make_optimizer(cfg, steps_per_epoch=3)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.asarray(imgs[0]))
        state, _ = engine.train_epoch(state, _TrainLoader(), 1,
                                      jax.random.PRNGKey(1))
        return jax.tree_util.tree_map(np.asarray, state.params)

    for no_amp, exact in ((True, True), (False, False)):
        compact = run(None, no_amp)
        full = run("fp32", no_amp)
        for a, b in zip(jax.tree_util.tree_leaves(compact),
                        jax.tree_util.tree_leaves(full)):
            if exact:
                np.testing.assert_array_equal(a, b)
            else:
                # fp16 rounds at 2^-11 where bf16 rounds at 2^-8; the
                # double rounding flips rare ties, and adam's m/√v
                # normalization amplifies any input ulp to O(lr) within a
                # few steps — bounded-drift, not bitwise, is the contract
                np.testing.assert_allclose(a, b, atol=1e-3)


def test_eval_sparse_wire_staple_and_post(eval_setup, tmp_path, monkeypatch):
    """The seal/pack path composes with STAPLE fusion and the CC-cleanup
    post chain (both produce binary multichannel output)."""
    cfg, model, variables, batches = eval_setup
    members = [{"params": variables["params"]}] * 2
    kw = dict(perform_staple=True,
              post_kwargs={"cleaning_areas": True,
                           "cleaning_areas_threshold": 2})

    def run(mode):
        monkeypatch.delenv("BRATS21_SPARSE_WIRE", raising=False)
        cfg.wire = mode
        mesh = make_mesh(jax.devices()[:1], data=1, space=1)
        engine = _make_engine(cfg, model, mesh)
        out = str(tmp_path / f"staple_{mode}")
        meters = engine.evaluate(members, _Loader(batches), 0,
                                 save_seg=True, output_path=out, **kw)
        return meters, _read_segs(out)

    _assert_same(run("dense"), run("sparse"))


def test_eval_bucket_flag(eval_setup, tmp_path, monkeypatch):
    """--eval_bucket N (config.eval_bucket): volumes pad to multiples of N
    so a heterogeneous dataset compiles one executable per bucket instead
    of per shape. The extra zero pad enters the model's normalization
    stats exactly like the reference's own ÷8 pad, so metrics agree
    closely (not bitwise); saved segmentations still come back at the
    ORIGINAL case shape."""
    cfg = eval_setup[0]
    base = _run_eval(eval_setup, tmp_path, "b8", "dense", monkeypatch)
    cfg.eval_bucket = 16
    try:
        coarse = _run_eval(eval_setup, tmp_path, "b16", "dense", monkeypatch)
    finally:
        cfg.eval_bucket = 8
    assert sorted(base[1]) == sorted(coarse[1])
    # same original-shape geometry after pad-back. NOTE on looseness: a
    # RANDOM-weights model's sigmoid outputs sit near the 0.5 threshold,
    # so the bucket's norm-stat perturbation flips many voxels (measured
    # ~40% here) — on trained models the drift is border-only. The exact
    # mechanics (pad shape, crop-back alignment) are pinned separately in
    # test_eval_bucket_pad_mechanics_exact.
    from brats21_tpu.data.nifti import read_nifti
    for f in sorted(os.listdir(str(tmp_path / "b16"))):
        a = read_nifti(os.path.join(str(tmp_path / "b16"), f)).data
        b = read_nifti(os.path.join(str(tmp_path / "b8"), f)).data
        assert a.shape == (16, 16, 8)
        assert float((a == b).mean()) >= 0.5
    for k in base[0]:
        if k in ("loss", "batch_time", "data_time"):
            continue
        atol = 20.0 if "distance" in k else 0.3
        np.testing.assert_allclose(np.asarray(coarse[0][k].avg),
                                   np.asarray(base[0][k].avg), atol=atol,
                                   err_msg=k)


def test_eval_bucket_pad_mechanics_exact(rng):
    """The bucket's pad/crop-back mechanics are EXACT: _pad_case to any
    bucket puts the original volume at offset p_b untouched, and
    shape_to_original(p_b, p_a) recovers precisely the original region —
    a padding-offset bug shifts this and fails bitwise."""
    from brats21_tpu.data import transforms as T

    cfg = TrainConfig(model="equiunet", width=4)
    model = get_model(cfg)
    mesh = make_mesh(jax.devices()[:1], data=1, space=1)
    engine = _make_engine(cfg, model, mesh)
    img = rng.random((15, 13, 9, 4)).astype(np.float32)
    for bucket in (8, 16, 32):
        padded, p_b, p_a = engine._pad_case(img, use_tta=False,
                                            bucket=bucket)
        assert all(s % bucket == 0 for s in padded.shape[:3])
        # the original volume sits untouched at offset p_b
        np.testing.assert_array_equal(
            padded[p_b[0]:p_b[0] + 15, p_b[1]:p_b[1] + 13,
                   p_b[2]:p_b[2] + 9], img)
        # and crop-back recovers it bitwise
        np.testing.assert_array_equal(
            T.shape_to_original(padded, p_b, p_a), img)


def test_eval_bucket_env_overrides_config(eval_setup, tmp_path, monkeypatch):
    cfg = eval_setup[0]
    cfg.eval_bucket = 16
    monkeypatch.setenv("BRATS21_EVAL_BUCKET", "8")
    try:
        forced = _run_eval(eval_setup, tmp_path, "benv", "dense", monkeypatch)
        monkeypatch.delenv("BRATS21_EVAL_BUCKET")
        cfg.eval_bucket = 8
        base = _run_eval(eval_setup, tmp_path, "bbase", "dense", monkeypatch)
    finally:
        cfg.eval_bucket = 8
    _assert_same(forced, base)


def test_eval_bucket_validation():
    with pytest.raises(ValueError):
        TrainConfig(model="equiunet", eval_bucket=12).validate()
    with pytest.raises(ValueError):
        TrainConfig(model="equiunet", eval_bucket=4).validate()
    TrainConfig(model="equiunet", eval_bucket=64).validate()


def test_eval_stages_inline_equivalent(eval_setup, tmp_path, monkeypatch):
    """BRATS21_EVAL_STAGES=0 (thread-free prep/finish, debugging mode) is
    output-identical to the staged default: meters AND saved NIfTIs."""
    monkeypatch.delenv("BRATS21_EVAL_STAGES", raising=False)
    staged = _run_eval(eval_setup, tmp_path, "staged", "sparse", monkeypatch)
    monkeypatch.setenv("BRATS21_EVAL_STAGES", "0")
    inline = _run_eval(eval_setup, tmp_path, "inline", "sparse", monkeypatch)
    _assert_same(staged, inline)
