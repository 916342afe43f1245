"""Composed-pipeline golden (round-1 VERDICT next-steps #3): synthetic case
→ preprocess → 16-way TTA ensemble forward → post-processing (cleaning +
replace) → background mask → Dice/HD95, with the framework side driven
end-to-end through Engine.evaluate, asserted against an INDEPENDENT
numpy/scipy/torch composition written in this file from the reference's
behavior (definer.py:448-493, 653-657, 671-698; engine.py:163-296;
transforms.py:169-268, 579-647).

The per-stage goldens elsewhere validate each op; this test validates the
*composition* — pad plumbing, TTA aug/deaug order, post-transform chaining,
masking, and metric conventions all at once.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from scipy import interpolate, ndimage

import test_full_model_parity as fmp
from brats21_tpu.config import TrainConfig
from brats21_tpu.data.synthetic import make_case
from brats21_tpu.learning.engine import Engine
from brats21_tpu.learning.losses import make_criterion
from brats21_tpu.models.assp_evo import EquiUnetASSPEvo
from brats21_tpu.parallel.mesh import make_mesh

F4 = fmp.F4
CLEAN_T = 5
REPLACE_T = 10


# ---------------------------------------------------------------------------
# independent golden composition (numpy / scipy / torch only)
# ---------------------------------------------------------------------------


def g_preprocess(img_raw):
    """crop-foreground → z-score(nonzero, channel-wise, ±3σ)."""
    mask = (img_raw != 0).any(axis=-1)
    coords = np.nonzero(mask)
    start = np.array([c.min() for c in coords])
    end = np.array([c.max() + 1 for c in coords])
    img = img_raw[tuple(slice(s, e) for s, e in zip(start, end))].astype(
        np.float64)
    out = img.copy()
    for c in range(img.shape[-1]):
        ch = img[..., c]
        m = ch != 0
        if m.any():
            mu, sd = ch[m].mean(), ch[m].std()
            ch = np.where(m, np.clip((ch - mu) / (sd if sd else 1.0),
                                     -3.0, 3.0), 0.0)
        out[..., c] = ch
    return out.astype(np.float32), start, end


def g_pad(img, k=8):
    """÷k pad (ceil-before/floor-after) then square X/Y at the end (the
    engine's TTA pad policy)."""
    spatial = np.asarray(img.shape[:3])
    target = np.ceil(spatial / k).astype(int) * k
    p = target - spatial
    p_b = np.ceil(p / 2).astype(int)
    p_a = np.floor(p / 2).astype(int)
    padded = np.pad(img, [(b, a) for b, a in zip(p_b, p_a)] + [(0, 0)])
    if padded.shape[0] != padded.shape[1]:
        side = max(padded.shape[0], padded.shape[1])
        extra = [(0, side - padded.shape[0]), (0, side - padded.shape[1]),
                 (0, 0), (0, 0)]
        padded = np.pad(padded, extra)
        p_a = p_a + np.array([extra[0][1], extra[1][1], 0])
    return padded, p_b, p_a


def g_tta_probs(tm, x):
    """Mean sigmoid probability over the 16 reference TTA combos
    (OnAxes(zxy,xyz) × HFlip × Rot90), aug/deaug in numpy, forward in
    torch. x: [X, Y, Z, 4] channels-last fp32."""
    acc = 0.0
    for axe in ("zxy", "xyz"):
        for flip in (False, True):
            for ang in (0, 90, 180, 270):
                xa = x
                if axe == "xyz":
                    xa = xa.transpose(1, 2, 0, 3)
                if flip:
                    xa = xa[:, ::-1]
                kk = (ang // 90) % 4
                if kk:
                    xa = np.rot90(xa, kk, axes=(0, 1))
                with torch.no_grad():
                    out, _ = tm(torch.from_numpy(
                        np.moveaxis(xa, -1, 0)[None].copy()))
                y = np.moveaxis(out.numpy()[0], 0, -1)
                k2 = (-kk) % 4
                if k2:
                    y = np.rot90(y, k2, axes=(0, 1))
                if flip:
                    y = y[:, ::-1]
                if axe == "xyz":
                    y = y.transpose(2, 0, 1, 3)
                acc = acc + 1.0 / (1.0 + np.exp(-y.astype(np.float64)))
    return (acc / 16.0).astype(np.float32)


def g_post(probs):
    """threshold@0.5 → BraTS labels (ET→NET→ED precedence) → 3→4 →
    keep components > CLEAN_T (26-conn) → replace labels with count ≤
    REPLACE_T by per-axial-slice nearest (griddata) → back to WT/TC/ET."""
    binary = probs >= 0.5
    wt, tc, et = binary[..., 0], binary[..., 1], binary[..., 2]
    labels = np.zeros(wt.shape, np.float32)
    labels[wt & ~tc] = 2
    labels[tc & ~et] = 1
    labels[et] = 3
    labels[labels == 3] = 4

    mask = labels != 0
    cc, _ = ndimage.label(mask, structure=np.ones((3, 3, 3), bool))
    sizes = np.bincount(cc.ravel())
    keep = np.argwhere(sizes[1:] > CLEAN_T).ravel() + 1
    labels[~np.isin(cc, keep)] = 0

    uniq, counts = np.unique(labels, return_counts=True)
    values = uniq[counts <= REPLACE_T]
    if values.size:
        new = np.zeros_like(labels)
        for z in range(labels.shape[2]):
            sl = labels[:, :, z]
            m = np.in1d(sl, values).reshape(sl.shape)
            if not m.any():
                new[:, :, z] = sl
                continue
            x = np.arange(sl.shape[1])
            y = np.arange(sl.shape[0])
            xx, yy = np.meshgrid(x, y)
            new[:, :, z] = interpolate.griddata(
                (xx[~m], yy[~m]), sl[~m].ravel(), (xx, yy),
                method="nearest")
        labels = new

    out = np.stack([np.isin(labels, [1, 2, 4]),
                    np.isin(labels, [1, 4]),
                    labels == 4], axis=-1).astype(np.float32)
    return out


def g_dice(p, g):
    if not p.any() and not g.any():
        return 1.0
    if p.any() != g.any():
        return 0.0
    return 2.0 * (p & g).sum() / (p.sum() + g.sum())


def g_hd95(p, g):
    diag = float(np.sqrt(240.0 ** 2 + 240.0 ** 2 + 155.0 ** 2))
    if not p.any() and not g.any():
        return 0.0
    if p.any() != g.any():
        return diag

    def edges(m):
        return m ^ ndimage.binary_erosion(m)

    pe, ge = edges(p), edges(g)
    d_pg = ndimage.distance_transform_edt(~ge)[pe]
    d_gp = ndimage.distance_transform_edt(~pe)[ge]
    return float(max(np.percentile(d_pg, 95), np.percentile(d_gp, 95)))


class _OneCaseLoader:
    def __init__(self, batch):
        self.batch = batch

    def __len__(self):
        return 1

    def __iter__(self):
        return iter([self.batch])


def test_full_pipeline_matches_independent_composition(rng):
    # ---- shared inputs: one synthetic raw case + one set of weights
    img_raw, seg_raw = make_case((40, 44, 26), seed=3)
    model = EquiUnetASSPEvo(features=F4, num_classes=3,
                            deep_supervision=True, remat=False)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 16, 16, 16, 4), jnp.float32))
    # push the output logits away from the 0.5 decision boundary so
    # threshold voxels are stable across backends
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params["out_conv"]["Conv_0"]["bias"] = np.array([1.0, -0.3, -1.0],
                                                    np.float32)
    variables = {"params": params}

    tm = fmp.TorchEquiUnetASSPEvo(F4).eval()
    for name in ("encoder1", "encoder2", "encoder3", "encoder4",
                 "decoder3", "decoder2", "decoder1"):
        fmp._copy_block(getattr(tm, name), params[name])
    for name in ("bridge1", "bridge2", "bridge3",
                 "upconv3", "upconv2", "upconv1"):
        fmp._copy_convevo(getattr(tm, name), params[name])
    for i in range(4):
        fmp._copy_conv(tm.aspp.convs[i], params["aspp"][f"conv_{i}"])
    fmp._copy_convevo(tm.aspp.conv_k1, params["aspp"]["conv_k1"])
    fmp._copy_conv(tm.out_conv, params["out_conv"])
    fmp._copy_conv(tm.deep3, params["deep3"]["conv"])
    fmp._copy_conv(tm.deep2, params["deep2"]["conv"])

    # ---- golden side: fully independent composition
    g_img, start, end = g_preprocess(img_raw)
    g_padded, p_b, p_a = g_pad(g_img)
    # model inputs cross the wire as fp16 in the engine — quantize the
    # golden identically so both sides see the same voxel values
    g_padded = g_padded.astype(np.float16).astype(np.float32)
    g_probs = g_tta_probs(tm, g_padded)
    g_fused = g_post(g_probs)
    g_fused *= (g_padded != 0).any(-1, keepdims=True)
    seg_mc = np.stack([np.isin(seg_raw, [1, 2, 4]),
                       np.isin(seg_raw, [1, 4]),
                       seg_raw == 4], axis=-1).astype(np.float32)
    g_seg = seg_mc[tuple(slice(s, e) for s, e in zip(start, end))]
    g_seg = np.pad(g_seg, [(b, a) for b, a in zip(p_b, p_a)] + [(0, 0)])
    g_dice_v = [g_dice(g_fused[..., c].astype(bool),
                       g_seg[..., c].astype(bool)) for c in range(3)]
    g_hd_v = [g_hd95(g_fused[..., c].astype(bool),
                     g_seg[..., c].astype(bool)) for c in range(3)]

    # ---- framework side: Engine.evaluate end-to-end (host preprocess via
    # the framework's own transforms, then the on-device TTA/post path)
    from brats21_tpu.data import transforms as T
    f_img, (f_seg,), f_start, f_end = T.crop_foreground(img_raw, seg_mc)
    np.testing.assert_array_equal(f_start, start)
    f_img = T.normalize_intensity(f_img, nonzero=True, channel_wise=True,
                                  remove_outliers=True)
    batch = {
        "img": f_img[None], "seg": f_seg[None], "patient_id": ["case0"],
        "foreground_start_coord": f_start[None],
        "foreground_end_coord": f_end[None],
        "original_shape": np.asarray(img_raw.shape[:3])[None],
        "affine": np.eye(4)[None],
    }
    cfg = TrainConfig(model="equiunet_assp_evo", criterion="dice",
                      no_amp=True)
    engine = Engine(cfg, model, make_criterion(cfg),
                    mesh=make_mesh(jax.devices()[:1], data=1, space=1))
    from brats21_tpu.utils.reporting import EvaluationReport
    report = EvaluationReport()
    engine.evaluate([variables], _OneCaseLoader(batch), 0, use_tta=True,
                    post_kwargs=dict(cleaning_areas=True,
                                     cleaning_areas_threshold=CLEAN_T,
                                     replace_value=True,
                                     replace_value_threshold=REPLACE_T),
                    report=report)
    row = report.rows["case0"]

    # ---- the verdicts
    for c, lbl in enumerate(("WT", "TC", "ET")):
        np.testing.assert_allclose(row[f"Dice_{lbl}"], g_dice_v[c],
                                   atol=1e-5, err_msg=f"Dice {lbl}")
        np.testing.assert_allclose(row[f"Hausdorff_Distance95_{lbl}"],
                                   g_hd_v[c], atol=1e-3,
                                   err_msg=f"HD95 {lbl}")
