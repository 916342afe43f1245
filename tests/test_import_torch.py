"""torch→flax checkpoint import roundtrips (VERDICT r3 #4).

Reference-NAMED torch models (module/attribute names copied from the
reference's nn.Sequential layouts so their state_dict keys are byte-equal
to a real ``best_model.pth``: equiunet2020.py:51-123,312-500 and
equiunet2021.py:192-333 + MONAI ResidualSELayer's ``fc`` Sequential) are
randomly initialized, saved with the reference payload shapes
({"model": ...} / {"swa_model": AveragedModel...}), imported via
utils/import_torch, and checked by FORWARD PARITY (<2e-4 fp32) against the
torch model — validating the key translation and every layout transpose
end-to-end, plus the converter CLI and the hard-error paths."""

import os
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from brats21_tpu.config import TrainConfig
from brats21_tpu.utils.import_torch import (import_checkpoint,
                                            load_torch_state_dict,
                                            state_dict_to_flax)

from test_full_model_parity import TorchEvoNorm3D

F4 = [8, 16, 32, 64]


# --------------------------------------------------------------------------
# reference-named torch modules (state_dict keys match the published .pth)
# --------------------------------------------------------------------------


class RefConvBnRelu(tnn.Sequential):
    """equiunet2020.py:51-75 — names 'conv'/'bn' (+act/dropout, paramless)."""

    def __init__(self, cin, cout, dilation=1):
        super().__init__(OrderedDict([
            ("conv", tnn.Conv3d(cin, cout, 3, padding=dilation,
                                dilation=dilation, bias=False)),
            ("bn", tnn.GroupNorm(8, cout)),
            ("relu", tnn.ReLU(inplace=True)),
            ("dropout", tnn.Dropout(0.0)),
        ]))


class RefUBlock(tnn.Sequential):
    """equiunet2020.py:105-123 — names 'ConvBnRelu1'/'ConvBnRelu2'."""

    def __init__(self, cin, mid, cout, dilation=(1, 1)):
        super().__init__(OrderedDict([
            ("ConvBnRelu1", RefConvBnRelu(cin, mid, dilation[0])),
            ("ConvBnRelu2", RefConvBnRelu(mid, cout, dilation[1])),
        ]))


class RefEquiUnet(tnn.Module):
    """equiunet2020.py:408-500 attribute names, deep supervision on."""

    def __init__(self, f, nc=3):
        super().__init__()
        self.encoder1 = RefUBlock(4, f[0], f[0])
        self.encoder2 = RefUBlock(f[0], f[1], f[1])
        self.encoder3 = RefUBlock(f[1], f[2], f[2])
        self.encoder4 = RefUBlock(f[2], f[3], f[3])
        self.bottom = RefUBlock(f[3], f[3], f[3], (2, 2))
        self.bottom_2 = RefConvBnRelu(f[3] * 2, f[2])
        self.decoder3 = RefUBlock(f[2] * 2, f[2], f[1])
        self.decoder2 = RefUBlock(f[1] * 2, f[1], f[0])
        self.decoder1 = RefUBlock(f[0] * 2, f[0], f[0])
        self.outconv = tnn.Conv3d(f[0], nc, 1)
        up = lambda s: tnn.Upsample(scale_factor=s, mode="trilinear",
                                    align_corners=True)
        self.deep_bottom = tnn.Sequential(tnn.Conv3d(f[3], nc, 1), up(8))
        self.deep_bottom2 = tnn.Sequential(tnn.Conv3d(f[2], nc, 1), up(8))
        self.deep3 = tnn.Sequential(tnn.Conv3d(f[1], nc, 1), up(4))
        self.deep2 = tnn.Sequential(tnn.Conv3d(f[0], nc, 1), up(2))

    def forward(self, x):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="trilinear",
                                     align_corners=True)
        d1 = self.encoder1(x)
        d2 = self.encoder2(F.max_pool3d(d1, 2))
        d3 = self.encoder3(F.max_pool3d(d2, 2))
        d4 = self.encoder4(F.max_pool3d(d3, 2))
        bottom = self.bottom(d4)
        b2 = self.bottom_2(torch.cat([d4, bottom], 1))
        u3 = self.decoder3(torch.cat([d3, up(b2)], 1))
        u2 = self.decoder2(torch.cat([d2, up(u3)], 1))
        u1 = self.decoder1(torch.cat([d1, up(u2)], 1))
        out = self.outconv(u1)
        deeps = [self.deep_bottom(bottom), self.deep_bottom2(b2),
                 self.deep3(u3), self.deep2(u2)]
        return out, deeps


class RefEvoNorm3D(TorchEvoNorm3D):
    """The published .pth's EvoNorm surface (equiunet2021.py:75-83): the
    forward-parity replica PLUS the non_linear 'v' parameter (unused by the
    efficient S0 swish but present in every checkpoint) and the vestigial
    'running_var' buffer the importer must tolerate."""

    def __init__(self, c, groups=8, eps=1e-5):
        super().__init__(c, groups, eps)
        self.v = tnn.Parameter(torch.ones(1, c, 1, 1, 1))
        self.register_buffer("running_var", torch.ones(1, c, 1, 1, 1))


class RefSE(tnn.Module):
    """MONAI ResidualSELayer r=2: 'fc' Sequential(Linear, relu, Linear,
    sigmoid) → keys fc.0/fc.2 (equiunet2021.py:204-205)."""

    def __init__(self, c, r=2):
        super().__init__()
        self.fc = tnn.Sequential(tnn.Linear(c, c // r), tnn.ReLU(),
                                 tnn.Linear(c // r, c), tnn.Sigmoid())

    def forward(self, x):
        s = self.fc(x.mean(dim=(2, 3, 4)))
        return x + x * s[:, :, None, None, None]


class RefConvEvoBlock(tnn.Module):
    """equiunet2021.py:192-209 — ONE Sequential 'conv_conv_se', indices
    0,1,3,4,6 hold the params."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv_conv_se = tnn.Sequential(
            tnn.Conv3d(cin, cout, 3, padding=1), RefEvoNorm3D(cout),
            tnn.Dropout(0.0),
            tnn.Conv3d(cout, cout, 3, padding=1), RefEvoNorm3D(cout),
            tnn.Dropout(0.0),
            RefSE(cout))

    def forward(self, x):
        return self.conv_conv_se(x)


class RefConvEvo(tnn.Module):
    """equiunet2021.py:212-222 — 'conv'/'evo' (+paramless drop)."""

    def __init__(self, cin, cout, k=1, dilation=1):
        super().__init__()
        pad = dilation * (k - 1) // 2
        self.conv = tnn.Conv3d(cin, cout, k, padding=pad, dilation=dilation)
        self.evo = RefEvoNorm3D(cout)

    def forward(self, x):
        return self.evo(self.conv(x))


class RefASPP(tnn.Module):
    """equiunet2021.py:121-189 — 'convs' ModuleList + 'conv_k1'."""

    def __init__(self, cin, q):
        super().__init__()
        self.convs = tnn.ModuleList(
            [tnn.Conv3d(cin, q, k, padding=d * (k - 1) // 2, dilation=d)
             for k, d in zip((1, 3, 3, 3), (1, 2, 4, 6))])
        self.conv_k1 = RefConvEvo(4 * q, 4 * q, 1)

    def forward(self, x):
        return self.conv_k1(torch.cat([m(x) for m in self.convs], dim=1))


class RefEquiUnetASSPEvo(tnn.Module):
    """equiunet2021.py:225-333 attribute names, deep supervision on."""

    def __init__(self, f, nc=3):
        super().__init__()
        self.encoder1 = RefConvEvoBlock(4, f[0])
        self.encoder2 = RefConvEvoBlock(2 * f[0], f[1])
        self.encoder3 = RefConvEvoBlock(2 * f[1], f[2])
        self.encoder4 = RefConvEvoBlock(2 * f[2], f[3])
        self.aspp = RefASPP(f[3], f[3] // 4)
        self.bridge1 = RefConvEvo(f[0], f[0] // 2)
        self.bridge2 = RefConvEvo(f[1], f[1] // 2)
        self.bridge3 = RefConvEvo(f[2], f[2] // 2)
        self.upconv3 = RefConvEvo(f[3], f[3] // 4)
        self.decoder3 = RefConvEvoBlock(f[2], f[2])
        self.upconv2 = RefConvEvo(f[2], f[2] // 4)
        self.decoder2 = RefConvEvoBlock(f[1], f[1])
        self.upconv1 = RefConvEvo(f[1], f[1] // 4)
        self.decoder1 = RefConvEvoBlock(f[0], f[0])
        self.out_conv = tnn.Conv3d(f[0], nc, 1)
        up = lambda s: tnn.Upsample(scale_factor=s, mode="trilinear",
                                    align_corners=True)
        self.deep3 = tnn.Sequential(tnn.Conv3d(f[2], nc, 1), up(4))
        self.deep2 = tnn.Sequential(tnn.Conv3d(f[1], nc, 1), up(2))

    @staticmethod
    def down(x):
        return torch.cat([F.max_pool3d(x, 2), F.avg_pool3d(x, 2)], dim=1)

    def forward(self, x):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="trilinear",
                                     align_corners=True)
        d1 = self.encoder1(x)
        d2 = self.encoder2(self.down(d1))
        d3 = self.encoder3(self.down(d2))
        d4 = self.encoder4(self.down(d3))
        a = self.aspp(d4)
        u3 = self.decoder3(
            torch.cat([self.bridge3(d3), up(self.upconv3(a))], 1))
        u2 = self.decoder2(
            torch.cat([self.bridge2(d2), up(self.upconv2(u3))], 1))
        u1 = self.decoder1(
            torch.cat([self.bridge1(d1), up(self.upconv1(u2))], 1))
        out = self.out_conv(u1)
        return out, [self.deep3(u3), self.deep2(u2)]


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    return model


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1))


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_import_equiunet_pth_forward_parity(tmp_path, rng):
    tm = _randomize(RefEquiUnet(F4), 0).eval()
    pth = str(tmp_path / "best_model.pth")
    torch.save({"epoch": 42, "model": tm.state_dict()}, pth)

    cfg = TrainConfig(model="equiunet", width=8, norm="group", act="relu")
    params = import_checkpoint(pth, cfg)["params"]

    from brats21_tpu.models import get_model
    model = get_model(cfg)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    out, deeps = model.apply({"params": params}, jnp.asarray(x),
                             deterministic=True)
    with torch.no_grad():
        want_out, want_deeps = tm(_nchw(x))
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(want_out.numpy(), 1, -1),
                               atol=2e-4)
    assert len(deeps) == len(want_deeps) == 4
    for g, w in zip(deeps, want_deeps):
        np.testing.assert_allclose(np.asarray(g),
                                   np.moveaxis(w.numpy(), 1, -1), atol=2e-4)


def test_import_assp_evo_pth_forward_parity(tmp_path, rng):
    tm = _randomize(RefEquiUnetASSPEvo(F4), 1).eval()
    pth = str(tmp_path / "best_model.pth")
    torch.save({"model": tm.state_dict()}, pth)

    cfg = TrainConfig(model="equiunet_assp_evo", width=8)
    params = import_checkpoint(pth, cfg)["params"]

    from brats21_tpu.models import get_model
    model = get_model(cfg)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    out, deeps = model.apply({"params": params}, jnp.asarray(x),
                             deterministic=True)
    with torch.no_grad():
        want_out, want_deeps = tm(_nchw(x))
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(want_out.numpy(), 1, -1),
                               atol=2e-4)
    for g, w in zip(deeps, want_deeps):
        np.testing.assert_allclose(np.asarray(g),
                                   np.moveaxis(w.numpy(), 1, -1), atol=2e-4)


def test_import_swa_averaged_model(tmp_path):
    """The reference's SWA payload: AveragedModel state_dict under
    'swa_model' ('module.' prefix + n_averaged buffer,
    main_inference.py:66-68)."""
    tm = _randomize(RefEquiUnetASSPEvo(F4), 2)
    avg = torch.optim.swa_utils.AveragedModel(tm)
    pth = str(tmp_path / "last_model.pth")
    torch.save({"swa_model": avg.state_dict()}, pth)

    sd = load_torch_state_dict(pth, prefer_swa=True)
    assert "n_averaged" not in sd
    assert all(not k.startswith("module.") for k in sd)
    # AveragedModel initializes to the wrapped weights: values must match
    np.testing.assert_allclose(
        sd["encoder1.conv_conv_se.0.weight"],
        tm.encoder1.conv_conv_se[0].weight.detach().numpy())

    cfg = TrainConfig(model="equiunet_assp_evo", width=8)
    params = import_checkpoint(pth, cfg, prefer_swa=True)["params"]
    got = np.asarray(params["encoder1"]["conv1"]["Conv_0"]["kernel"])
    want = tm.encoder1.conv_conv_se[0].weight.detach().numpy().transpose(
        2, 3, 4, 1, 0)
    np.testing.assert_allclose(got, want)


def test_import_errors(tmp_path):
    tm = _randomize(RefEquiUnetASSPEvo(F4), 3)
    pth = str(tmp_path / "m.pth")
    torch.save({"model": tm.state_dict()}, pth)

    # wrong width → shape mismatch
    with pytest.raises(ValueError, match="shape mismatch"):
        import_checkpoint(pth, TrainConfig(model="equiunet_assp_evo",
                                           width=16))
    # wrong family → missing torch keys
    with pytest.raises(KeyError, match="missing"):
        import_checkpoint(pth, TrainConfig(model="equiunet", width=8,
                                           norm="group"))
    # unconsumed keys → hard error
    sd = load_torch_state_dict(pth)
    sd["rogue.weight"] = np.zeros(3, np.float32)
    from brats21_tpu.models import get_model
    cfg = TrainConfig(model="equiunet_assp_evo", width=8)
    v = get_model(cfg).init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 16, 4), jnp.float32))
    with pytest.raises(ValueError, match="unconsumed"):
        state_dict_to_flax(sd, "equiunet_assp_evo", v["params"])
    # unsupported family
    with pytest.raises(NotImplementedError):
        state_dict_to_flax(sd, "unetr", v["params"])


def test_import_cli_writes_servable_run_dir(tmp_path, rng):
    """python -m brats21_tpu.cli.import_torch --pth ... --out ... produces
    {config.yaml, best_model/} that load_member serves directly."""
    tm = _randomize(RefEquiUnetASSPEvo(F4), 4).eval()
    pth = str(tmp_path / "best_model.pth")
    torch.save({"model": tm.state_dict()}, pth)
    out_dir = str(tmp_path / "run")

    from brats21_tpu.cli.import_torch import main as convert_main
    convert_main(["--pth", pth, "--out", out_dir,
                  "--model", "equiunet_assp_evo", "--width", "8"])

    assert os.path.exists(os.path.join(out_dir, "config.yaml"))
    from brats21_tpu.learning.checkpoint import load_checkpoint
    ckpt = load_checkpoint(os.path.join(out_dir, "best_model"))
    cfg = TrainConfig.from_yaml(os.path.join(out_dir, "config.yaml"))
    assert cfg.model == "equiunet_assp_evo" and cfg.width == 8

    from brats21_tpu.models import get_model
    model = get_model(cfg)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    out, _ = model.apply({"params": ckpt["params"]}, jnp.asarray(x),
                         deterministic=True)
    with torch.no_grad():
        want, _ = tm(_nchw(x))
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(want.numpy(), 1, -1), atol=2e-4)


def test_imported_weights_give_identical_labels(tmp_path, rng):
    """BASELINE.md's north-star qualifier is 'at equal DSC'. With imported
    reference weights the frameworks produce the SAME segmentation labels
    (hence bitwise-equal DSC against any ground truth): thresholded sigmoid
    predictions may differ only where the probability sits within float
    noise of the 0.5 threshold — assert zero disagreements outside a 1e-3
    probability band and a vanishing disagreement rate overall."""
    tm = _randomize(RefEquiUnetASSPEvo(F4), 11).eval()
    pth = str(tmp_path / "best_model.pth")
    torch.save({"model": tm.state_dict()}, pth)
    cfg = TrainConfig(model="equiunet_assp_evo", width=8)
    params = import_checkpoint(pth, cfg)["params"]

    from brats21_tpu.models import get_model
    model = get_model(cfg)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    out, _ = model.apply({"params": params}, jnp.asarray(x),
                         deterministic=True)
    probs_j = np.asarray(jax.nn.sigmoid(out.astype(jnp.float32)))
    with torch.no_grad():
        logits_t, _ = tm(_nchw(x))
    probs_t = np.moveaxis(torch.sigmoid(logits_t).numpy(), 1, -1)

    lab_j = probs_j >= 0.5
    lab_t = probs_t >= 0.5
    disagree = lab_j != lab_t
    # every disagreement must be a genuine threshold tie
    assert np.abs(probs_t[disagree] - 0.5).max(initial=0.0) < 1e-3
    assert disagree.mean() < 1e-3


# --------------------------------------------------------------------------
# att_equiunet / equiunet_ref (round 4): CBAM and RefUnet key translation
# --------------------------------------------------------------------------


class RefChannelGate(tnn.Module):
    """equiunet2020.py:171-201 — 'mlp' Sequential(Flatten, Linear, ReLU,
    Linear) → keys mlp.1/mlp.3; avg+max pooled features share the mlp."""

    def __init__(self, c, r=16):
        super().__init__()
        self.mlp = tnn.Sequential(tnn.Flatten(), tnn.Linear(c, c // r),
                                  tnn.ReLU(), tnn.Linear(c // r, c))

    def forward(self, x):
        avg = F.avg_pool3d(x, x.shape[2:]).flatten(1)
        mx = F.max_pool3d(x, x.shape[2:]).flatten(1)
        att = self.mlp(avg) + self.mlp(mx)
        return x * torch.sigmoid(att)[:, :, None, None, None]


class RefSpatialGate(tnn.Module):
    """equiunet2020.py:210-221 — BasicConv named 'spatial' (conv/bn)."""

    class _BasicConv(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tnn.Conv3d(2, 1, 7, padding=3, bias=False)
            self.bn = tnn.GroupNorm(1, 1)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def __init__(self):
        super().__init__()
        self.spatial = self._BasicConv()

    def forward(self, x):
        compress = torch.cat([x.max(dim=1, keepdim=True).values,
                              x.mean(dim=1, keepdim=True)], dim=1)
        return x * torch.sigmoid(self.spatial(compress))


class RefCBAM(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.ChannelGate = RefChannelGate(c)
        self.SpatialGate = RefSpatialGate()

    def forward(self, x):
        return self.SpatialGate(self.ChannelGate(x))


class RefUBlockCbam(tnn.Sequential):
    """equiunet2020.py:238-249 — names 'UBlock'/'CBAM'."""

    def __init__(self, cin, mid, cout, dilation=(1, 1)):
        super().__init__(OrderedDict([
            ("UBlock", RefUBlock(cin, mid, cout, dilation)),
            ("CBAM", RefCBAM(cout)),
        ]))


class RefAttEquiUnet(tnn.Module):
    """equiunet2020.py:503-561 attribute names; bottom_2 is
    Sequential(ConvBnRelu, CBAM) → key prefixes bottom_2.0/bottom_2.1."""

    def __init__(self, f, nc=3):
        super().__init__()
        self.encoder1 = RefUBlockCbam(4, f[0], f[0])
        self.encoder2 = RefUBlockCbam(f[0], f[1], f[1])
        self.encoder3 = RefUBlockCbam(f[1], f[2], f[2])
        self.encoder4 = RefUBlockCbam(f[2], f[3], f[3])
        self.bottom = RefUBlockCbam(f[3], f[3], f[3], (2, 2))
        self.bottom_2 = tnn.Sequential(RefConvBnRelu(f[3] * 2, f[2]),
                                       RefCBAM(f[2]))
        self.decoder3 = RefUBlock(f[2] * 2, f[2], f[1])
        self.decoder2 = RefUBlock(f[1] * 2, f[1], f[0])
        self.decoder1 = RefUBlock(f[0] * 2, f[0], f[0])
        self.outconv = tnn.Conv3d(f[0], nc, 1)
        up = lambda s: tnn.Upsample(scale_factor=s, mode="trilinear",
                                    align_corners=True)
        self.deep_bottom = tnn.Sequential(tnn.Conv3d(f[3], nc, 1), up(8))
        self.deep_bottom2 = tnn.Sequential(tnn.Conv3d(f[2], nc, 1), up(8))
        self.deep3 = tnn.Sequential(tnn.Conv3d(f[1], nc, 1), up(4))
        self.deep2 = tnn.Sequential(tnn.Conv3d(f[0], nc, 1), up(2))

    def forward(self, x):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="trilinear",
                                     align_corners=True)
        d1 = self.encoder1(x)
        d2 = self.encoder2(F.max_pool3d(d1, 2))
        d3 = self.encoder3(F.max_pool3d(d2, 2))
        d4 = self.encoder4(F.max_pool3d(d3, 2))
        bottom = self.bottom(d4)
        b2 = self.bottom_2(torch.cat([d4, bottom], 1))
        u3 = self.decoder3(torch.cat([d3, up(b2)], 1))
        u2 = self.decoder2(torch.cat([d2, up(u3)], 1))
        u1 = self.decoder1(torch.cat([d1, up(u2)], 1))
        out = self.outconv(u1)
        deeps = [self.deep_bottom(bottom), self.deep_bottom2(b2),
                 self.deep3(u3), self.deep2(u2)]
        return out, deeps


class RefRefUnet(tnn.Module):
    """equiunet2020.py:252-309 attribute names (refinement sub-net)."""

    def __init__(self, in_ch, inc_ch):
        super().__init__()
        self.conv0 = tnn.Conv3d(in_ch, inc_ch, 3, padding=1)
        for name in ("hx1", "hx2", "hx3", "hx4", "hx5"):
            setattr(self, name, RefConvBnRelu(inc_ch, inc_ch))
        for name in ("d4", "d3", "d2", "d1"):
            setattr(self, name, RefConvBnRelu(inc_ch * 2, inc_ch))
        self.conv_d0 = tnn.Conv3d(inc_ch, in_ch, 3, padding=1)

    def forward(self, x):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="trilinear",
                                     align_corners=True)
        hx = self.conv0(x)
        hx1 = self.hx1(hx)
        hx2 = self.hx2(F.max_pool3d(hx1, 2, 2, ceil_mode=True))
        hx3 = self.hx3(F.max_pool3d(hx2, 2, 2, ceil_mode=True))
        hx4 = self.hx4(F.max_pool3d(hx3, 2, 2, ceil_mode=True))
        hx5 = self.hx5(F.max_pool3d(hx4, 2, 2, ceil_mode=True))
        d4 = self.d4(torch.cat((up(hx5), hx4), 1))
        d3 = self.d3(torch.cat((up(d4), hx3), 1))
        d2 = self.d2(torch.cat((up(d3), hx2), 1))
        d1 = self.d1(torch.cat((up(d2), hx1), 1))
        return x + self.conv_d0(d1)


class RefEquiUnetRef(RefEquiUnet):
    """EquiUnet + refinement head (equiunet2020.py:460-463, 490-491)."""

    def __init__(self, f, nc=3):
        super().__init__(f, nc)
        self.refunet = RefRefUnet(nc, f[0])

    def forward(self, x):
        out, deeps = super().forward(x)
        return [self.refunet(out), out], deeps


def test_import_att_equiunet_pth_forward_parity(tmp_path, rng):
    f16 = [16, 32, 64, 128]  # ChannelGate mlp needs c//16 >= 1
    tm = _randomize(RefAttEquiUnet(f16), 5).eval()
    pth = str(tmp_path / "best_model.pth")
    torch.save({"model": tm.state_dict()}, pth)

    cfg = TrainConfig(model="att_equiunet", width=16, norm="group",
                      act="relu")
    params = import_checkpoint(pth, cfg)["params"]
    from brats21_tpu.models import get_model
    model = get_model(cfg)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    out, deeps = model.apply({"params": params}, jnp.asarray(x),
                             deterministic=True)
    with torch.no_grad():
        want_out, want_deeps = tm(_nchw(x))
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(want_out.numpy(), 1, -1),
                               atol=5e-4)
    for g, w in zip(deeps, want_deeps):
        np.testing.assert_allclose(np.asarray(g),
                                   np.moveaxis(w.numpy(), 1, -1), atol=5e-4)


def test_import_equiunet_ref_pth_forward_parity(tmp_path, rng):
    tm = _randomize(RefEquiUnetRef(F4), 6).eval()
    pth = str(tmp_path / "best_model.pth")
    torch.save({"model": tm.state_dict()}, pth)

    cfg = TrainConfig(model="equiunet_ref", width=8, norm="group",
                      act="relu")
    params = import_checkpoint(pth, cfg)["params"]
    from brats21_tpu.models import get_model
    model = get_model(cfg)
    # 32³: RefUnet's 4 ceil-pools bottom out at 2³ — torch GroupNorm
    # rejects the 1³ a 16³ input would produce (the reference only runs
    # the refinement net on full-size crops)
    x = rng.standard_normal((1, 32, 32, 32, 4)).astype(np.float32)
    (refined, out), deeps = model.apply({"params": params}, jnp.asarray(x),
                                        deterministic=True)
    with torch.no_grad():
        (want_ref, want_out), want_deeps = tm(_nchw(x))
    np.testing.assert_allclose(np.asarray(refined),
                               np.moveaxis(want_ref.numpy(), 1, -1),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(want_out.numpy(), 1, -1),
                               atol=5e-4)
