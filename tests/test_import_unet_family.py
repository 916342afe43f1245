"""torch→flax import roundtrips for the unet_family (round 4 extension).

Reference-NAMED torch models (module/attribute names mirror the
reference's nn.Sequential layouts so their state_dict keys are byte-equal
to a real ``best_model.pth``: networks/unet_family.py:13-131 blocks,
:134-217 Unet, :220-308 R2Unet, :311-402 AttUnet, :405-500 R2AttUnet) are
randomly initialized — INCLUDING the attention gates' BatchNorm3d
running statistics, which real checkpoints carry and which must land in
the flax ``batch_stats`` collection — then imported via
utils/import_torch and checked by forward parity (<2e-4 fp32) in eval
mode, plus the converter-CLI servable roundtrip."""

import os

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

F4 = [8, 16, 32, 64]


# --------------------------------------------------------------------------
# reference-named torch modules (unet_family.py Sequential layouts)
# --------------------------------------------------------------------------


class RefConvBlock(tnn.Module):
    """unet_family.py:13-35 — 'conv' Sequential[conv,norm,act,conv,norm,act]
    → keys conv.0/.1/.3/.4 (group norm present)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv3d(cin, cout, 3, padding=1, bias=True),
            tnn.GroupNorm(8, cout),
            tnn.ReLU(inplace=True),
            tnn.Conv3d(cout, cout, 3, padding=1, bias=True),
            tnn.GroupNorm(8, cout),
            tnn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.conv(x)


class RefUpConv(tnn.Module):
    """unet_family.py:38-57 — 'up' Sequential[Upsample,conv,norm,act]
    → keys up.1/.2 (nearest upsample, the torch nn.Upsample default)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.up = tnn.Sequential(
            tnn.Upsample(scale_factor=2),
            tnn.Conv3d(cin, cout, 3, padding=1, bias=True),
            tnn.GroupNorm(8, cout),
            tnn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.up(x)


class RefRecurrentBlock(tnn.Module):
    """unet_family.py:60-86 — shared-weight 'conv' Sequential[conv,norm,act]
    applied 1 + t times (the i==0 result is immediately overwritten)."""

    def __init__(self, ch, t=2):
        super().__init__()
        self.t = t
        self.conv = tnn.Sequential(
            tnn.Conv3d(ch, ch, 3, padding=1, bias=True),
            tnn.GroupNorm(8, ch),
            tnn.ReLU(inplace=True),
        )

    def forward(self, x):
        x1 = x
        for i in range(self.t):
            if i == 0:
                x1 = self.conv(x)
            x1 = self.conv(x + x1)
        return x1


class RefRRCNNblock(tnn.Module):
    """unet_family.py:89-101 — keys Conv_1x1.* and RCNN.0/.1 (Sequential of
    two RecurrentBlocks)."""

    def __init__(self, cin, cout, t=2):
        super().__init__()
        self.RCNN = tnn.Sequential(RefRecurrentBlock(cout, t),
                                   RefRecurrentBlock(cout, t))
        self.Conv_1x1 = tnn.Conv3d(cin, cout, 1)

    def forward(self, x):
        x = self.Conv_1x1(x)
        return x + self.RCNN(x)


class RefAttentionBlock(tnn.Module):
    """unet_family.py:104-131 — gates W_g/W_x/psi are
    Sequential[conv1x1, BatchNorm3d(,Sigmoid)] → keys W_g.0/.1 etc.;
    BatchNorm REGARDLESS of the model norm, with running stats."""

    def __init__(self, fg, fl, fint):
        super().__init__()
        self.W_g = tnn.Sequential(tnn.Conv3d(fg, fint, 1, bias=True),
                                  tnn.BatchNorm3d(fint))
        self.W_x = tnn.Sequential(tnn.Conv3d(fl, fint, 1, bias=True),
                                  tnn.BatchNorm3d(fint))
        self.psi = tnn.Sequential(tnn.Conv3d(fint, 1, 1, bias=True),
                                  tnn.BatchNorm3d(1), tnn.Sigmoid())

    def forward(self, g, x):
        psi = F.relu(self.W_g(g) + self.W_x(x))
        return x * self.psi(psi)


class RefFamily(tnn.Module):
    """Attribute names per variant (unet_family.py:146-176 Unet,
    :233-256 R2Unet, :323-346 AttUnet, :417-444 R2AttUnet): plain models
    use Conv1..4 / Up_conv4..2, recurrent ones RRCNN1..4 / Up_RRCNN4..2;
    attention models add Att4/Att3/Att2. Deep supervision returns
    (d1, d2, d3, d4) = main + ×2/×4/×8 nearest-upsampled heads
    (:207-217)."""

    def __init__(self, f, nc=3, attention=False, recurrent=False, t=2):
        super().__init__()
        self.attention, self.recurrent = attention, recurrent
        enc = ((lambda cin, ch: RefRRCNNblock(cin, ch, t)) if recurrent
               else RefConvBlock)
        enc_name = "RRCNN{}" if recurrent else "Conv{}"
        dec_name = "Up_RRCNN{}" if recurrent else "Up_conv{}"
        self.enc_name, self.dec_name = enc_name, dec_name
        chans = [4] + list(f)
        for i in range(1, 5):
            setattr(self, enc_name.format(i), enc(chans[i - 1], f[i - 1]))
        for i, (cin, ch) in enumerate([(f[3], f[2]), (f[2], f[1]),
                                       (f[1], f[0])]):
            setattr(self, f"Up{4 - i}", RefUpConv(cin, ch))
            setattr(self, dec_name.format(4 - i), enc(2 * ch, ch))
        if attention:
            self.Att4 = RefAttentionBlock(f[2], f[2], f[1])
            self.Att3 = RefAttentionBlock(f[1], f[1], f[0])
            self.Att2 = RefAttentionBlock(f[0], f[0], max(f[0] // 2, 1))
        self.Conv_1x1 = tnn.Conv3d(f[0], nc, 1)
        self.outconv4 = tnn.Conv3d(f[3], nc, 1)
        self.outconv3 = tnn.Conv3d(f[2], nc, 1)
        self.outconv2 = tnn.Conv3d(f[1], nc, 1)

    def forward(self, x):
        enc = [getattr(self, self.enc_name.format(i)) for i in range(1, 5)]
        x1 = enc[0](x)
        x2 = enc[1](F.max_pool3d(x1, 2))
        x3 = enc[2](F.max_pool3d(x2, 2))
        x4 = enc[3](F.max_pool3d(x3, 2))

        d4 = self.Up4(x4)
        if self.attention:
            x3 = self.Att4(d4, x3)
        d4_up = getattr(self, self.dec_name.format(4))(
            torch.cat((x3, d4), 1))
        d3 = self.Up3(d4_up)
        if self.attention:
            x2 = self.Att3(d3, x2)
        d3_up = getattr(self, self.dec_name.format(3))(
            torch.cat((x2, d3), 1))
        d2 = self.Up2(d3_up)
        if self.attention:
            x1 = self.Att2(d2, x1)
        d2_up = getattr(self, self.dec_name.format(2))(
            torch.cat((x1, d2), 1))
        d1 = self.Conv_1x1(d2_up)

        def up(y, s):
            return F.interpolate(y, scale_factor=s, mode="nearest")

        return d1, [up(self.outconv2(d3_up), 2), up(self.outconv3(d4_up), 4),
                    up(self.outconv4(x4), 8)]


def _randomize(model, seed):
    """Random params AND random BN running statistics — a trained
    checkpoint's stats are far from the (0, 1) init, so parity in eval
    mode proves the batch_stats import actually lands."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.2)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)
    return model


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1))


def _import_and_compare(tm, model_name, tmp_path, rng, seed):
    tm = _randomize(tm, seed).eval()
    pth = str(tmp_path / "best_model.pth")
    torch.save({"epoch": 7, "model": tm.state_dict()}, pth)

    cfg = TrainConfig(model=model_name, width=F4[0], norm="group",
                      act="relu")
    variables = import_checkpoint(pth, cfg)

    from brats21_tpu.models import get_model
    model = get_model(cfg)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    out, deeps = model.apply(variables, jnp.asarray(x), deterministic=True)
    with torch.no_grad():
        want_out, want_deeps = tm(_nchw(x))
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(want_out.numpy(), 1, -1),
                               atol=2e-4)
    assert len(deeps) == len(want_deeps) == 3
    for g, w in zip(deeps, want_deeps):
        np.testing.assert_allclose(np.asarray(g),
                                   np.moveaxis(w.numpy(), 1, -1), atol=2e-4)
    return variables


def test_import_modified_unet_forward_parity(tmp_path, rng):
    v = _import_and_compare(RefFamily(F4), "modified_unet", tmp_path, rng, 20)
    assert "batch_stats" not in v


def test_import_r2unet_forward_parity(tmp_path, rng):
    v = _import_and_compare(RefFamily(F4, recurrent=True), "r2unet",
                            tmp_path, rng, 21)
    assert "batch_stats" not in v


def test_import_att_unet_forward_parity_with_bn_stats(tmp_path, rng):
    v = _import_and_compare(RefFamily(F4, attention=True), "att_unet",
                            tmp_path, rng, 22)
    # the randomized running stats must have landed in batch_stats
    bs = v["batch_stats"]["Att4"]["bn_g"]["BatchNorm_0"]
    assert float(np.abs(np.asarray(bs["mean"])).max()) > 0
    assert not np.allclose(np.asarray(bs["var"]), 1.0)


def test_import_r2attunet_forward_parity_with_bn_stats(tmp_path, rng):
    _import_and_compare(RefFamily(F4, attention=True, recurrent=True),
                        "r2attunet", tmp_path, rng, 23)


def test_att_import_without_batch_stats_errors(tmp_path):
    """Dropping the running stats silently would mis-serve real
    checkpoints — asking for a params-only import of an attention model
    must hard-error on the unconsumed stats."""
    tm = _randomize(RefFamily(F4, attention=True), 24)
    pth = str(tmp_path / "m.pth")
    torch.save({"model": tm.state_dict()}, pth)
    sd = load_torch_state_dict(pth)
    from brats21_tpu.models import get_model
    cfg = TrainConfig(model="att_unet", width=F4[0])
    v = get_model(cfg).init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 16, 4), jnp.float32))
    with pytest.raises(ValueError, match="unconsumed"):
        state_dict_to_flax(sd, "att_unet", v["params"])


def test_import_cli_serves_r2attunet_with_stats(tmp_path, rng):
    """Converter CLI → {config.yaml, best_model/} carrying batch_stats →
    load_member-style reload reproduces the torch forward."""
    tm = _randomize(RefFamily(F4, attention=True, recurrent=True), 25).eval()
    pth = str(tmp_path / "best_model.pth")
    torch.save({"model": tm.state_dict()}, pth)
    out_dir = str(tmp_path / "run")

    from brats21_tpu.cli.import_torch import main as convert_main
    convert_main(["--pth", pth, "--out", out_dir,
                  "--model", "r2attunet", "--width", str(F4[0])])

    from brats21_tpu.learning.checkpoint import load_checkpoint
    ckpt = load_checkpoint(os.path.join(out_dir, "best_model"))
    assert "batch_stats" in ckpt
    cfg = TrainConfig.from_yaml(os.path.join(out_dir, "config.yaml"))
    assert cfg.model == "r2attunet"

    from brats21_tpu.models import get_model
    model = get_model(cfg)
    variables = {"params": ckpt["params"],
                 "batch_stats": ckpt["batch_stats"]}
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    out, _ = model.apply(variables, jnp.asarray(x), deterministic=True)
    with torch.no_grad():
        want, _ = tm(_nchw(x))
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(want.numpy(), 1, -1), atol=2e-4)
