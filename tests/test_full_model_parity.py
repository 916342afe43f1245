"""Whole-model numerical parity: EquiUnet forward vs an identically-weighted
torch replica of the reference architecture (equiunet2020.py:408-500), within
the 1e-3 target of SURVEY.md §7."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from brats21_tpu.models.equiunet import EquiUnet

WIDTH = 8
F4 = [WIDTH * 2 ** i for i in range(4)]


class TorchConvBnRelu(tnn.Module):
    def __init__(self, cin, cout, dilation=1):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, 3, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn = tnn.GroupNorm(8, cout, affine=True)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchUBlock(tnn.Module):
    def __init__(self, cin, mid, cout, dilation=(1, 1)):
        super().__init__()
        self.b1 = TorchConvBnRelu(cin, mid, dilation[0])
        self.b2 = TorchConvBnRelu(mid, cout, dilation[1])

    def forward(self, x):
        return self.b2(self.b1(x))


class TorchEquiUnet(tnn.Module):
    """Reference EquiUnet layout (deep_supervision off for the comparison)."""

    def __init__(self, f):
        super().__init__()
        self.encoder1 = TorchUBlock(4, f[0], f[0])
        self.encoder2 = TorchUBlock(f[0], f[1], f[1])
        self.encoder3 = TorchUBlock(f[1], f[2], f[2])
        self.encoder4 = TorchUBlock(f[2], f[3], f[3])
        self.bottom = TorchUBlock(f[3], f[3], f[3], (2, 2))
        self.bottom_2 = TorchConvBnRelu(f[3] * 2, f[2])
        self.decoder3 = TorchUBlock(f[2] * 2, f[2], f[1])
        self.decoder2 = TorchUBlock(f[1] * 2, f[1], f[0])
        self.decoder1 = TorchUBlock(f[0] * 2, f[0], f[0])
        self.outconv = tnn.Conv3d(f[0], 3, 1)

    @staticmethod
    def up(x):
        return F.interpolate(x, scale_factor=2, mode="trilinear",
                             align_corners=True)

    def forward(self, x):
        d1 = self.encoder1(x)
        d2 = self.encoder2(F.max_pool3d(d1, 2))
        d3 = self.encoder3(F.max_pool3d(d2, 2))
        d4 = self.encoder4(F.max_pool3d(d3, 2))
        bottom = self.bottom(d4)
        b2 = self.bottom_2(torch.cat([d4, bottom], 1))
        u3 = self.decoder3(torch.cat([d3, self.up(b2)], 1))
        u2 = self.decoder2(torch.cat([d2, self.up(u3)], 1))
        u1 = self.decoder1(torch.cat([d1, self.up(u2)], 1))
        return self.outconv(u1)


def _copy_cbr(tmod: TorchConvBnRelu, fparams):
    with torch.no_grad():
        k = np.asarray(fparams["conv"]["Conv_0"]["kernel"])  # [kd,kh,kw,in,out]
        tmod.conv.weight.copy_(torch.from_numpy(
            np.transpose(k, (4, 3, 0, 1, 2))))
        tmod.bn.weight.copy_(torch.from_numpy(np.asarray(fparams["bn"]["scale"])))
        tmod.bn.bias.copy_(torch.from_numpy(np.asarray(fparams["bn"]["bias"])))


def _copy_ublock(tmod: TorchUBlock, fparams):
    _copy_cbr(tmod.b1, fparams["ConvBnRelu1"])
    _copy_cbr(tmod.b2, fparams["ConvBnRelu2"])


def test_equiunet_forward_matches_torch(rng):
    model = EquiUnet(features=F4, num_classes=3, act="relu", norm="group",
                     deep_supervision=False, remat=False)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    tm = TorchEquiUnet(F4).eval()
    for name in ("encoder1", "encoder2", "encoder3", "encoder4", "bottom",
                 "decoder3", "decoder2", "decoder1"):
        _copy_ublock(getattr(tm, name), params[name])
    _copy_cbr(tm.bottom_2, params["bottom_2"])
    with torch.no_grad():
        k = np.asarray(params["outconv"]["Conv_0"]["kernel"])
        tm.outconv.weight.copy_(torch.from_numpy(
            np.transpose(k, (4, 3, 0, 1, 2))))
        tm.outconv.bias.copy_(torch.from_numpy(
            np.asarray(params["outconv"]["Conv_0"]["bias"])))

    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    want = np.moveaxis(want, 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    # and much tighter in practice:
    assert np.abs(got - want).max() < 2e-4


# ---------------------------------------------------------------------------
# EquiUnetASSPEvo — the flagship Model-6 architecture (equiunet2021.py:225-333)
# vs an identically-weighted torch replica, incl. deep-supervision heads.
# ---------------------------------------------------------------------------


class TorchEvoNorm3D(tnn.Module):
    """EvoNorm-S0, efficient swish, unbiased group variance
    (equiunet2021.py:41-52, 95-103)."""

    def __init__(self, c, groups=8, eps=1e-5):
        super().__init__()
        self.g = min(groups, c)
        self.eps = eps
        self.gamma = tnn.Parameter(torch.ones(1, c, 1, 1, 1))
        self.beta = tnn.Parameter(torch.zeros(1, c, 1, 1, 1))

    def forward(self, x):
        n, c, d, h, w = x.shape
        xg = x.reshape(n, self.g, c // self.g, d, h, w)
        var = xg.var(dim=(2, 3, 4, 5), keepdim=True, unbiased=True)
        std = (var + self.eps).sqrt().expand_as(xg).reshape(x.shape)
        return x * torch.sigmoid(x) / std * self.gamma + self.beta


class TorchResidualSE(tnn.Module):
    """MONAI ResidualSELayer r=2 (equiunet2021.py:204-205)."""

    def __init__(self, c, r=2):
        super().__init__()
        self.fc1 = tnn.Linear(c, c // r)
        self.fc2 = tnn.Linear(c // r, c)

    def forward(self, x):
        s = x.mean(dim=(2, 3, 4))
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x + x * s[:, :, None, None, None]


class TorchConvEvo(tnn.Module):
    """conv(k, dilated) → EvoNorm (equiunet2021.py:212-222)."""

    def __init__(self, cin, cout, k=1, dilation=1):
        super().__init__()
        pad = dilation * (k - 1) // 2
        self.conv = tnn.Conv3d(cin, cout, k, padding=pad, dilation=dilation)
        self.evo = TorchEvoNorm3D(cout)

    def forward(self, x):
        return self.evo(self.conv(x))


class TorchConvEvoBlock(tnn.Module):
    """(conv3 → EvoNorm) ×2 → ResidualSE (equiunet2021.py:192-209)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv3d(cin, cout, 3, padding=1)
        self.evo1 = TorchEvoNorm3D(cout)
        self.conv2 = tnn.Conv3d(cout, cout, 3, padding=1)
        self.evo2 = TorchEvoNorm3D(cout)
        self.se = TorchResidualSE(cout)

    def forward(self, x):
        return self.se(self.evo2(self.conv2(self.evo1(self.conv1(x)))))


class TorchASPPEvo(tnn.Module):
    """SimpleASPPEVO (equiunet2021.py:121-189): k=(1,3,3,3), d=(1,2,4,6)."""

    def __init__(self, cin, q):
        super().__init__()
        self.convs = tnn.ModuleList()
        for k, d in zip((1, 3, 3, 3), (1, 2, 4, 6)):
            self.convs.append(
                tnn.Conv3d(cin, q, k, padding=d * (k - 1) // 2, dilation=d))
        self.conv_k1 = TorchConvEvo(4 * q, 4 * q, 1)

    def forward(self, x):
        return self.conv_k1(torch.cat([m(x) for m in self.convs], dim=1))


class TorchEquiUnetASSPEvo(tnn.Module):
    """Reference EquiUnetASSPEvo forward (equiunet2021.py:289-333) with
    channel-doubling MaxAvgPool downsample, half-width bridges, ASPP
    bottleneck and deep supervision at up3/up2."""

    def __init__(self, f):
        super().__init__()
        self.encoder1 = TorchConvEvoBlock(4, f[0])
        self.encoder2 = TorchConvEvoBlock(2 * f[0], f[1])
        self.encoder3 = TorchConvEvoBlock(2 * f[1], f[2])
        self.encoder4 = TorchConvEvoBlock(2 * f[2], f[3])
        self.aspp = TorchASPPEvo(f[3], f[3] // 4)
        self.bridge1 = TorchConvEvo(f[0], f[0] // 2)
        self.bridge2 = TorchConvEvo(f[1], f[1] // 2)
        self.bridge3 = TorchConvEvo(f[2], f[2] // 2)
        self.upconv3 = TorchConvEvo(f[3], f[3] // 4)
        self.decoder3 = TorchConvEvoBlock(f[2] // 2 + f[3] // 4, f[2])
        self.upconv2 = TorchConvEvo(f[2], f[2] // 4)
        self.decoder2 = TorchConvEvoBlock(f[1] // 2 + f[2] // 4, f[1])
        self.upconv1 = TorchConvEvo(f[1], f[1] // 4)
        self.decoder1 = TorchConvEvoBlock(f[0] // 2 + f[1] // 4, f[0])
        self.out_conv = tnn.Conv3d(f[0], 3, 1)
        self.deep3 = tnn.Conv3d(f[2], 3, 1)
        self.deep2 = tnn.Conv3d(f[1], 3, 1)

    @staticmethod
    def down(x):
        return torch.cat([F.max_pool3d(x, 2), F.avg_pool3d(x, 2)], dim=1)

    @staticmethod
    def up(x, s=2):
        return F.interpolate(x, scale_factor=s, mode="trilinear",
                             align_corners=True)

    def forward(self, x):
        d1 = self.encoder1(x)
        d2 = self.encoder2(self.down(d1))
        d3 = self.encoder3(self.down(d2))
        d4 = self.encoder4(self.down(d3))
        a = self.aspp(d4)
        u3 = self.decoder3(
            torch.cat([self.bridge3(d3), self.up(self.upconv3(a))], 1))
        u2 = self.decoder2(
            torch.cat([self.bridge2(d2), self.up(self.upconv2(u3))], 1))
        u1 = self.decoder1(
            torch.cat([self.bridge1(d1), self.up(self.upconv1(u2))], 1))
        out = self.out_conv(u1)
        deeps = [self.up(self.deep3(u3), 4), self.up(self.deep2(u2), 2)]
        return out, deeps


def _copy_conv(tconv, fconv):
    with torch.no_grad():
        k = np.asarray(fconv["Conv_0"]["kernel"])  # [kd,kh,kw,in,out]
        tconv.weight.copy_(torch.from_numpy(np.transpose(k, (4, 3, 0, 1, 2))))
        if "bias" in fconv["Conv_0"]:
            tconv.bias.copy_(torch.from_numpy(
                np.asarray(fconv["Conv_0"]["bias"])))


def _copy_evo(tevo, fevo):
    with torch.no_grad():
        c = np.asarray(fevo["gamma"]).shape[0]
        tevo.gamma.copy_(torch.from_numpy(
            np.asarray(fevo["gamma"]).reshape(1, c, 1, 1, 1)))
        tevo.beta.copy_(torch.from_numpy(
            np.asarray(fevo["beta"]).reshape(1, c, 1, 1, 1)))


def _copy_dense(tlin, fdense):
    with torch.no_grad():
        tlin.weight.copy_(torch.from_numpy(np.asarray(fdense["kernel"]).T))
        tlin.bias.copy_(torch.from_numpy(np.asarray(fdense["bias"])))


def _copy_convevo(tmod, fparams):
    _copy_conv(tmod.conv, fparams["conv"])
    _copy_evo(tmod.evo, fparams["evo"])


def _copy_block(tmod, fparams):
    _copy_conv(tmod.conv1, fparams["conv1"])
    _copy_evo(tmod.evo1, fparams["evo1"])
    _copy_conv(tmod.conv2, fparams["conv2"])
    _copy_evo(tmod.evo2, fparams["evo2"])
    _copy_dense(tmod.se.fc1, fparams["se"]["fc1"])
    _copy_dense(tmod.se.fc2, fparams["se"]["fc2"])


def test_equiunet_assp_evo_forward_matches_torch(rng):
    """Whole-model golden for the flagship (VERDICT round-1 missing #3):
    identical weights, fp32, deep supervision on, agreement < 1e-3."""
    from brats21_tpu.models.assp_evo import EquiUnetASSPEvo

    model = EquiUnetASSPEvo(features=F4, num_classes=3,
                            deep_supervision=True, remat=False)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    tm = TorchEquiUnetASSPEvo(F4).eval()
    for name in ("encoder1", "encoder2", "encoder3", "encoder4",
                 "decoder3", "decoder2", "decoder1"):
        _copy_block(getattr(tm, name), params[name])
    for name in ("bridge1", "bridge2", "bridge3",
                 "upconv3", "upconv2", "upconv1"):
        _copy_convevo(getattr(tm, name), params[name])
    for i in range(4):
        _copy_conv(tm.aspp.convs[i], params["aspp"][f"conv_{i}"])
    _copy_convevo(tm.aspp.conv_k1, params["aspp"]["conv_k1"])
    _copy_conv(tm.out_conv, params["out_conv"])
    _copy_conv(tm.deep3, params["deep3"]["conv"])
    _copy_conv(tm.deep2, params["deep2"]["conv"])

    out, deeps = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        want_out, want_deeps = tm(torch.from_numpy(np.moveaxis(x, -1, 1)))

    got = np.asarray(out)
    want = np.moveaxis(want_out.numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    assert np.abs(got - want).max() < 2e-4  # much tighter in practice
    for g, w in zip(deeps, want_deeps):
        w = np.moveaxis(w.numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# UNETR's whole-model torch golden lives in tests/test_import_zoo.py
# (test_import_unetr): the model was realigned to MONAI 0.6's exact
# module graph (bias-free fused qkv, taps after blocks 4/7/10, closing
# vit.norm, res-block decoder) and is parity-tested there in the
# import direction against a MONAI-named randomized replica.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# SegResNet — the MONAI-backed zoo family (models/extra.py; MONAI SegResNet
# defaults of definer.py:85-99) vs an identically-weighted torch replica:
# GN→relu→conv residual blocks, strided-conv downs, 1×1-conv + trilinear
# (align_corners=False) ups. Validates the zoo's shared layer stack
# (GroupNorm, strided/1×1 convs, the custom trilinear upsample).
# ---------------------------------------------------------------------------


class TorchSegResBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm1 = tnn.GroupNorm(min(8, c), c)
        self.conv1 = tnn.Conv3d(c, c, 3, padding=1, bias=False)
        self.norm2 = tnn.GroupNorm(min(8, c), c)
        self.conv2 = tnn.Conv3d(c, c, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return x + y


class TorchSegResNet(tnn.Module):
    def __init__(self, f=8, num_classes=3,
                 blocks_down=(1, 2, 2, 4), blocks_up=(1, 1, 1)):
        super().__init__()
        self.blocks_down, self.blocks_up = blocks_down, blocks_up
        self.conv_init = tnn.Conv3d(4, f, 3, padding=1, bias=False)
        self.downs = tnn.ModuleList()
        self.down_blocks = tnn.ModuleList()
        for i, n in enumerate(blocks_down):
            ch = f * 2 ** i
            self.downs.append(
                tnn.Conv3d(ch // 2, ch, 3, stride=2, padding=1, bias=False)
                if i > 0 else tnn.Identity())
            self.down_blocks.append(
                tnn.ModuleList([TorchSegResBlock(ch) for _ in range(n)]))
        self.up_convs = tnn.ModuleList()
        self.up_blocks = tnn.ModuleList()
        for i, n in enumerate(blocks_up):
            ch = f * 2 ** (len(blocks_down) - i - 2)
            self.up_convs.append(tnn.Conv3d(ch * 2, ch, 1, bias=False))
            self.up_blocks.append(
                tnn.ModuleList([TorchSegResBlock(ch) for _ in range(n)]))
        last = f * 2 ** (len(blocks_down) - len(blocks_up) - 1)
        self.norm_final = tnn.GroupNorm(min(8, last), last)
        self.conv_final = tnn.Conv3d(last, num_classes, 1, bias=True)

    def forward(self, x):
        x = self.conv_init(x)
        skips = []
        for i in range(len(self.blocks_down)):
            x = self.downs[i](x)
            for blk in self.down_blocks[i]:
                x = blk(x)
            skips.append(x)
        for i in range(len(self.blocks_up)):
            x = self.up_convs[i](x)
            x = F.interpolate(x, scale_factor=2, mode="trilinear",
                              align_corners=False)
            x = x + skips[len(self.blocks_down) - i - 2]
            for blk in self.up_blocks[i]:
                x = blk(x)
        return self.conv_final(F.relu(self.norm_final(x)))


def _copy_plain_conv(tconv, fparams):
    with torch.no_grad():
        k = np.asarray(fparams["Conv_0"]["kernel"])
        tconv.weight.copy_(torch.from_numpy(
            np.transpose(k, (4, 3, 0, 1, 2)).copy()))
        if "bias" in fparams["Conv_0"]:
            tconv.bias.copy_(torch.from_numpy(
                np.asarray(fparams["Conv_0"]["bias"])))


def _copy_gn(tgn, fparams):
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(np.asarray(fparams["scale"])))
        tgn.bias.copy_(torch.from_numpy(np.asarray(fparams["bias"])))


def _copy_segres_block(tblk, fparams):
    _copy_gn(tblk.norm1, fparams["norm1"])
    _copy_plain_conv(tblk.conv1, fparams["conv1"])
    _copy_gn(tblk.norm2, fparams["norm2"])
    _copy_plain_conv(tblk.conv2, fparams["conv2"])


def test_segresnet_forward_matches_torch(rng):
    """Whole-model golden #4: the MONAI-backed zoo's SegResNet. Identical
    weights, fp32, 16³ volume, agreement < 1e-3."""
    from brats21_tpu.models.extra import SegResNet

    model = SegResNet(init_filters=8, num_classes=3)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    tm = TorchSegResNet().eval()
    _copy_plain_conv(tm.conv_init, params["conv_init"])
    for i, n in enumerate((1, 2, 2, 4)):
        if i > 0:
            _copy_plain_conv(tm.downs[i], params[f"down_{i}"])
        for j in range(n):
            _copy_segres_block(tm.down_blocks[i][j],
                               params[f"down_{i}_block_{j}"])
    for i in range(3):
        _copy_plain_conv(tm.up_convs[i], params[f"up_conv_{i}"])
        _copy_segres_block(tm.up_blocks[i][0], params[f"up_{i}_block_0"])
    _copy_gn(tm.norm_final, params["norm_final"])
    _copy_plain_conv(tm.conv_final, params["conv_final"])

    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    want = np.moveaxis(want, 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    assert np.abs(got - want).max() < 2e-4  # much tighter in practice
