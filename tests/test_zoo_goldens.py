"""Whole-model torch goldens for the remaining MONAI-backed zoo families
(models/extra.py: BasicUNet, HighResNet, VNet) — identically-weighted
channels-first torch replicas, fp32, agreement < 1e-3 (in practice
< 2e-4). With these, EVERY model family in the zoo has a cross-framework
whole-model golden (see test_full_model_parity.py for EquiUnet,
EquiUnetASSPEvo, UNETR, SegResNet)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


# ------------------------------------------------------------ copy helpers

def _copy_conv(tconv, fparams):
    with torch.no_grad():
        k = np.asarray(fparams["Conv_0"]["kernel"])
        tconv.weight.copy_(torch.from_numpy(
            np.transpose(k, (4, 3, 0, 1, 2)).copy()))
        if "bias" in fparams["Conv_0"]:
            tconv.bias.copy_(torch.from_numpy(
                np.asarray(fparams["Conv_0"]["bias"])))


def _copy_norm(tnorm, fparams):
    with torch.no_grad():
        tnorm.weight.copy_(torch.from_numpy(np.asarray(fparams["scale"])))
        tnorm.bias.copy_(torch.from_numpy(np.asarray(fparams["bias"])))


def _copy_deconv(tmod, fparams):
    # flax ConvTranspose (kd,kh,kw,in,out) -> torch (in,out,kd,kh,kw),
    # spatial dims flipped (lax.conv_transpose does not flip kernels)
    with torch.no_grad():
        k = np.asarray(fparams["kernel"])[::-1, ::-1, ::-1]
        tmod.weight.copy_(torch.from_numpy(
            np.transpose(k.copy(), (3, 4, 0, 1, 2))))
        if "bias" in fparams:
            tmod.bias.copy_(torch.from_numpy(np.asarray(fparams["bias"])))


def _run_pair(model, tm, x, key):
    variables = model.init(jax.random.PRNGKey(key), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    return variables, params


def _assert_match(model, variables, tm, x):
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    want = np.moveaxis(want, 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    assert np.abs(got - want).max() < 2e-4


# --------------------------------------------------------------- BasicUNet

class TorchTwoConv(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv_0 = tnn.Conv3d(cin, cout, 3, padding=1)
        self.norm_0 = tnn.InstanceNorm3d(cout, eps=1e-5, affine=True)
        self.conv_1 = tnn.Conv3d(cout, cout, 3, padding=1)
        self.norm_1 = tnn.InstanceNorm3d(cout, eps=1e-5, affine=True)

    def forward(self, x):
        x = F.leaky_relu(self.norm_0(self.conv_0(x)), 0.01)
        return F.leaky_relu(self.norm_1(self.conv_1(x)), 0.01)


class TorchBasicUNet(tnn.Module):
    def __init__(self, f, num_classes=3):
        super().__init__()
        self.conv_0 = TorchTwoConv(4, f[0])
        self.down = tnn.ModuleList(
            [TorchTwoConv(f[i], f[i + 1]) for i in range(4)])
        # upcat i: input (x_next, skip) -> ConvTranspose(ch) + TwoConv(ch)
        chans = [(f[4], f[3], f[3]), (f[3], f[2], f[2]),
                 (f[2], f[1], f[1]), (f[1], f[0], f[5])]
        self.upconvs = tnn.ModuleList(
            [tnn.ConvTranspose3d(cin, ch, 2, stride=2)
             for cin, _, ch in chans])
        self.upconvs2 = tnn.ModuleList(
            [TorchTwoConv(skip + ch, ch) for _, skip, ch in chans])
        self.final = tnn.Conv3d(f[5], num_classes, 1)

    def forward(self, x):
        skips = [self.conv_0(x)]
        for d in self.down:
            skips.append(d(F.max_pool3d(skips[-1], 2)))
        y = skips[4]
        for i in range(4):
            up = self.upconvs[i](y)
            y = self.upconvs2[i](torch.cat([skips[3 - i], up], 1))
        return self.final(y)


def test_basic_unet_matches_torch(rng):
    from brats21_tpu.models.extra import BasicUNet

    f = [4, 8, 16, 32, 64, 4]
    model = BasicUNet(features=f, num_classes=3)
    # 32^3: the deepest level must keep >1 spatial element — torch
    # InstanceNorm3d raises on 1^3 inputs (flax's handles them)
    x = rng.standard_normal((1, 32, 32, 32, 4)).astype(np.float32)
    tm = TorchBasicUNet(f).eval()
    variables, params = _run_pair(model, tm, x, 10)

    def copy_two(tmod, fp):
        _copy_conv(tmod.conv_0, fp["conv_0"])
        _copy_norm(tmod.norm_0, fp["norm_0"])
        _copy_conv(tmod.conv_1, fp["conv_1"])
        _copy_norm(tmod.norm_1, fp["norm_1"])

    copy_two(tm.conv_0, params["conv_0"])
    for i in range(4):
        copy_two(tm.down[i], params[f"down_{i + 1}"])
    for i, name in enumerate(["upcat_4", "upcat_3", "upcat_2", "upcat_1"]):
        _copy_deconv(tm.upconvs[i], params[f"{name}_upconv"])
        copy_two(tm.upconvs2[i], params[f"{name}_convs"])
    _copy_conv(tm.final, params["final_conv"])
    _assert_match(model, variables, tm, x)


# -------------------------------------------------------------- HighResNet

class TorchHighResBlock(tnn.Module):
    def __init__(self, cin, ch, dilation):
        super().__init__()
        self.norm_0 = tnn.InstanceNorm3d(cin, eps=1e-5, affine=True)
        self.conv_0 = tnn.Conv3d(cin, ch, 3, padding=dilation,
                                 dilation=dilation, bias=False)
        self.norm_1 = tnn.InstanceNorm3d(ch, eps=1e-5, affine=True)
        self.conv_1 = tnn.Conv3d(ch, ch, 3, padding=dilation,
                                 dilation=dilation, bias=False)
        self.pad = ch - cin

    def forward(self, x):
        y = self.conv_0(F.relu(self.norm_0(x)))
        y = self.conv_1(F.relu(self.norm_1(y)))
        if self.pad:
            x = F.pad(x, (0, 0, 0, 0, 0, 0, 0, self.pad))
        return x + y


class TorchHighResNet(tnn.Module):
    def __init__(self, num_classes=3):
        super().__init__()
        self.conv_init = tnn.Conv3d(4, 16, 3, padding=1, bias=False)
        self.norm_init = tnn.InstanceNorm3d(16, eps=1e-5, affine=True)
        blocks, cin = [], 16
        for ch, dil in [(16, 1), (32, 2), (64, 4)]:
            for _ in range(3):
                blocks.append(TorchHighResBlock(cin, ch, dil))
                cin = ch
        self.blocks = tnn.ModuleList(blocks)
        self.conv_penult = tnn.Conv3d(64, 80, 1, bias=False)
        self.norm_penult = tnn.InstanceNorm3d(80, eps=1e-5, affine=True)
        self.conv_final = tnn.Conv3d(80, num_classes, 1)

    def forward(self, x):
        x = F.relu(self.norm_init(self.conv_init(x)))
        for b in self.blocks:
            x = b(x)
        x = F.relu(self.norm_penult(self.conv_penult(x)))
        return self.conv_final(x)


def test_highresnet_matches_torch(rng):
    from brats21_tpu.models.extra import HighResNet

    model = HighResNet(num_classes=3)
    x = rng.standard_normal((1, 12, 12, 12, 4)).astype(np.float32)
    tm = TorchHighResNet().eval()
    variables, params = _run_pair(model, tm, x, 11)

    _copy_conv(tm.conv_init, params["conv_init"])
    _copy_norm(tm.norm_init, params["norm_init"])
    bi = 0
    for gi in range(3):
        for j in range(3):
            fp = params[f"res_{gi}_{j}"]
            _copy_norm(tm.blocks[bi].norm_0, fp["norm_0"])
            _copy_conv(tm.blocks[bi].conv_0, fp["conv_0"])
            _copy_norm(tm.blocks[bi].norm_1, fp["norm_1"])
            _copy_conv(tm.blocks[bi].conv_1, fp["conv_1"])
            bi += 1
    _copy_conv(tm.conv_penult, params["conv_penult"])
    _copy_norm(tm.norm_penult, params["norm_penult"])
    _copy_conv(tm.conv_final, params["conv_final"])
    _assert_match(model, variables, tm, x)


# -------------------------------------------------------------------- VNet

class TorchVNetConvs(tnn.Module):
    def __init__(self, cin, ch, n):
        super().__init__()
        self.convs = tnn.ModuleList()
        self.norms = tnn.ModuleList()
        for i in range(n):
            self.convs.append(tnn.Conv3d(cin if i == 0 else ch, ch, 5,
                                         padding=2))
            self.norms.append(tnn.InstanceNorm3d(ch, eps=1e-5, affine=True))

    def forward(self, x):
        for conv, norm in zip(self.convs, self.norms):
            x = F.elu(norm(conv(x)))
        return x


class TorchVNet(tnn.Module):
    widths = (16, 32, 64, 128, 256)
    depths = (1, 2, 3, 3, 3)

    def __init__(self, num_classes=3):
        super().__init__()
        w, d = self.widths, self.depths
        self.in_tr = TorchVNetConvs(4, w[0], d[0])
        self.down_convs = tnn.ModuleList()
        self.down_norms = tnn.ModuleList()
        self.down_trs = tnn.ModuleList()
        for i in range(1, 5):
            self.down_convs.append(tnn.Conv3d(w[i - 1], w[i], 2, stride=2))
            self.down_norms.append(
                tnn.InstanceNorm3d(w[i], eps=1e-5, affine=True))
            self.down_trs.append(TorchVNetConvs(w[i], w[i], d[i]))
        self.up_convs = tnn.ModuleList()
        self.up_norms = tnn.ModuleList()
        self.up_trs = tnn.ModuleList()
        y_ch = w[4]                 # decoder input grows: y = convs+cat
        for i in range(4, 0, -1):
            cat_ch = w[i] // 2 + w[i - 1]
            self.up_convs.append(
                tnn.ConvTranspose3d(y_ch, w[i] // 2, 2, stride=2))
            self.up_norms.append(
                tnn.InstanceNorm3d(w[i] // 2, eps=1e-5, affine=True))
            self.up_trs.append(
                TorchVNetConvs(cat_ch, cat_ch, d[i] if i > 1 else 1))
            y_ch = cat_ch
        self.out_conv = tnn.Conv3d(y_ch, num_classes, 1)

    def forward(self, x):
        y = self.in_tr(x) + x.repeat(1, self.widths[0] // 4, 1, 1, 1)
        skips = [y]
        for i in range(4):
            down = F.elu(self.down_norms[i](self.down_convs[i](skips[-1])))
            skips.append(self.down_trs[i](down) + down)
        y = skips[-1]
        for j, i in enumerate(range(4, 0, -1)):
            up = F.elu(self.up_norms[j](self.up_convs[j](y)))
            cat = torch.cat([up, skips[i - 1]], 1)
            y = self.up_trs[j](cat) + cat
        return self.out_conv(y)


def test_vnet_matches_torch(rng):
    from brats21_tpu.models.extra import VNet

    model = VNet(num_classes=3)
    x = rng.standard_normal((1, 32, 32, 32, 4)).astype(np.float32)
    tm = TorchVNet().eval()
    variables, params = _run_pair(model, tm, x, 12)

    def copy_vconvs(tmod, prefix, n):
        for i in range(n):
            _copy_conv(tmod.convs[i], params[prefix][f"conv_{i}"])
            _copy_norm(tmod.norms[i], params[prefix][f"norm_{i}"])

    copy_vconvs(tm.in_tr, "in_tr", 1)
    for i in range(1, 5):
        _copy_conv(tm.down_convs[i - 1], params[f"down_conv_{i}"])
        _copy_norm(tm.down_norms[i - 1], params[f"down_norm_{i}"])
        copy_vconvs(tm.down_trs[i - 1], f"down_tr_{i}", TorchVNet.depths[i])
    for j, i in enumerate(range(4, 0, -1)):
        _copy_deconv(tm.up_convs[j], params[f"up_conv_{i}"])
        _copy_norm(tm.up_norms[j], params[f"up_norm_{i}"])
        copy_vconvs(tm.up_trs[j], f"up_tr_{i}",
                    TorchVNet.depths[i] if i > 1 else 1)
    _copy_conv(tm.out_conv, params["out_conv"])
    _assert_match(model, variables, tm, x)
