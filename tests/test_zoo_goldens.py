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
        # upcat i: (cin, skip, up_ch, out_ch); upcat_1 is halves=False in
        # MONAI (the deconv keeps f[1] channels, TwoConv narrows to f[5])
        chans = [(f[4], f[3], f[3], f[3]), (f[3], f[2], f[2], f[2]),
                 (f[2], f[1], f[1], f[1]), (f[1], f[0], f[1], f[5])]
        self.upconvs = tnn.ModuleList(
            [tnn.ConvTranspose3d(cin, up_ch, 2, stride=2)
             for cin, _, up_ch, _ in chans])
        self.upconvs2 = tnn.ModuleList(
            [TorchTwoConv(skip + up_ch, out_ch)
             for _, skip, up_ch, out_ch in chans])
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


# ------------------------------------------------------------- R2AttUnet
# One golden covers ALL unet_family blocks (models/unet_family.py;
# reference networks/unet_family.py:405-500): shared-weight recurrent
# convs, RRCNN residuals, additive attention gates (BatchNorm'd, eval
# stats), nearest-upsample UpConv, and the 4-head deep supervision.


class TorchRecurrent(tnn.Module):
    def __init__(self, ch, t=2):
        super().__init__()
        self.t = t
        self.conv = tnn.Conv3d(ch, ch, 3, padding=1)
        self.norm = tnn.GroupNorm(8, ch)

    def step(self, v):
        return F.relu(self.norm(self.conv(v)))

    def forward(self, x):
        x1 = self.step(x)
        for _ in range(self.t):
            x1 = self.step(x + x1)
        return x1


class TorchRRCNN(tnn.Module):
    def __init__(self, cin, ch, t=2):
        super().__init__()
        self.conv_1x1 = tnn.Conv3d(cin, ch, 1)
        self.rec1 = TorchRecurrent(ch, t)
        self.rec2 = TorchRecurrent(ch, t)

    def forward(self, x):
        x = self.conv_1x1(x)
        return x + self.rec2(self.rec1(x))


class TorchUpConv(tnn.Module):
    def __init__(self, cin, ch):
        super().__init__()
        self.conv = tnn.Conv3d(cin, ch, 3, padding=1)
        self.norm = tnn.GroupNorm(8, ch)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        return F.relu(self.norm(self.conv(x)))


class TorchAttGate(tnn.Module):
    def __init__(self, fg, fx, f_int):
        super().__init__()
        self.W_g = tnn.Conv3d(fg, f_int, 1)
        self.bn_g = tnn.BatchNorm3d(f_int)
        self.W_x = tnn.Conv3d(fx, f_int, 1)
        self.bn_x = tnn.BatchNorm3d(f_int)
        self.psi = tnn.Conv3d(f_int, 1, 1)
        self.bn_psi = tnn.BatchNorm3d(1)

    def forward(self, g, x):
        a = F.relu(self.bn_g(self.W_g(g)) + self.bn_x(self.W_x(x)))
        return x * torch.sigmoid(self.bn_psi(self.psi(a)))


class TorchR2AttUnet(tnn.Module):
    def __init__(self, f, num_classes=3, t=2):
        super().__init__()
        self.Conv1 = TorchRRCNN(4, f[0], t)
        self.Conv2 = TorchRRCNN(f[0], f[1], t)
        self.Conv3 = TorchRRCNN(f[1], f[2], t)
        self.Conv4 = TorchRRCNN(f[2], f[3], t)
        self.Up4 = TorchUpConv(f[3], f[2])
        self.Att4 = TorchAttGate(f[2], f[2], f[1])
        self.Up_conv4 = TorchRRCNN(f[2] * 2, f[2], t)
        self.Up3 = TorchUpConv(f[2], f[1])
        self.Att3 = TorchAttGate(f[1], f[1], f[0])
        self.Up_conv3 = TorchRRCNN(f[1] * 2, f[1], t)
        self.Up2 = TorchUpConv(f[1], f[0])
        self.Att2 = TorchAttGate(f[0], f[0], max(f[0] // 2, 1))
        self.Up_conv2 = TorchRRCNN(f[0] * 2, f[0], t)
        self.Conv_1x1 = tnn.Conv3d(f[0], num_classes, 1)
        self.outconv4 = tnn.Conv3d(f[3], num_classes, 1)
        self.outconv3 = tnn.Conv3d(f[2], num_classes, 1)
        self.outconv2 = tnn.Conv3d(f[1], num_classes, 1)

    def forward(self, x):
        x1 = self.Conv1(x)
        x2 = self.Conv2(F.max_pool3d(x1, 2))
        x3 = self.Conv3(F.max_pool3d(x2, 2))
        x4 = self.Conv4(F.max_pool3d(x3, 2))
        d4 = self.Up4(x4)
        x3g = self.Att4(d4, x3)
        d4u = self.Up_conv4(torch.cat([x3g, d4], 1))
        d3 = self.Up3(d4u)
        x2g = self.Att3(d3, x2)
        d3u = self.Up_conv3(torch.cat([x2g, d3], 1))
        d2 = self.Up2(d3u)
        x1g = self.Att2(d2, x1)
        d2u = self.Up_conv2(torch.cat([x1g, d2], 1))
        d1 = self.Conv_1x1(d2u)

        def up(y, s):
            return F.interpolate(y, scale_factor=s, mode="nearest")

        return d1, [up(self.outconv2(d3u), 2), up(self.outconv3(d4u), 4),
                    up(self.outconv4(x4), 8)]


def test_r2attunet_matches_torch(rng):
    from brats21_tpu.models.unet_family import R2AttUnet

    f = [8, 16, 32, 64]
    model = R2AttUnet(features=f, num_classes=3, deep_supervision=True)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(13), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tm = TorchR2AttUnet(f).eval()

    def copy_rec(tmod, fp):
        _copy_conv(tmod.conv, fp["conv"])
        _copy_norm(tmod.norm, fp["norm"])

    def copy_rrcnn(tmod, fp):
        _copy_conv(tmod.conv_1x1, fp["conv_1x1"])
        copy_rec(tmod.rec1, fp["rec1"])
        copy_rec(tmod.rec2, fp["rec2"])

    def copy_att(tmod, fp):
        # the gate's BatchNorms nest one level deeper (layers.BatchNorm
        # wraps flax's under "BatchNorm_0")
        _copy_conv(tmod.W_g, fp["W_g"])
        _copy_norm(tmod.bn_g, fp["bn_g"]["BatchNorm_0"])
        _copy_conv(tmod.W_x, fp["W_x"])
        _copy_norm(tmod.bn_x, fp["bn_x"]["BatchNorm_0"])
        _copy_conv(tmod.psi, fp["psi"])
        _copy_norm(tmod.bn_psi, fp["bn_psi"]["BatchNorm_0"])

    for name in ("Conv1", "Conv2", "Conv3", "Conv4",
                 "Up_conv4", "Up_conv3", "Up_conv2"):
        copy_rrcnn(getattr(tm, name), params[name])
    for name in ("Up4", "Up3", "Up2"):
        _copy_conv(getattr(tm, name).conv, params[name]["conv"])
        _copy_norm(getattr(tm, name).norm, params[name]["norm"])
    for name in ("Att4", "Att3", "Att2"):
        copy_att(getattr(tm, name), params[name])
    for name in ("Conv_1x1", "outconv4", "outconv3", "outconv2"):
        _copy_conv(getattr(tm, name), params[name])

    d1, heads = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        td1, theads = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    np.testing.assert_allclose(np.asarray(d1),
                               np.moveaxis(td1.numpy(), 1, -1),
                               atol=1e-3, rtol=1e-3)
    assert np.abs(np.asarray(d1)
                  - np.moveaxis(td1.numpy(), 1, -1)).max() < 2e-4
    for g, w in zip(heads, theads):
        np.testing.assert_allclose(np.asarray(g),
                                   np.moveaxis(w.numpy(), 1, -1),
                                   atol=1e-3, rtol=1e-3)


# --------------------------------------------------------------- DynUNet
# nnU-Net-style configurable U-Net (models/dynunet.py; reference
# WrapperDynUNet, unet_family.py:503-523): strided-conv downs,
# transposed-conv ups, nearest-upsampled deep supervision heads.


class TorchDynCNA(tnn.Module):
    def __init__(self, cin, ch, stride=1):
        super().__init__()
        self.conv = tnn.Conv3d(cin, ch, 3, stride=stride, padding=1,
                               bias=False)
        self.norm = tnn.InstanceNorm3d(ch, eps=1e-5, affine=True)

    def forward(self, x):
        return F.leaky_relu(self.norm(self.conv(x)), 0.01)


class TorchDynBlock(tnn.Module):
    def __init__(self, cin, ch, stride=1):
        super().__init__()
        self.layer0 = TorchDynCNA(cin, ch, stride)
        self.layer1 = TorchDynCNA(ch, ch, 1)

    def forward(self, x):
        return self.layer1(self.layer0(x))


class TorchDynUNet(tnn.Module):
    def __init__(self, levels=5, num_classes=3, deep_supr=3):
        super().__init__()
        self.levels, self.deep_supr = levels, deep_supr
        filters = [min(32 * 2 ** i, 320) for i in range(levels)]
        self.input_block = TorchDynBlock(4, filters[0])
        self.downs = tnn.ModuleList(
            [TorchDynBlock(filters[i - 1], filters[i], 2)
             for i in range(1, levels)])
        self.transps = tnn.ModuleList()
        self.up_blocks = tnn.ModuleList()
        for i in range(levels - 2, -1, -1):
            self.transps.append(
                tnn.ConvTranspose3d(filters[i + 1], filters[i], 2, stride=2,
                                    bias=False))
            self.up_blocks.append(TorchDynBlock(filters[i] * 2, filters[i]))
        self.out_main = tnn.Conv3d(filters[0], num_classes, 1)
        self.out_deeps = tnn.ModuleList(
            [tnn.Conv3d(filters[j], num_classes, 1)
             for j in range(1, 1 + deep_supr)])

    def forward(self, x):
        y = self.input_block(x)
        skips = [y]
        for i, d in enumerate(self.downs):
            y = d(y)
            if i < len(self.downs) - 1:
                skips.append(y)
        heads = []
        for j, i in enumerate(range(self.levels - 2, -1, -1)):
            y = self.transps[j](y)
            y = self.up_blocks[j](torch.cat([y, skips[i]], 1))
            heads.append((i, y))
        main = self.out_main(heads[-1][1])
        deeps = []
        for j in range(2, 2 + self.deep_supr):
            lvl, feat = heads[-j]
            h = self.out_deeps[j - 2](feat)
            deeps.append(F.interpolate(h, scale_factor=2 ** lvl,
                                       mode="nearest"))
        return main, deeps


def test_dynunet_matches_torch(rng):
    from brats21_tpu.models.dynunet import DynUNet

    levels = 5
    model = DynUNet(num_classes=3, deep_supr_num=3, levels=levels)
    # 32^3: the deepest level keeps 2^3 (torch InstanceNorm3d needs >1)
    x = rng.standard_normal((1, 32, 32, 32, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(14), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tm = TorchDynUNet(levels).eval()

    def copy_block(tmod, fp):
        for lname in ("layer0", "layer1"):
            _copy_conv(getattr(tmod, lname).conv, fp[lname]["conv"])
            _copy_norm(getattr(tmod, lname).norm, fp[lname]["norm"])

    copy_block(tm.input_block, params["input_block"])
    for i in range(1, levels):
        copy_block(tm.downs[i - 1], params[f"down_{i}"])
    for j, i in enumerate(range(levels - 2, -1, -1)):
        _copy_deconv(tm.transps[j], params[f"up_{i}_transp"])
        copy_block(tm.up_blocks[j], params[f"up_{i}_block"])
    _copy_conv(tm.out_main, params["out_main"])
    for j in range(1, 4):
        _copy_conv(tm.out_deeps[j - 1], params[f"out_deep_{j}"])

    main, deeps = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        tmain, tdeeps = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    got = np.asarray(main)
    want = np.moveaxis(tmain.numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    assert np.abs(got - want).max() < 2e-4
    for g, w in zip(deeps, tdeeps):
        np.testing.assert_allclose(np.asarray(g),
                                   np.moveaxis(w.numpy(), 1, -1),
                                   atol=1e-3, rtol=1e-3)
