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


# -------------------------------------------------- HighResNet / VNet
# Their whole-model torch goldens live in tests/test_import_zoo.py
# (test_import_highresnet / test_import_vnet): both models were
# realigned to MONAI 0.6's exact semantics (real batch-norm running
# stats, MONAI's LUConv depths and post-residual activations, biased
# convs) and are parity-tested there in the import direction against
# MONAI-named randomized replicas.


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
