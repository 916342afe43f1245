"""torch→flax checkpoint import for the MONAI-backed zoo (VERDICT r4 #5).

The reference serves any zoo member's ``best_model.pth``
(src/arguments_inference.py:106-110 + definer.py:49-127, which builds the
nets from monai.networks.nets). These tests build torch replicas whose
module graph — and therefore state_dict key naming — replicates MONAI
0.6.0's (Convolution = Sequential('conv','adn'), ADN norm child 'N',
dynunet conv1/norm1/conv2/norm2, positional ConvNormActi 'layers', ViT
SABlock fused bias-free qkv, ...), randomize every tensor, export the
reference checkpoint payload ``{"model": state_dict}``, import it with
utils/import_torch, and assert forward parity flax-vs-torch.

Each family also exercises a naming edge: BasicUNet the affine-less
instance-norm fallback, DynUNet the wrapper ``net.`` prefix and the
``skip_layers`` shared-module duplicate keys, SegResNetVAE the shared
seg/VAE decoder weights, VNet/HighResNet batch-norm running stats.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from brats21_tpu.config import TrainConfig
from brats21_tpu.models import get_model
from brats21_tpu.utils.import_torch import (import_checkpoint,
                                            load_torch_state_dict,
                                            state_dict_to_flax)

ATOL = 2e-4


def _act(x, name):
    if name is None:
        return x
    return {"relu": F.relu, "elu": F.elu,
            "leakyrelu": lambda t: F.leaky_relu(t, 0.01)}[name](x)


def _randomize(net: tnn.Module, seed: int) -> None:
    """Randomize EVERY tensor (params + batch-norm stats) so any mapping
    error — swapped keys, missing transpose, wrong layer index — shows up
    as a numeric mismatch, not luck."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)


def _save_ckpt(tm: tnn.Module, tmp_path) -> str:
    path = os.path.join(tmp_path, "best_model.pth")
    torch.save({"model": tm.state_dict()}, path)
    return path


def _compare(flax_out, torch_out, atol=ATOL):
    got = np.asarray(flax_out)
    want = np.moveaxis(torch_out.detach().numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


# ------------------------------------------------- MONAI building blocks

class MADN(tnn.Module):
    """MONAI ADN ('NDA' ordering): norm child is named 'N'."""

    def __init__(self, ch, norm, act):
        super().__init__()
        if norm == "instance":        # plain-string MONAI norm: affine=False
            self.N = tnn.InstanceNorm3d(ch)
        elif norm == "batch":
            self.N = tnn.BatchNorm3d(ch)
        else:
            raise ValueError(norm)
        self.act = act

    def forward(self, x):
        return _act(self.N(x), self.act)


class MConvolution(tnn.Module):
    """MONAI blocks.Convolution: children 'conv' (+ 'adn' unless
    conv_only)."""

    def __init__(self, cin, cout, k, stride=1, bias=True, conv_only=False,
                 norm="instance", act="leakyrelu", transposed=False,
                 dilation=1):
        super().__init__()
        if transposed:
            self.conv = tnn.ConvTranspose3d(cin, cout, k, stride, bias=bias)
        else:
            pad = dilation * (k - 1) // 2
            self.conv = tnn.Conv3d(cin, cout, k, stride, pad, bias=bias,
                                   dilation=dilation)
        self.adn = None if conv_only else MADN(cout, norm, act)

    def forward(self, x):
        x = self.conv(x)
        return self.adn(x) if self.adn is not None else x


# ---------------------------------------------------------------- BasicUNet

class MTwoConv(tnn.Module):
    def __init__(self, cin, cout, norm, act):
        super().__init__()
        self.conv_0 = MConvolution(cin, cout, 3, norm=norm, act=act)
        self.conv_1 = MConvolution(cout, cout, 3, norm=norm, act=act)

    def forward(self, x):
        return self.conv_1(self.conv_0(x))


class MDown(tnn.Module):
    def __init__(self, cin, cout, norm, act):
        super().__init__()
        self.max_pooling = tnn.MaxPool3d(2)
        self.convs = MTwoConv(cin, cout, norm, act)

    def forward(self, x):
        return self.convs(self.max_pooling(x))


class MUpCat(tnn.Module):
    def __init__(self, cin, cat_ch, up_ch, cout, norm, act):
        super().__init__()
        self.upsample = tnn.Sequential()
        self.upsample.add_module(
            "deconv", tnn.ConvTranspose3d(cin, up_ch, 2, 2))
        self.convs = MTwoConv(cat_ch + up_ch, cout, norm, act)

    def forward(self, x, skip):
        return self.convs(torch.cat([skip, self.upsample(x)], dim=1))


class MBasicUNet(tnn.Module):
    def __init__(self, f, num_classes=3, norm="instance", act="leakyrelu"):
        super().__init__()
        self.conv_0 = MTwoConv(4, f[0], norm, act)
        self.down_1 = MDown(f[0], f[1], norm, act)
        self.down_2 = MDown(f[1], f[2], norm, act)
        self.down_3 = MDown(f[2], f[3], norm, act)
        self.down_4 = MDown(f[3], f[4], norm, act)
        self.upcat_4 = MUpCat(f[4], f[3], f[3], f[3], norm, act)
        self.upcat_3 = MUpCat(f[3], f[2], f[2], f[2], norm, act)
        self.upcat_2 = MUpCat(f[2], f[1], f[1], f[1], norm, act)
        self.upcat_1 = MUpCat(f[1], f[0], f[1], f[5], norm, act)  # halves=False
        self.final_conv = tnn.Conv3d(f[5], num_classes, 1)

    def forward(self, x):
        x0 = self.conv_0(x)
        x1 = self.down_1(x0)
        x2 = self.down_2(x1)
        x3 = self.down_3(x2)
        x4 = self.down_4(x3)
        u4 = self.upcat_4(x4, x3)
        u3 = self.upcat_3(u4, x2)
        u2 = self.upcat_2(u3, x1)
        u1 = self.upcat_1(u2, x0)
        return self.final_conv(u1)


def test_import_basic_unet(rng, tmp_path):
    """Affine-less instance norms (MONAI plain-string norm) import as the
    identity affine; everything else tensor-for-tensor."""
    cfg = TrainConfig(model="basic_unet", width=4, norm="instance",
                      act="leakyrelu", num_classes=3, dropout=0.0)
    f = [4 * 2 ** i for i in range(5)] + [4]
    tm = MBasicUNet(f).eval()
    _randomize(tm, 20)
    variables = import_checkpoint(_save_ckpt(tm, tmp_path), cfg)
    model = get_model(cfg)
    x = rng.standard_normal((1, 32, 32, 32, 4)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    _compare(model.apply(variables, jnp.asarray(x)), want)


# ----------------------------------------------------------- SegResNet(+VAE)

class MSegResBlock(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm1 = tnn.GroupNorm(8, ch)
        self.conv1 = MConvolution(ch, ch, 3, bias=False, conv_only=True)
        self.norm2 = tnn.GroupNorm(8, ch)
        self.conv2 = MConvolution(ch, ch, 3, bias=False, conv_only=True)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return x + y


def _upsample_nt():
    return tnn.Upsample(scale_factor=2, mode="trilinear",
                        align_corners=False)


class MSegResNet(tnn.Module):
    def __init__(self, f=8, num_classes=3, blocks_down=(1, 2, 2, 4),
                 blocks_up=(1, 1, 1)):
        super().__init__()
        self.convInit = MConvolution(4, f, 3, bias=False, conv_only=True)
        downs = []
        for i, n in enumerate(blocks_down):
            ch = f * 2 ** i
            pre = (MConvolution(ch // 2, ch, 3, stride=2, bias=False,
                                conv_only=True) if i else tnn.Identity())
            downs.append(tnn.Sequential(
                pre, *[MSegResBlock(ch) for _ in range(n)]))
        self.down_layers = tnn.ModuleList(downs)
        ups, samples = [], []
        for i, n in enumerate(blocks_up):
            ch = f * 2 ** (len(blocks_down) - i - 1)
            samples.append(tnn.Sequential(
                MConvolution(ch, ch // 2, 1, bias=False, conv_only=True),
                _upsample_nt()))
            ups.append(tnn.Sequential(
                *[MSegResBlock(ch // 2) for _ in range(n)]))
        self.up_layers = tnn.ModuleList(ups)
        self.up_samples = tnn.ModuleList(samples)
        self.conv_final = tnn.Sequential(
            tnn.GroupNorm(8, f), tnn.ReLU(),
            MConvolution(f, num_classes, 1, bias=True, conv_only=True))

    def forward(self, x):
        x = self.convInit(x)
        skips = []
        for down in self.down_layers:
            x = down(x)
            skips.append(x)
        for i, (up, upl) in enumerate(zip(self.up_samples, self.up_layers)):
            x = up(x) + skips[len(skips) - i - 2]
            x = upl(x)
        return self.conv_final(x)


def test_import_segresnet(rng, tmp_path):
    cfg = TrainConfig(model="segresnet", norm="group", num_classes=3,
                      dropout=0.0)
    tm = MSegResNet().eval()
    _randomize(tm, 21)
    variables = import_checkpoint(_save_ckpt(tm, tmp_path), cfg)
    model = get_model(cfg)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    _compare(model.apply(variables, jnp.asarray(x)), want)


class MSegResNetVAE(MSegResNet):
    """Adds MONAI's VAE modules; the reconstruction decoder shares
    up_samples/up_layers (so no extra decoder tensors exist — the import
    must fill our vae_up_* slots from the shared ones)."""

    def __init__(self, f=8, num_classes=3, smallest=16, vae_nz=256,
                 total_elements=16):
        super().__init__(f, num_classes)
        v_filters = f * 8
        self.vae_down = tnn.Sequential(
            tnn.GroupNorm(8, v_filters), tnn.ReLU(),
            MConvolution(v_filters, smallest, 3, stride=2, bias=True,
                         conv_only=True),
            tnn.GroupNorm(8, smallest), tnn.ReLU())
        self.vae_fc1 = tnn.Linear(total_elements, vae_nz)
        self.vae_fc2 = tnn.Linear(total_elements, vae_nz)
        self.vae_fc3 = tnn.Linear(vae_nz, total_elements)
        self.vae_fc_up_sample = tnn.Sequential(
            MConvolution(smallest, v_filters, 1, bias=False, conv_only=True),
            _upsample_nt(), tnn.GroupNorm(8, v_filters), tnn.ReLU())
        self.vae_conv_final = tnn.Sequential(
            tnn.GroupNorm(8, f), tnn.ReLU(),
            MConvolution(f, 4, 1, bias=True, conv_only=True))


def test_import_segresnetvae(rng, tmp_path):
    """Seg path is exact; the VAE branch consumes the vae_* heads and the
    SHARED decoder tensors (MONAI reuses up_samples/up_layers)."""
    cfg = TrainConfig(model="segresnetvae", norm="group", num_classes=3,
                      dropout=0.0, patch_size=(16, 16, 16))
    tm = MSegResNetVAE().eval()
    _randomize(tm, 22)
    variables = import_checkpoint(_save_ckpt(tm, tmp_path), cfg)
    model = get_model(cfg)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    seg, aux = model.apply(variables, jnp.asarray(x), deterministic=True)
    _compare(seg, want)
    assert np.isfinite(float(aux["vae_loss"]))


# ------------------------------------------------------------ DynUNet (nnunet)

class MUnetBasicBlock(tnn.Module):
    def __init__(self, cin, ch, stride=1):
        super().__init__()
        self.conv1 = MConvolution(cin, ch, 3, stride, bias=False,
                                  conv_only=True)
        self.conv2 = MConvolution(ch, ch, 3, 1, bias=False, conv_only=True)
        self.norm1 = tnn.InstanceNorm3d(ch, affine=True)
        self.norm2 = tnn.InstanceNorm3d(ch, affine=True)

    def forward(self, x):
        x = F.leaky_relu(self.norm1(self.conv1(x)), 0.01)
        return F.leaky_relu(self.norm2(self.conv2(x)), 0.01)


class MUnetUpBlock(tnn.Module):
    def __init__(self, cin, ch):
        super().__init__()
        self.transp_conv = MConvolution(cin, ch, 2, 2, bias=False,
                                        conv_only=True, transposed=True)
        self.conv_block = MUnetBasicBlock(ch * 2, ch)

    def forward(self, x, skip):
        return self.conv_block(torch.cat([self.transp_conv(x), skip], dim=1))


class MUnetOutBlock(tnn.Module):
    def __init__(self, cin, num_classes):
        super().__init__()
        self.conv = MConvolution(cin, num_classes, 1, bias=True,
                                 conv_only=True)

    def forward(self, x):
        return self.conv(x)


class MDynUNet(tnn.Module):
    def __init__(self, levels=6, num_classes=3, deep_supr=3):
        super().__init__()
        self.levels, self.deep_supr = levels, deep_supr
        filt = [min(32 * 2 ** i, 320) for i in range(levels)]
        self.input_block = MUnetBasicBlock(4, filt[0])
        self.downsamples = tnn.ModuleList(
            [MUnetBasicBlock(filt[i - 1], filt[i], 2)
             for i in range(1, levels - 1)])
        self.bottleneck = MUnetBasicBlock(filt[-2], filt[-1], 2)
        self.upsamples = tnn.ModuleList(
            [MUnetUpBlock(filt[i + 1], filt[i])
             for i in range(levels - 2, -1, -1)])
        self.output_block = MUnetOutBlock(filt[0], num_classes)
        self.deep_supervision_heads = tnn.ModuleList(
            [MUnetOutBlock(filt[j], num_classes)
             for j in range(1, 1 + deep_supr)])
        # monai's DynUNetSkipLayer chain re-registers the shared modules —
        # reproduce the duplicate state_dict keys the import must ignore
        self.skip_layers = tnn.ModuleDict(
            {"downsample": self.input_block,
             "upsample": self.upsamples[-1]})

    def forward(self, x):
        y = self.input_block(x)
        skips = [y]
        for d in self.downsamples:
            y = d(y)
            skips.append(y)
        y = self.bottleneck(y)
        feats = []
        for j, i in enumerate(range(self.levels - 2, -1, -1)):
            y = self.upsamples[j](y, skips[i])
            feats.append((i, y))
        main = self.output_block(feats[-1][1])
        deeps = []
        for j in range(2, 2 + self.deep_supr):
            lvl, feat = feats[-j]
            h = self.deep_supervision_heads[j - 2](feat)
            deeps.append(F.interpolate(h, scale_factor=2 ** lvl,
                                       mode="nearest"))
        return main, deeps


class MWrapperDynUNet(tnn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.net = MDynUNet(**kw)

    def forward(self, x):
        return self.net(x)


def test_import_dynunet(rng, tmp_path):
    """Exercises the wrapper 'net.' prefix and the skip_layers duplicate
    keys (shared-module re-registration)."""
    cfg = TrainConfig(model="nnunet", norm="instance", num_classes=3)
    tm = MWrapperDynUNet().eval()
    _randomize(tm, 23)
    sd = load_torch_state_dict(_save_ckpt(tm, tmp_path))
    assert any(k.startswith("net.skip_layers.") for k in sd)
    variables = import_checkpoint(
        os.path.join(tmp_path, "best_model.pth"), cfg)
    model = get_model(cfg)
    x = rng.standard_normal((1, 64, 64, 64, 4)).astype(np.float32)
    with torch.no_grad():
        want_main, want_deeps = tm(torch.from_numpy(
            np.moveaxis(x, -1, 1).copy()))
    main, deeps = model.apply(variables, jnp.asarray(x))
    _compare(main, want_main)
    for g, w in zip(deeps, want_deeps):
        _compare(g, w)


# ------------------------------------------------------------------- VNet

class MLUConv(tnn.Module):
    def __init__(self, ch, act="elu"):
        super().__init__()
        self.conv_block = MConvolution(ch, ch, 5, norm="batch", act=None)
        self.act = act

    def forward(self, x):
        return _act(self.conv_block(x), self.act)


class MVDown(tnn.Module):
    def __init__(self, cin, nconvs, act="elu"):
        super().__init__()
        out = 2 * cin
        self.down_conv = tnn.Conv3d(cin, out, 2, 2)
        self.bn1 = tnn.BatchNorm3d(out)
        self.ops = tnn.Sequential(*[MLUConv(out, act) for _ in range(nconvs)])
        self.act = act

    def forward(self, x):
        down = _act(self.bn1(self.down_conv(x)), self.act)
        return _act(self.ops(down) + down, self.act)


class MVUp(tnn.Module):
    def __init__(self, cin, cout, nconvs, act="elu"):
        super().__init__()
        self.up_conv = tnn.ConvTranspose3d(cin, cout // 2, 2, 2)
        self.bn1 = tnn.BatchNorm3d(cout // 2)
        self.ops = tnn.Sequential(*[MLUConv(cout, act) for _ in range(nconvs)])
        self.act = act

    def forward(self, x, skip):
        up = _act(self.bn1(self.up_conv(x)), self.act)
        xcat = torch.cat([up, skip], dim=1)
        return _act(self.ops(xcat) + xcat, self.act)


class MVNet(tnn.Module):
    def __init__(self, num_classes=3, act="elu"):
        super().__init__()
        self.act = act
        self.in_tr = tnn.Module()
        self.in_tr.conv_block = MConvolution(4, 16, 5, norm="batch", act=None)
        self.down_tr32 = MVDown(16, 1, act)
        self.down_tr64 = MVDown(32, 2, act)
        self.down_tr128 = MVDown(64, 3, act)
        self.down_tr256 = MVDown(128, 2, act)
        self.up_tr256 = MVUp(256, 256, 2, act)
        self.up_tr128 = MVUp(256, 128, 2, act)
        self.up_tr64 = MVUp(128, 64, 1, act)
        self.up_tr32 = MVUp(64, 32, 1, act)
        self.out_tr = tnn.Module()
        self.out_tr.conv_block = MConvolution(32, num_classes, 5,
                                              norm="batch", act=None)
        self.out_tr.conv2 = tnn.Conv3d(num_classes, num_classes, 1)

    def forward(self, x):
        y = self.in_tr.conv_block(x)
        y = _act(y + x.repeat(1, 4, 1, 1, 1), self.act)
        d32 = self.down_tr32(y)
        d64 = self.down_tr64(d32)
        d128 = self.down_tr128(d64)
        d256 = self.down_tr256(d128)
        u = self.up_tr256(d256, d128)
        u = self.up_tr128(u, d64)
        u = self.up_tr64(u, d32)
        u = self.up_tr32(u, y)
        return self.out_tr.conv2(_act(self.out_tr.conv_block(u), self.act))


def test_import_vnet(rng, tmp_path):
    """Batch-norm running stats import into the batch_stats collection and
    drive eval-mode normalization."""
    cfg = TrainConfig(model="vnet", act="elu", num_classes=3, dropout=0.0)
    tm = MVNet().eval()
    _randomize(tm, 24)
    variables = import_checkpoint(_save_ckpt(tm, tmp_path), cfg)
    assert "batch_stats" in variables
    model = get_model(cfg)
    x = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    _compare(model.apply(variables, jnp.asarray(x), deterministic=True),
             want)


# -------------------------------------------------------------- HighResNet

class MConvNormActi(tnn.Module):
    def __init__(self, cin, cout, k, norm=True, act=True):
        super().__init__()
        layers = [tnn.Conv3d(cin, cout, k, padding=k // 2)]
        if norm:
            layers.append(tnn.BatchNorm3d(cout))
        if act:
            layers.append(tnn.ReLU())
        self.layers = tnn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


class MHighResBlock(tnn.Module):
    def __init__(self, cin, cout, dilation):
        super().__init__()
        layers, ch = [], cin
        for _ in range(2):
            layers += [tnn.BatchNorm3d(ch), tnn.ReLU(),
                       tnn.Conv3d(ch, cout, 3, padding=dilation,
                                  dilation=dilation)]
            ch = cout
        self.layers = tnn.Sequential(*layers)
        self.pad = cout - cin

    def forward(self, x):
        y = self.layers(x)
        if self.pad:
            # MONAI ChannelPad splits the pad: (out-in)//2 before, the
            # remainder after (project.ChannelPad, channel_matching='pad')
            x = F.pad(x, (0, 0, 0, 0, 0, 0,
                          self.pad // 2, self.pad - self.pad // 2))
        return x + y


class MHighResNet(tnn.Module):
    def __init__(self, num_classes=3):
        super().__init__()
        blocks = [MConvNormActi(4, 16, 3)]
        cin = 16
        for gi, (ch, dil) in enumerate([(16, 1), (32, 2), (64, 4)]):
            for _ in range(3):
                blocks.append(MHighResBlock(cin, ch, dil))
                cin = ch
        blocks.append(MConvNormActi(64, 80, 1))
        blocks.append(MConvNormActi(80, num_classes, 1, norm=False,
                                    act=False))
        self.blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


def test_import_highresnet(rng, tmp_path):
    cfg = TrainConfig(model="highresnet", norm="batch", act="relu",
                      num_classes=3, dropout=0.0)
    tm = MHighResNet().eval()
    _randomize(tm, 25)
    variables = import_checkpoint(_save_ckpt(tm, tmp_path), cfg)
    assert "batch_stats" in variables
    model = get_model(cfg)
    x = rng.standard_normal((1, 12, 12, 12, 4)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    _compare(model.apply(variables, jnp.asarray(x), deterministic=True),
             want)


# ------------------------------------------------------------------ UNETR

class MSABlock(tnn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.out_proj = tnn.Linear(hidden, hidden)
        self.qkv = tnn.Linear(hidden, hidden * 3, bias=False)
        self.heads = heads
        self.scale = (hidden // heads) ** -0.5

    def forward(self, x):
        b, n, c = x.shape
        h, d = self.heads, c // self.heads
        qkv = self.qkv(x).reshape(b, n, 3, h, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (torch.einsum("bhnd,bhmd->bhnm", q, k) * self.scale
               ).softmax(dim=-1)
        out = torch.einsum("bhnm,bhmd->bhnd", att, v)
        return self.out_proj(out.permute(0, 2, 1, 3).reshape(b, n, c))


class MMLP(tnn.Module):
    def __init__(self, hidden, mlp):
        super().__init__()
        self.linear1 = tnn.Linear(hidden, mlp)
        self.linear2 = tnn.Linear(mlp, hidden)

    def forward(self, x):
        return self.linear2(F.gelu(self.linear1(x)))


class MTransformerBlock(tnn.Module):
    def __init__(self, hidden, mlp, heads):
        super().__init__()
        self.mlp = MMLP(hidden, mlp)
        self.norm1 = tnn.LayerNorm(hidden)
        self.attn = MSABlock(hidden, heads)
        self.norm2 = tnn.LayerNorm(hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class MPatchEmbedding(tnn.Module):
    def __init__(self, patch_dim, hidden, n_tokens):
        super().__init__()
        # monai (perceptron): Sequential(Rearrange, Linear) → index 1
        self.patch_embeddings = tnn.Sequential(
            tnn.Identity(), tnn.Linear(patch_dim, hidden))
        self.position_embeddings = tnn.Parameter(
            torch.zeros(1, n_tokens, hidden))

    def forward(self, tokens):         # tokens already rearranged
        return self.patch_embeddings(tokens) + self.position_embeddings


class MViT(tnn.Module):
    def __init__(self, patch_dim, hidden, mlp, heads, n_tokens, layers=12):
        super().__init__()
        self.patch_embedding = MPatchEmbedding(patch_dim, hidden, n_tokens)
        self.blocks = tnn.ModuleList(
            [MTransformerBlock(hidden, mlp, heads) for _ in range(layers)])
        self.norm = tnn.LayerNorm(hidden)

    def forward(self, tokens):
        x = self.patch_embedding(tokens)
        hidden_states = []
        for blk in self.blocks:
            x = blk(x)
            hidden_states.append(x)
        return self.norm(x), hidden_states


class MUnetResBlock(tnn.Module):
    def __init__(self, cin, ch, stride=1):
        super().__init__()
        self.conv1 = MConvolution(cin, ch, 3, stride, bias=False,
                                  conv_only=True)
        self.conv2 = MConvolution(ch, ch, 3, 1, bias=False, conv_only=True)
        self.norm1 = tnn.InstanceNorm3d(ch, affine=True)
        self.norm2 = tnn.InstanceNorm3d(ch, affine=True)
        self.downsample = cin != ch or stride != 1
        if self.downsample:
            self.conv3 = MConvolution(cin, ch, 1, stride, bias=False,
                                      conv_only=True)
            self.norm3 = tnn.InstanceNorm3d(ch, affine=True)

    def forward(self, x):
        res = x
        y = F.leaky_relu(self.norm1(self.conv1(x)), 0.01)
        y = self.norm2(self.conv2(y))
        if self.downsample:
            res = self.norm3(self.conv3(res))
        return F.leaky_relu(y + res, 0.01)


class MUnetrBasicBlock(tnn.Module):
    def __init__(self, cin, ch):
        super().__init__()
        self.layer = MUnetResBlock(cin, ch)

    def forward(self, x):
        return self.layer(x)


class MUnetrPrUpBlock(tnn.Module):
    def __init__(self, cin, ch, num_layer):
        super().__init__()
        self.transp_conv_init = MConvolution(cin, ch, 2, 2, bias=False,
                                             conv_only=True, transposed=True)
        self.blocks = tnn.ModuleList(
            [MConvolution(ch, ch, 2, 2, bias=False, conv_only=True,
                          transposed=True) for _ in range(num_layer)])

    def forward(self, x):
        x = self.transp_conv_init(x)
        for blk in self.blocks:
            x = blk(x)
        return x


class MUnetrUpBlock(tnn.Module):
    def __init__(self, cin, ch):
        super().__init__()
        self.transp_conv = MConvolution(cin, ch, 2, 2, bias=False,
                                        conv_only=True, transposed=True)
        self.conv_block = MUnetResBlock(ch * 2, ch)

    def forward(self, x, skip):
        return self.conv_block(torch.cat([self.transp_conv(x), skip], dim=1))


class MUNETR(tnn.Module):
    def __init__(self, hidden, mlp, heads, fs, patch, grid, num_classes=3):
        super().__init__()
        self.patch, self.grid, self.hidden = patch, grid, hidden
        n = grid ** 3
        self.vit = MViT(patch ** 3 * 4, hidden, mlp, heads, n)
        self.encoder1 = MUnetrBasicBlock(4, fs)
        self.encoder2 = MUnetrPrUpBlock(hidden, fs * 2, 2)
        self.encoder3 = MUnetrPrUpBlock(hidden, fs * 4, 1)
        self.encoder4 = MUnetrPrUpBlock(hidden, fs * 8, 0)
        self.decoder5 = MUnetrUpBlock(hidden, fs * 8)
        self.decoder4 = MUnetrUpBlock(fs * 8, fs * 4)
        self.decoder3 = MUnetrUpBlock(fs * 4, fs * 2)
        self.decoder2 = MUnetrUpBlock(fs * 2, fs)
        self.out = MUnetOutBlock(fs, num_classes)

    def _tokens(self, x):
        # monai Rearrange "b c (h x) (w y) (d z) -> b (h w d) (x y z c)"
        b, c = x.shape[0], x.shape[1]
        g, p = self.grid, self.patch
        t = x.reshape(b, c, g, p, g, p, g, p)
        t = t.permute(0, 2, 4, 6, 3, 5, 7, 1)     # b h w d x y z c
        return t.reshape(b, g ** 3, -1)

    def _grid(self, t):
        b = t.shape[0]
        g = self.grid
        return t.reshape(b, g, g, g, self.hidden).permute(0, 4, 1, 2, 3)

    def forward(self, x_in):
        x, hs = self.vit(self._tokens(x_in))
        enc1 = self.encoder1(x_in)
        enc2 = self.encoder2(self._grid(hs[3]))
        enc3 = self.encoder3(self._grid(hs[6]))
        enc4 = self.encoder4(self._grid(hs[9]))
        d = self.decoder5(self._grid(x), enc4)
        d = self.decoder4(d, enc3)
        d = self.decoder3(d, enc2)
        d = self.decoder2(d, enc1)
        return self.out(d)


def test_import_unetr(rng, tmp_path):
    """Small-dim UNETR: ViT naming (fused bias-free qkv, perceptron Linear
    at patch_embeddings.1, closing vit.norm, taps after blocks 4/7/10) and
    the res-block decoder."""
    from brats21_tpu.models.unetr import UNETR

    hidden, mlp, heads, fs = 48, 96, 4, 8
    model = UNETR(img_size=(32, 32, 32), num_classes=3, feature_size=fs,
                  hidden_size=hidden, mlp_dim=mlp, num_heads=heads,
                  norm="instance")
    tm = MUNETR(hidden, mlp, heads, fs, 16, 2).eval()
    _randomize(tm, 26)
    x = rng.standard_normal((1, 32, 32, 32, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = state_dict_to_flax(sd, "unet_tr", variables["params"])
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    _compare(model.apply({"params": params}, jnp.asarray(x)), want,
             atol=5e-4)
