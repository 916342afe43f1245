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
