"""EquiUnetASSPEvo — the 2021 winner: Bridge-Unet + ASPP + SE + EvoNorm.

Functional rebuild of reference networks/equiunet2021.py (cited per class),
channels-last flax.linen. The EvoNorm-S0 group-std reduction is the prime
candidate for a fused Pallas kernel (see ops/pallas/evonorm.py); this module
uses the XLA path which already fuses swish÷group_std·γ+β into the conv
epilogue.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .equiunet import DeepHead, RefUnet
from .layers import (Array, Conv3d, Dropout, global_avg_pool, max_avg_pool,
                     torch_default_conv, upsample)


def group_std(x: Array, groups: int = 8, eps: float = 1e-5) -> Array:
    """Per-(sample, group) std over (C//G, D, H, W) with *unbiased* variance,
    matching torch.var default in reference equiunet2021.py:48-52.

    Channels-last: groups split the trailing channel axis.
    """
    b = x.shape[0]
    spatial = x.shape[1:-1]
    c = x.shape[-1]
    grouped = x.reshape(b, *spatial, groups, c // groups)
    axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
    n = 1
    for a in axes:
        n *= grouped.shape[a]
    var = grouped.var(axis=axes, keepdims=True) * (n / max(n - 1, 1))
    std = jnp.sqrt(var + eps)
    std = jnp.broadcast_to(std, grouped.shape).reshape(x.shape)
    return std


def instance_std(x: Array, eps: float = 1e-5) -> Array:
    """Unbiased per-(sample, channel) spatial std (equiunet2021.py:41-45)."""
    axes = tuple(range(1, x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    var = x.var(axis=axes, keepdims=True) * (n / max(n - 1, 1))
    return jnp.sqrt(var + eps)


import functools as _functools


@_functools.lru_cache()
def _pallas_evonorm_default() -> bool:
    """Opt-in (BRATS21_PALLAS_EVONORM=1, AND a Pallas-capable backend —
    ops.pallas.enabled — so the flag is inert on plain-CPU runs).
    Measured on v5e (docs/BENCHMARKS round 2): the standalone kernel LOSES
    to XLA — 632 ms vs 302 ms full-volume forward — because XLA fuses the
    EvoNorm elementwise chain into its neighbours while the kernel forces
    a materialization boundary. Kept wired + parity-tested."""
    import os

    from ..ops.pallas import enabled
    return (os.environ.get("BRATS21_PALLAS_EVONORM", "0") not in (
        "0", "false", "False")) and enabled()


class EvoNorm3D(nn.Module):
    """EvoNorm S0/B0 (equiunet2021.py:55-118).

    S0 (default, the one EquiUnetASSPEvo uses): ``swish(x) / group_std(x) * γ + β``
    with the 'efficient' swish that ignores the v parameter (reference
    efficient=True, :100-103). v is still allocated for checkpoint parity.
    B0: running-var batch variant.

    On TPU the S0 apply runs as one fused Pallas kernel (bf16 in/out, fp32
    VPU math, backward recomputed via the XLA formula) —
    ``use_pallas=None`` resolves from platform + BRATS21_PALLAS_EVONORM.
    """

    non_linear: bool = True
    version: str = "S0"
    efficient: bool = True
    affine: bool = True
    momentum: float = 0.9
    eps: float = 1e-5
    groups: int = 8
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        c = x.shape[-1]
        orig_dtype = x.dtype
        if self.version not in ("B0", "S0"):
            raise ValueError("Invalid EvoNorm version")
        gamma = beta = v = None
        if self.affine:
            gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
            beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
            if self.non_linear:
                v = self.param("v", nn.initializers.ones, (c,), jnp.float32)
        if self.version == "S0":
            pallas_ok = (self.use_pallas if self.use_pallas is not None
                         else _pallas_evonorm_default())
            if (self.non_linear and self.efficient and self.affine
                    and pallas_ok):
                from ..ops.pallas.evonorm_kernel import evonorm_s0
                return evonorm_s0(x, gamma, beta, min(self.groups, c),
                                  self.eps)
        xf = x.astype(jnp.float32)
        if self.version == "S0":
            if self.non_linear:
                if self.efficient:
                    num = xf * jax.nn.sigmoid(xf)
                else:
                    num = xf * jax.nn.sigmoid(v * xf)
                out = num / group_std(xf, min(self.groups, c), self.eps) * gamma + beta
            else:
                out = xf * gamma + beta
            return out.astype(orig_dtype)
        # B0
        running_var = self.variable(
            "batch_stats", "running_var",
            lambda: jnp.ones((1, 1, 1, 1, c), jnp.float32))
        if training:
            var = xf.var(axis=(0, 1, 2, 3), keepdims=True)  # biased, :108
            running_var.value = (running_var.value * self.momentum
                                 + (1 - self.momentum) * var)
        else:
            var = running_var.value
        if self.non_linear:
            den = jnp.maximum(jnp.sqrt(var + self.eps),
                              v * xf + instance_std(xf, self.eps))
            out = xf / den * gamma + beta
        else:
            out = xf * gamma + beta
        return out.astype(orig_dtype)


def _evo_ctor(remat_norm: bool):
    """EvoNorm3D, optionally checkpointed on its own: the backward then
    recomputes only the cheap elementwise swish/group-std (keeping the bf16
    conv outputs saved) instead of whole blocks — ~free recompute vs the
    ~30%-of-step conv recompute of block-level remat (docs/BENCHMARKS.md)."""
    return nn.remat(EvoNorm3D) if remat_norm else EvoNorm3D


class ConvEvo(nn.Module):
    """conv → EvoNorm3D → dropout (equiunet2021.py:212-222)."""

    features: int
    dropout_p: float = 0.0
    kernel_size: int = 1
    dilation: int = 1
    remat_norm: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = Conv3d(self.features, self.kernel_size, dilation=self.dilation,
                   kernel_init=torch_default_conv, name="conv")(x)
        y = _evo_ctor(self.remat_norm)(name="evo")(y)
        return Dropout(self.dropout_p)(y, deterministic)


class ResidualSELayer(nn.Module):
    """MONAI ResidualSELayer(r=2, relu/sigmoid): x + x·sigmoid(fc2(relu(fc1(gap(x)))))
    (used at equiunet2021.py:204-205)."""

    r: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        pooled = global_avg_pool(x)
        h = nn.Dense(c // self.r, dtype=x.dtype, param_dtype=jnp.float32,
                     kernel_init=torch_default_conv, name="fc1")(pooled)
        h = jax.nn.relu(h)
        h = nn.Dense(c, dtype=x.dtype, param_dtype=jnp.float32,
                     kernel_init=torch_default_conv, name="fc2")(h)
        scale = jax.nn.sigmoid(h)[:, None, None, None, :]
        return x + x * scale


class ConvEvoBlockCorrected(nn.Module):
    """(conv3 → EvoNorm → drop) ×2 → ResidualSE (equiunet2021.py:192-209)."""

    features: int
    dropout_p: float = 0.0
    remat_norm: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        Evo = _evo_ctor(self.remat_norm)
        y = Conv3d(self.features, 3, kernel_init=torch_default_conv, name="conv1")(x)
        y = Evo(name="evo1")(y)
        y = Dropout(self.dropout_p)(y, deterministic)
        y = Conv3d(self.features, 3, kernel_init=torch_default_conv, name="conv2")(y)
        y = Evo(name="evo2")(y)
        y = Dropout(self.dropout_p)(y, deterministic)
        return ResidualSELayer(r=2, name="se")(y)


class SimpleASPPEVO(nn.Module):
    """Simplified atrous spatial pyramid pooling (equiunet2021.py:121-189):
    four parallel convs (k=1,3,3,3 / d=1,2,4,6) concatenated, then a 1×1
    ConvEvo."""

    conv_out_channels: int
    kernel_sizes: Sequence[int] = (1, 3, 3, 3)
    dilations: Sequence[int] = (1, 2, 4, 6)
    remat_norm: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if len(self.kernel_sizes) != len(self.dilations):
            raise ValueError("kernel_sizes and dilations length must match")
        outs = []
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            outs.append(Conv3d(self.conv_out_channels, k, dilation=d,
                               kernel_init=torch_default_conv,
                               name=f"conv_{i}")(x))
        y = jnp.concatenate(outs, axis=-1)
        return ConvEvo(y.shape[-1], dropout_p=0.0, kernel_size=1,
                       remat_norm=self.remat_norm,
                       name="conv_k1")(y, deterministic)


class EquiUnetASSPEvo(nn.Module):
    """The selected BraTS21 architecture (equiunet2021.py:225-333), 'U-Net V2'
    of README.md:109. Channel-doubling MaxAvgPool downsample (:261,293-297),
    half-width bridge skips (:252-255), ASPP bottleneck (:257-259), ConvEvo
    up-convs + trilinear upsample decoders, deep supervision at up3/up2."""

    features: Sequence[int]
    num_classes: int = 3
    act: str = "relu"          # unused — only EVO (reference warns, :233)
    norm: Optional[str] = None  # unused
    deep_supervision: bool = False
    dropout: float = 0.0
    refinement: bool = False
    #: rematerialization policy for 128³ bf16 training:
    #: "block"/True — checkpoint whole ConvEvo blocks (max memory savings,
    #:   ~30% conv recompute in the backward);
    #: "norm" — checkpoint only the EvoNorm apply (saves the fp32 norm
    #:   intermediates, recompute is cheap elementwise; convs kept);
    #: "none"/False — no remat (fastest when HBM allows).
    remat: Any = True

    def _remat_mode(self) -> str:
        if self.remat in (True, "block"):
            return "block"
        if self.remat in (False, "none", None):
            return "none"
        assert self.remat == "norm", self.remat
        return "norm"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        f = list(self.features)
        det = deterministic
        mode = self._remat_mode()
        Block = (nn.remat(ConvEvoBlockCorrected, static_argnums=(2,))
                 if mode == "block" else ConvEvoBlockCorrected)
        rn = mode == "norm"
        down1 = Block(f[0], self.dropout, rn, name="encoder1")(x, det)
        down2 = Block(f[1], self.dropout, rn, name="encoder2")(
            max_avg_pool(down1), det)
        down3 = Block(f[2], self.dropout, rn, name="encoder3")(
            max_avg_pool(down2), det)
        down4 = Block(f[3], self.dropout, rn, name="encoder4")(
            max_avg_pool(down3), det)
        assp = SimpleASPPEVO(f[3] // 4, remat_norm=rn, name="aspp")(down4, det)

        down1b = ConvEvo(f[0] // 2, self.dropout, remat_norm=rn,
                         name="bridge1")(down1, det)
        down2b = ConvEvo(f[1] // 2, self.dropout, remat_norm=rn,
                         name="bridge2")(down2, det)
        down3b = ConvEvo(f[2] // 2, self.dropout, remat_norm=rn,
                         name="bridge3")(down3, det)

        up3 = upsample(ConvEvo(f[3] // 4, self.dropout, remat_norm=rn,
                               name="upconv3")(assp, det))
        up3 = Block(f[2], self.dropout, rn, name="decoder3")(
            jnp.concatenate([down3b, up3], axis=-1), det)
        up2 = upsample(ConvEvo(f[2] // 4, self.dropout, remat_norm=rn,
                               name="upconv2")(up3, det))
        up2 = Block(f[1], self.dropout, rn, name="decoder2")(
            jnp.concatenate([down2b, up2], axis=-1), det)
        up1 = upsample(ConvEvo(f[1] // 4, self.dropout, remat_norm=rn,
                               name="upconv1")(up2, det))
        up1 = Block(f[0], self.dropout, rn, name="decoder1")(
            jnp.concatenate([down1b, up1], axis=-1), det)

        out = Conv3d(self.num_classes, 1, kernel_init=torch_default_conv,
                     name="out_conv")(up1)

        if self.refinement:
            refined = RefUnet(f[0], "relu", "group", self.dropout,
                              name="refunet")(out, det)
            out = [refined, out]

        if self.deep_supervision:
            deeps = [
                DeepHead(self.num_classes, 4, kernel_init=torch_default_conv,
                         name="deep3")(up3),
                DeepHead(self.num_classes, 2, kernel_init=torch_default_conv,
                         name="deep2")(up2),
            ]
            return out, deeps
        return out
