"""BraTS-2020-lineage 3D U-Nets: Unet, EquiUnet, AttEquiUnet (+CBAM, RefUnet).

Functional rebuild of reference networks/equiunet2020.py (cited per class) in
flax.linen, channels-last. Architecture is preserved; the execution model is
TPU-first: one traced forward, bf16 activations, matmul-based trilinear
upsampling (see models/layers.py).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (Array, Conv3d, Dropout, get_act, get_norm_layer,
                     global_avg_pool, global_max_pool, kaiming_normal_fan_out,
                     max_pool3d, upsample)


class ConvBnRelu(nn.Module):
    """conv3x3 → norm → act → dropout (equiunet2020.py:51-75). When norm is
    None the conv keeps its bias (reference :70)."""

    features: int
    act: str = "relu"
    norm: Optional[str] = "group"
    dilation: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        norm_ctor = get_norm_layer(self.norm)
        x = Conv3d(self.features, 3, dilation=self.dilation,
                   use_bias=norm_ctor is None, name="conv")(x)
        if norm_ctor is not None:
            x = norm_ctor(name="bn")(x)
        x = get_act(self.act)(x)
        return Dropout(self.dropout)(x, deterministic)


class UBlock(nn.Module):
    """Two stacked ConvBnRelu (equiunet2020.py:105-123)."""

    midplanes: int
    outplanes: int
    act: str = "relu"
    norm: Optional[str] = "group"
    dilation: Tuple[int, int] = (1, 1)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = ConvBnRelu(self.midplanes, self.act, self.norm, self.dilation[0],
                       self.dropout, name="ConvBnRelu1")(x, deterministic)
        return ConvBnRelu(self.outplanes, self.act, self.norm, self.dilation[1],
                          self.dropout, name="ConvBnRelu2")(x, deterministic)


class ChannelGate(nn.Module):
    """CBAM channel attention (equiunet2020.py:171-201): shared MLP over
    global avg+max pooled features, sigmoid gate."""

    reduction_ratio: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        hidden = max(c // self.reduction_ratio, 1)
        mlp = nn.Sequential([
            nn.Dense(hidden, dtype=x.dtype, param_dtype=jnp.float32,
                     kernel_init=kaiming_normal_fan_out),
            jax.nn.relu,
            nn.Dense(c, dtype=x.dtype, param_dtype=jnp.float32,
                     kernel_init=kaiming_normal_fan_out),
        ])
        att = mlp(global_avg_pool(x)) + mlp(global_max_pool(x))
        scale = jax.nn.sigmoid(att)[:, None, None, None, :]
        return x * scale


class SpatialGate(nn.Module):
    """CBAM spatial attention (equiunet2020.py:210-221): channel max/mean
    stack → 7³ conv (+norm+relu) → sigmoid gate."""

    norm: Optional[str] = "group"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        compress = jnp.concatenate(
            [x.max(axis=-1, keepdims=True), x.mean(axis=-1, keepdims=True)], axis=-1)
        y = Conv3d(1, kernel_size=7, use_bias=False, name="spatial_conv")(compress)
        norm_ctor = get_norm_layer(self.norm)
        if norm_ctor is not None:
            # BasicConv (equiunet2020.py:147-162) norms 1 channel; GroupNorm(8)
            # over a single channel degrades to min(groups, C)=1 group.
            y = norm_ctor(name="spatial_bn")(y)
        y = jax.nn.relu(y)
        return x * jax.nn.sigmoid(y)


class CBAM(nn.Module):
    """Channel then spatial gates (equiunet2020.py:224-235)."""

    reduction_ratio: int = 16
    norm: Optional[str] = "group"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = ChannelGate(self.reduction_ratio, name="ChannelGate")(x)
        return SpatialGate(self.norm, name="SpatialGate")(x)


class UBlockCbam(nn.Module):
    """UBlock followed by CBAM (equiunet2020.py:238-249)."""

    midplanes: int
    outplanes: int
    act: str = "relu"
    norm: Optional[str] = "group"
    dilation: Tuple[int, int] = (1, 1)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = UBlock(self.midplanes, self.outplanes, self.act, self.norm,
                   self.dilation, self.dropout, name="UBlock")(x, deterministic)
        return CBAM(norm=self.norm, name="CBAM")(x)


class RefUnet(nn.Module):
    """Refinement U-Net producing a residual correction on the logits
    (equiunet2020.py:252-309). 4 maxpool(ceil) encoders, trilinear decoders."""

    inc_ch: int
    act: str = "relu"
    norm: Optional[str] = "group"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        in_ch = x.shape[-1]
        cbr = lambda name: ConvBnRelu(self.inc_ch, self.act, self.norm, 1,
                                      self.dropout, name=name)
        hx = Conv3d(self.inc_ch, 3, name="conv0")(x)
        hx1 = cbr("hx1")(hx, deterministic)
        hx = max_pool3d(hx1, ceil_mode=True)
        hx2 = cbr("hx2")(hx, deterministic)
        hx = max_pool3d(hx2, ceil_mode=True)
        hx3 = cbr("hx3")(hx, deterministic)
        hx = max_pool3d(hx3, ceil_mode=True)
        hx4 = cbr("hx4")(hx, deterministic)
        hx = max_pool3d(hx4, ceil_mode=True)
        hx5 = cbr("hx5")(hx, deterministic)

        # scale-factor-2 trilinear upsample; sizes may be odd due to ceil_mode,
        # so resize to the exact skip shape.
        hx = _up_match(hx5, hx4)
        d4 = cbr("d4")(jnp.concatenate([hx, hx4], axis=-1), deterministic)
        hx = _up_match(d4, hx3)
        d3 = cbr("d3")(jnp.concatenate([hx, hx3], axis=-1), deterministic)
        hx = _up_match(d3, hx2)
        d2 = cbr("d2")(jnp.concatenate([hx, hx2], axis=-1), deterministic)
        hx = _up_match(d2, hx1)
        d1 = cbr("d1")(jnp.concatenate([hx, hx1], axis=-1), deterministic)
        residual = Conv3d(in_ch, 3, name="conv_d0")(d1)
        return x + residual


def _up_match(x: Array, ref: Array) -> Array:
    """×2 trilinear (align_corners) upsample cropped to ``ref``'s spatial
    shape (the reference relies on matching even sizes; ceil-mode pooling can
    overshoot by one, torch crops implicitly via its skip sizes)."""
    from .layers import resize_trilinear
    return resize_trilinear(x, ref.shape[1:4], align_corners=True)


class DeepHead(nn.Module):
    """conv1x1 → ×scale trilinear upsample deep-supervision head
    (equiunet2020.py:443-458)."""

    num_classes: int
    scale: int
    kernel_init: Callable = kaiming_normal_fan_out

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = Conv3d(self.num_classes, 1, kernel_init=self.kernel_init, name="conv")(x)
        return upsample(y, self.scale)


class Unet(nn.Module):
    """'Almost the most basic U-net' (equiunet2020.py:312-405): halving
    mid-widths, bottom+bottom_2 bridge, 3 decoders, optional 4-head deep
    supervision."""

    features: Sequence[int]
    num_classes: int = 3
    act: str = "relu"
    norm: Optional[str] = "group"
    deep_supervision: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        f = list(self.features)
        det = deterministic
        down1 = UBlock(f[0] // 2, f[0], self.act, self.norm, dropout=self.dropout,
                       name="encoder1")(x, det)
        down2 = UBlock(f[1] // 2, f[1], self.act, self.norm, dropout=self.dropout,
                       name="encoder2")(max_pool3d(down1), det)
        down3 = UBlock(f[2] // 2, f[2], self.act, self.norm, dropout=self.dropout,
                       name="encoder3")(max_pool3d(down2), det)
        down4 = UBlock(f[3] // 2, f[3], self.act, self.norm, dropout=self.dropout,
                       name="encoder4")(max_pool3d(down3), det)

        bottom = UBlock(f[3], f[3], self.act, self.norm, (2, 2),
                        dropout=self.dropout, name="bottom")(down4, det)
        bottom_2 = ConvBnRelu(f[2], self.act, self.norm, dropout=self.dropout,
                              name="bottom_2")(
            jnp.concatenate([down4, bottom], axis=-1), det)

        up3 = UBlock(f[2], f[1], self.act, self.norm, dropout=self.dropout,
                     name="decoder3")(
            jnp.concatenate([down3, upsample(bottom_2)], axis=-1), det)
        up2 = UBlock(f[1], f[0], self.act, self.norm, dropout=self.dropout,
                     name="decoder2")(
            jnp.concatenate([down2, upsample(up3)], axis=-1), det)
        up1 = UBlock(f[0], f[0] // 2, self.act, self.norm, dropout=self.dropout,
                     name="decoder1")(
            jnp.concatenate([down1, upsample(up2)], axis=-1), det)

        out = Conv3d(self.num_classes, 1, name="outconv")(up1)

        if self.deep_supervision:
            deeps = [
                DeepHead(self.num_classes, 8, name="deep_bottom")(bottom),
                DeepHead(self.num_classes, 8, name="deep_bottom2")(bottom_2),
                DeepHead(self.num_classes, 4, name="deep3")(up3),
                DeepHead(self.num_classes, 2, name="deep2")(up2),
            ]
            return out, deeps
        return out


class EquiUnet(nn.Module):
    """EquiUnet — equal widths per level (equiunet2020.py:408-500). Model 1 /
    'U-Net V1' of README.md:103. Optional RefUnet refinement (:460-463)."""

    features: Sequence[int]
    num_classes: int = 3
    act: str = "relu"
    norm: Optional[str] = "group"
    deep_supervision: bool = False
    dropout: float = 0.0
    refinement: bool = False
    remat: bool = True  # rematerialize blocks for 128³ training memory

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        f = list(self.features)
        det = deterministic
        UBlock_ = (nn.remat(UBlock, static_argnums=(2,)) if self.remat
                   else UBlock)
        down1 = UBlock_(f[0], f[0], self.act, self.norm, dropout=self.dropout,
                       name="encoder1")(x, det)
        down2 = UBlock_(f[1], f[1], self.act, self.norm, dropout=self.dropout,
                       name="encoder2")(max_pool3d(down1), det)
        down3 = UBlock_(f[2], f[2], self.act, self.norm, dropout=self.dropout,
                       name="encoder3")(max_pool3d(down2), det)
        down4 = UBlock_(f[3], f[3], self.act, self.norm, dropout=self.dropout,
                       name="encoder4")(max_pool3d(down3), det)

        bottom = UBlock_(f[3], f[3], self.act, self.norm, (2, 2),
                        dropout=self.dropout, name="bottom")(down4, det)
        bottom_2 = ConvBnRelu(f[2], self.act, self.norm, dropout=self.dropout,
                              name="bottom_2")(
            jnp.concatenate([down4, bottom], axis=-1), det)

        up3 = UBlock_(f[2], f[1], self.act, self.norm, dropout=self.dropout,
                     name="decoder3")(
            jnp.concatenate([down3, upsample(bottom_2)], axis=-1), det)
        up2 = UBlock_(f[1], f[0], self.act, self.norm, dropout=self.dropout,
                     name="decoder2")(
            jnp.concatenate([down2, upsample(up3)], axis=-1), det)
        up1 = UBlock_(f[0], f[0], self.act, self.norm, dropout=self.dropout,
                     name="decoder1")(
            jnp.concatenate([down1, upsample(up2)], axis=-1), det)

        out = Conv3d(self.num_classes, 1, name="outconv")(up1)

        if self.refinement:
            refined = RefUnet(f[0], self.act, self.norm, self.dropout,
                              name="refunet")(out, det)
            out = [refined, out]

        if self.deep_supervision:
            deeps = [
                DeepHead(self.num_classes, 8, name="deep_bottom")(bottom),
                DeepHead(self.num_classes, 8, name="deep_bottom2")(bottom_2),
                DeepHead(self.num_classes, 4, name="deep3")(up3),
                DeepHead(self.num_classes, 2, name="deep2")(up2),
            ]
            return out, deeps
        return out


class AttEquiUnet(nn.Module):
    """EquiUnet with CBAM-gated encoders and bottom (equiunet2020.py:503-561)."""

    features: Sequence[int]
    num_classes: int = 3
    act: str = "relu"
    norm: Optional[str] = "group"
    deep_supervision: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        f = list(self.features)
        det = deterministic
        down1 = UBlockCbam(f[0], f[0], self.act, self.norm, dropout=self.dropout,
                           name="encoder1")(x, det)
        down2 = UBlockCbam(f[1], f[1], self.act, self.norm, dropout=self.dropout,
                           name="encoder2")(max_pool3d(down1), det)
        down3 = UBlockCbam(f[2], f[2], self.act, self.norm, dropout=self.dropout,
                           name="encoder3")(max_pool3d(down2), det)
        down4 = UBlockCbam(f[3], f[3], self.act, self.norm, dropout=self.dropout,
                           name="encoder4")(max_pool3d(down3), det)

        bottom = UBlockCbam(f[3], f[3], self.act, self.norm, (2, 2),
                            dropout=self.dropout, name="bottom")(down4, det)
        b2 = ConvBnRelu(f[2], self.act, self.norm, dropout=self.dropout,
                        name="bottom_2")(
            jnp.concatenate([down4, bottom], axis=-1), det)
        bottom_2 = CBAM(norm=self.norm, name="bottom_2_cbam")(b2)

        up3 = UBlock(f[2], f[1], self.act, self.norm, dropout=self.dropout,
                     name="decoder3")(
            jnp.concatenate([down3, upsample(bottom_2)], axis=-1), det)
        up2 = UBlock(f[1], f[0], self.act, self.norm, dropout=self.dropout,
                     name="decoder2")(
            jnp.concatenate([down2, upsample(up3)], axis=-1), det)
        up1 = UBlock(f[0], f[0], self.act, self.norm, dropout=self.dropout,
                     name="decoder1")(
            jnp.concatenate([down1, upsample(up2)], axis=-1), det)

        out = Conv3d(self.num_classes, 1, name="outconv")(up1)

        if self.deep_supervision:
            deeps = [
                DeepHead(self.num_classes, 8, name="deep_bottom")(bottom),
                DeepHead(self.num_classes, 8, name="deep_bottom2")(bottom_2),
                DeepHead(self.num_classes, 4, name="deep3")(up3),
                DeepHead(self.num_classes, 2, name="deep2")(up2),
            ]
            return out, deeps
        return out
