"""Generic 3D U-Net family (reference networks/unet_family.py, adapted from
LeeJunHyun): UnetFamily (modified_unet), R2Unet, AttUnet, R2AttUnet —
channels-last flax. Upsampling here is nearest (torch ``nn.Upsample``
default, unet_family.py:43,170-172,231), unlike the trilinear equiunet line.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (Array, BatchNorm, Conv3d, get_act, get_norm_layer,
                     max_pool3d)


def upsample_nearest(x: Array, scale: int = 2) -> Array:
    b, d, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :, None, :],
                         (b, d, scale, h, scale, w, scale, c))
    return y.reshape(b, d * scale, h * scale, w * scale, c)


class ConvBlock(nn.Module):
    """(conv3 → norm → act) ×2 (unet_family.py:13-35); convs keep their bias
    even with norms (reference uses bias=True throughout)."""

    ch_out: int
    norm: Optional[str] = "group"
    act: str = "relu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        norm_ctor = get_norm_layer(self.norm)
        for i in range(2):
            x = Conv3d(self.ch_out, 3, name=f"conv{i + 1}")(x)
            if norm_ctor is not None:
                x = norm_ctor(name=f"norm{i + 1}")(x)
            x = get_act(self.act)(x)
        return x


class UpConv(nn.Module):
    """nearest ×2 upsample → conv3 → norm → act (unet_family.py:38-57)."""

    ch_out: int
    norm: Optional[str] = "group"
    act: str = "relu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = upsample_nearest(x)
        x = Conv3d(self.ch_out, 3, name="conv")(x)
        norm_ctor = get_norm_layer(self.norm)
        if norm_ctor is not None:
            x = norm_ctor(name="norm")(x)
        return get_act(self.act)(x)


class RecurrentBlock(nn.Module):
    """t-step recurrent conv (unet_family.py:60-86): x1 = conv(x + x1)
    with shared weights."""

    ch_out: int
    norm: Optional[str] = "group"
    act: str = "relu"
    t: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = Conv3d(self.ch_out, 3, name="conv")
        norm_ctor = get_norm_layer(self.norm)
        norm = norm_ctor(name="norm") if norm_ctor is not None else None

        def step(v: Array) -> Array:
            y = conv(v)
            if norm is not None:
                y = norm(y)
            return get_act(self.act)(y)

        x1 = step(x)
        for _ in range(self.t):
            x1 = step(x + x1)
        return x1


class RRCNNBlock(nn.Module):
    """1×1 conv → two recurrent blocks → residual (unet_family.py:89-101)."""

    ch_out: int
    norm: Optional[str] = "group"
    act: str = "relu"
    t: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv3d(self.ch_out, 1, name="conv_1x1")(x)
        x1 = RecurrentBlock(self.ch_out, self.norm, self.act, self.t,
                            name="rec1")(x)
        x1 = RecurrentBlock(self.ch_out, self.norm, self.act, self.t,
                            name="rec2")(x1)
        return x + x1


class AttentionBlock(nn.Module):
    """Additive attention gate (unet_family.py:104-131); the gate's norms
    are BatchNorm in the reference regardless of the model norm."""

    f_int: int
    act: str = "relu"

    @nn.compact
    def __call__(self, g: Array, x: Array, train: bool = False) -> Array:
        g1 = Conv3d(self.f_int, 1, name="W_g")(g)
        g1 = BatchNorm(name="bn_g")(g1, use_running_average=not train)
        x1 = Conv3d(self.f_int, 1, name="W_x")(x)
        x1 = BatchNorm(name="bn_x")(x1, use_running_average=not train)
        psi = get_act(self.act)(g1 + x1)
        psi = Conv3d(1, 1, name="psi")(psi)
        psi = BatchNorm(name="bn_psi")(psi, use_running_average=not train)
        psi = jax.nn.sigmoid(psi)
        return x * psi


class _FamilyBase(nn.Module):
    """Shared forward skeleton: 4-level encoder, 3 up-stages, 4-head deep
    supervision (d1, then nearest-upsampled outconv4/3/2 heads,
    unet_family.py:180-217)."""

    features: Sequence[int]
    num_classes: int = 3
    norm: Optional[str] = "group"
    act: str = "relu"
    deep_supervision: bool = True
    attention: bool = False
    recurrent: bool = False
    t: int = 2

    def _enc_block(self, ch: int, name: str):
        if self.recurrent:
            return RRCNNBlock(ch, self.norm, self.act, self.t, name=name)
        return ConvBlock(ch, self.norm, self.act, name=name)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        f = list(self.features)
        x1 = self._enc_block(f[0], "Conv1")(x)
        x2 = self._enc_block(f[1], "Conv2")(max_pool3d(x1))
        x3 = self._enc_block(f[2], "Conv3")(max_pool3d(x2))
        x4 = self._enc_block(f[3], "Conv4")(max_pool3d(x3))

        d4 = UpConv(f[2], self.norm, self.act, name="Up4")(x4)
        if self.attention:
            x3 = AttentionBlock(f[1], self.act, name="Att4")(d4, x3)
        d4_up = self._enc_block(f[2], "Up_conv4")(
            jnp.concatenate([x3, d4], axis=-1))

        d3 = UpConv(f[1], self.norm, self.act, name="Up3")(d4_up)
        if self.attention:
            x2 = AttentionBlock(f[0], self.act, name="Att3")(d3, x2)
        d3_up = self._enc_block(f[1], "Up_conv3")(
            jnp.concatenate([x2, d3], axis=-1))

        d2 = UpConv(f[0], self.norm, self.act, name="Up2")(d3_up)
        if self.attention:
            x1 = AttentionBlock(max(f[0] // 2, 1), self.act, name="Att2")(d2, x1)
        d2_up = self._enc_block(f[0], "Up_conv2")(
            jnp.concatenate([x1, d2], axis=-1))

        d1 = Conv3d(self.num_classes, 1, name="Conv_1x1")(d2_up)

        if self.deep_supervision:
            h4 = upsample_nearest(
                Conv3d(self.num_classes, 1, name="outconv4")(x4), 8)
            h3 = upsample_nearest(
                Conv3d(self.num_classes, 1, name="outconv3")(d4_up), 4)
            h2 = upsample_nearest(
                Conv3d(self.num_classes, 1, name="outconv2")(d3_up), 2)
            return d1, [h2, h3, h4]
        return d1


class UnetFamily(_FamilyBase):
    """'modified_unet' (unet_family.py:134-217)."""
    attention: bool = False
    recurrent: bool = False


class R2Unet(_FamilyBase):
    """Recurrent-residual U-Net (unet_family.py:220-308)."""
    attention: bool = False
    recurrent: bool = True


class AttUnet(_FamilyBase):
    """Attention U-Net (unet_family.py:311-402)."""
    attention: bool = True
    recurrent: bool = False


class R2AttUnet(_FamilyBase):
    """Recurrent-residual attention U-Net (unet_family.py:405-500)."""
    attention: bool = True
    recurrent: bool = True
