"""DynUNet — nnU-Net-style configurable U-Net (MONAI DynUNet as wrapped by
reference WrapperDynUNet, unet_family.py:503-523; config in definer.py:61-67:
6 levels, 3³ kernels, strides (1,2,2,2,2,2), deep supervision over 3 heads).

The wrapper's behaviour is preserved: in training mode with deep supervision
the output is [main, deep1, deep2, deep3] with the deep heads upsampled to
full resolution; in eval only the main head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Array, Conv3d, get_act, get_norm_layer
from .unet_family import upsample_nearest


class _ConvNormAct(nn.Module):
    ch: int
    stride: int = 1
    norm: str = "instance"
    act: str = "leakyrelu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv3d(self.ch, 3, stride=self.stride, use_bias=False,
                   name="conv")(x)
        norm_ctor = get_norm_layer(self.norm)
        if norm_ctor is not None:
            x = norm_ctor(name="norm")(x)
        return get_act(self.act)(x)


class _DynBlock(nn.Module):
    """Two conv-norm-act layers, first optionally strided (MONAI
    UnetBasicBlock)."""

    ch: int
    stride: int = 1
    norm: str = "instance"
    act: str = "leakyrelu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = _ConvNormAct(self.ch, self.stride, self.norm, self.act,
                         name="layer0")(x)
        return _ConvNormAct(self.ch, 1, self.norm, self.act, name="layer1")(x)


class DynUNet(nn.Module):
    """6-level DynUNet: filters 32·2^i capped at 320 (nnU-Net rule),
    strided-conv downs, transposed-conv ups, deep supervision on the last 3
    decoder levels."""

    num_classes: int = 3
    norm: str = "instance"
    act: str = "leakyrelu"
    deep_supr_num: int = 3
    levels: int = 6

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        filters = [min(32 * 2 ** i, 320) for i in range(self.levels)]
        skips = []
        y = _DynBlock(filters[0], 1, self.norm, self.act, name="input_block")(x)
        skips.append(y)
        for i in range(1, self.levels):
            y = _DynBlock(filters[i], 2, self.norm, self.act,
                          name=f"down_{i}")(y)
            if i < self.levels - 1:
                skips.append(y)

        heads = []
        for i in range(self.levels - 2, -1, -1):
            y = nn.ConvTranspose(filters[i], (2, 2, 2), strides=(2, 2, 2),
                                 use_bias=False, dtype=y.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"up_{i}_transp")(y)
            y = _DynBlock(filters[i], 1, self.norm, self.act,
                          name=f"up_{i}_block")(
                jnp.concatenate([y, skips[i]], axis=-1))
            heads.append((i, y))

        main = Conv3d(self.num_classes, 1, name="out_main")(heads[-1][1])
        deeps = []
        # deep heads from the deep_supr_num levels above the final one
        for j in range(2, 2 + self.deep_supr_num):
            lvl, feat = heads[-j]
            h = Conv3d(self.num_classes, 1, name=f"out_deep_{j - 1}")(feat)
            deeps.append(upsample_nearest(h, 2 ** lvl))
        return main, deeps
