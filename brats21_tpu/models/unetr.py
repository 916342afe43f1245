"""UNETR — transformer-encoder U-Net (MONAI UNETR as configured in
definer.py:68-83: feature_size 16, hidden 768, mlp 3072, 12 heads,
perceptron position embedding, 16³ patches).

TPU notes: the ViT encoder is pure matmul (MXU sweet spot); attention runs
in bf16 with fp32 softmax accumulation. Skip connections tap hidden states
at depths 3/6/9/12 and deconvolve back to voxel grids (UNETR paper layout).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Array, Conv3d, get_norm_layer


class MHSA(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, d = x.shape
        h = self.heads
        qkv = nn.Dense(3 * self.hidden, dtype=x.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(b, n, h, d // h).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        scale = 1.0 / math.sqrt(d // h)
        att = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32) * scale
        att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(self.hidden, dtype=x.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class TransformerBlock(nn.Module):
    hidden: int
    mlp_dim: int
    heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x).astype(x.dtype)
        x = x + MHSA(self.hidden, self.heads, name="attn")(y)
        y = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x).astype(x.dtype)
        y = nn.Dense(self.mlp_dim, dtype=x.dtype, param_dtype=jnp.float32,
                     name="fc1")(y)
        y = jax.nn.gelu(y)
        y = nn.Dense(self.hidden, dtype=x.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return x + y


class _ConvNormRelu(nn.Module):
    ch: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv3d(self.ch, 3, use_bias=False, name="conv")(x)
        norm_ctor = get_norm_layer(self.norm)
        if norm_ctor is not None:
            x = norm_ctor(name="norm")(x)
        return jax.nn.leaky_relu(x, 0.01)


class _Deconv(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.ConvTranspose(self.ch, (2, 2, 2), strides=(2, 2, 2),
                                use_bias=False, dtype=x.dtype,
                                param_dtype=jnp.float32, name="deconv")(x)


class UNETR(nn.Module):
    """ViT-B/16 encoder over 16³ patches + convolutional decoder."""

    img_size: Tuple[int, int, int]
    num_classes: int = 3
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    patch: int = 16
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        b = x.shape[0]
        p = self.patch
        gd, gh, gw = (s // p for s in x.shape[1:4])
        n = gd * gh * gw
        # perceptron (linear-patch) embedding (definer.py:78 pos_embed)
        patches = x.reshape(b, gd, p, gh, p, gw, p, x.shape[-1])
        patches = patches.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, n, -1)
        tokens = nn.Dense(self.hidden_size, dtype=x.dtype,
                          param_dtype=jnp.float32, name="patch_embed")(patches)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n, self.hidden_size), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)

        taps = {}
        for i in range(self.num_layers):
            tokens = TransformerBlock(self.hidden_size, self.mlp_dim,
                                      self.num_heads, name=f"block_{i}")(tokens)
            if i + 1 in (3, 6, 9, 12):
                taps[i + 1] = tokens
        fs = self.feature_size

        def grid(t):
            return t.reshape(b, gd, gh, gw, self.hidden_size)

        # decoder (UNETR paper): z12 → deconv chain; skips from z9/z6/z3/x
        z12 = grid(taps[12])
        z9 = grid(taps[9])
        z6 = grid(taps[6])
        z3 = grid(taps[3])

        enc1 = _ConvNormRelu(fs, self.norm, name="encoder1")(x)
        enc2 = z3
        for j in range(3):  # 3 deconv+conv stages: /16 → /2
            enc2 = _Deconv(fs * 2, name=f"encoder2_up_{j}")(enc2)
            enc2 = _ConvNormRelu(fs * 2, self.norm, name=f"encoder2_conv_{j}")(enc2)
        enc3 = z6
        for j in range(2):
            enc3 = _Deconv(fs * 4, name=f"encoder3_up_{j}")(enc3)
            enc3 = _ConvNormRelu(fs * 4, self.norm, name=f"encoder3_conv_{j}")(enc3)
        enc4 = _Deconv(fs * 8, name="encoder4_up")(z9)
        enc4 = _ConvNormRelu(fs * 8, self.norm, name="encoder4_conv")(enc4)

        d = _Deconv(fs * 8, name="decoder5")(z12)
        d = _ConvNormRelu(fs * 8, self.norm, name="decoder5_conv")(
            jnp.concatenate([d, enc4], axis=-1))
        d = _Deconv(fs * 4, name="decoder4")(d)
        d = _ConvNormRelu(fs * 4, self.norm, name="decoder4_conv")(
            jnp.concatenate([d, enc3], axis=-1))
        d = _Deconv(fs * 2, name="decoder3")(d)
        d = _ConvNormRelu(fs * 2, self.norm, name="decoder3_conv")(
            jnp.concatenate([d, enc2], axis=-1))
        d = _Deconv(fs, name="decoder2")(d)
        d = _ConvNormRelu(fs, self.norm, name="decoder2_conv")(
            jnp.concatenate([d, enc1], axis=-1))
        return Conv3d(self.num_classes, 1, name="out")(d)
