"""UNETR — transformer-encoder U-Net (MONAI UNETR as configured in
definer.py:68-83: feature_size 16, hidden 768, mlp 3072, 12 heads,
perceptron position embedding, 16³ patches).

Structure mirrors MONAI 0.6's module graph so reference-trained checkpoints
map tensor-for-tensor (utils/import_torch.py `_torch_key_unetr`):

  * ViT: perceptron patch embedding (Linear over (x y z c)-ordered patch
    voxels), learned position embeddings, 12 pre-norm blocks with bias-free
    fused qkv (head-major split), exact GELU MLP, and a FINAL LayerNorm;
    skip taps are the hidden states after blocks 4/7/10 (MONAI taps
    hidden_states_out[3]/[6]/[9]).
  * decoder: UnetrBasicBlock/UnetrUpBlock with res_block=True (MONAI's
    default) — pre-norm residual conv blocks with a 1×1 projection
    shortcut; UnetrPrUpBlock feature chains are bare transposed convs
    (conv_block=False default).

TPU notes: the ViT encoder is pure matmul (MXU sweet spot); attention runs
in bf16 with fp32 softmax accumulation.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Array, Conv3d, get_norm_layer


class MHSA(nn.Module):
    """MONAI SABlock: fused qkv Linear (bias=False), output layout
    (qkv, head, dim) over the last axis, scale = head_dim**-0.5."""

    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, _ = x.shape
        h = self.heads
        d = self.hidden // h
        qkv = nn.Dense(3 * self.hidden, use_bias=False, dtype=x.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        # MONAI: Rearrange("b t (qkv l d) -> qkv b l t d", qkv=3, l=heads)
        qkv = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = 1.0 / math.sqrt(d)
        att = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32) * scale
        att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden)
        return nn.Dense(self.hidden, dtype=x.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class TransformerBlock(nn.Module):
    """MONAI TransformerBlock: x + attn(norm1(x)); x + mlp(norm2(x)) with
    exact (non-tanh) GELU and torch LayerNorm eps=1e-5."""

    hidden: int
    mlp_dim: int
    heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="ln1")(x).astype(x.dtype)
        x = x + MHSA(self.hidden, self.heads, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="ln2")(x).astype(x.dtype)
        y = nn.Dense(self.mlp_dim, dtype=x.dtype, param_dtype=jnp.float32,
                     name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden, dtype=x.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return x + y


class _UnetResBlock(nn.Module):
    """MONAI UnetResBlock (dynunet_block.py): conv→norm→lrelu→conv→norm
    plus a 1×1 conv→norm shortcut when shape changes, lrelu after the
    residual add. Convs are bias-free; instance norms are affine."""

    ch: int
    stride: int = 1
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        norm_ctor = get_norm_layer(self.norm)
        y = Conv3d(self.ch, 3, stride=self.stride, use_bias=False,
                   name="conv1")(x)
        y = norm_ctor(name="norm1")(y)
        y = jax.nn.leaky_relu(y, 0.01)
        y = Conv3d(self.ch, 3, use_bias=False, name="conv2")(y)
        y = norm_ctor(name="norm2")(y)
        res = x
        if x.shape[-1] != self.ch or self.stride != 1:
            res = Conv3d(self.ch, 1, stride=self.stride, use_bias=False,
                         name="conv3")(x)
            res = norm_ctor(name="norm3")(res)
        return jax.nn.leaky_relu(y + res, 0.01)


class _Deconv(nn.Module):
    """Bare 2³/s2 transposed conv (MONAI get_conv_layer(is_transposed=True,
    conv_only=True), bias=False)."""

    ch: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.ConvTranspose(self.ch, (2, 2, 2), strides=(2, 2, 2),
                                use_bias=False, dtype=x.dtype,
                                param_dtype=jnp.float32, name="deconv")(x)


class UNETR(nn.Module):
    """ViT-B/16 encoder over 16³ patches + res-block convolutional decoder
    (MONAI UNETR, res_block=True / conv_block=False defaults)."""

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
        # perceptron (linear-patch) embedding: token features ordered
        # (x y z c) exactly like MONAI's Rearrange (definer.py:78 pos_embed)
        patches = x.reshape(b, gd, p, gh, p, gw, p, x.shape[-1])
        patches = patches.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, n, -1)
        tokens = nn.Dense(self.hidden_size, dtype=x.dtype,
                          param_dtype=jnp.float32, name="patch_embed")(patches)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n, self.hidden_size), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)

        # MONAI taps hidden_states_out[3]/[6]/[9] = AFTER blocks 4/7/10;
        # the final state additionally passes the ViT's closing LayerNorm
        taps = {}
        for i in range(self.num_layers):
            tokens = TransformerBlock(self.hidden_size, self.mlp_dim,
                                      self.num_heads, name=f"block_{i}")(tokens)
            if i in (3, 6, 9):
                taps[i] = tokens
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="vit_norm")(tokens).astype(x.dtype)
        fs = self.feature_size

        def grid(t):
            return t.reshape(b, gd, gh, gw, self.hidden_size)

        z3, z6, z9, z12 = grid(taps[3]), grid(taps[6]), grid(taps[9]), \
            grid(tokens)

        enc1 = _UnetResBlock(fs, 1, self.norm, name="encoder1")(x)
        enc2 = z3                       # 3 bare deconvs: /16 → /2
        for j in range(3):
            enc2 = _Deconv(fs * 2, name=f"encoder2_transp_{j}")(enc2)
        enc3 = z6                       # 2 bare deconvs: /16 → /4
        for j in range(2):
            enc3 = _Deconv(fs * 4, name=f"encoder3_transp_{j}")(enc3)
        enc4 = _Deconv(fs * 8, name="encoder4_transp_0")(z9)   # /16 → /8

        def up_block(inp, skip, ch, name):
            u = _Deconv(ch, name=f"{name}_transp")(inp)
            return _UnetResBlock(ch, 1, self.norm, name=f"{name}_res")(
                jnp.concatenate([u, skip], axis=-1))

        d = up_block(z12, enc4, fs * 8, "decoder5")
        d = up_block(d, enc3, fs * 4, "decoder4")
        d = up_block(d, enc2, fs * 2, "decoder3")
        d = up_block(d, enc1, fs, "decoder2")
        return Conv3d(self.num_classes, 1, name="out")(d)
