"""MONAI-backed zoo members rebuilt natively: BasicUNet, SegResNet(+VAE),
HighResNet, VNet.

The reference reaches these through ``monai.networks.nets`` (definer.py:49-127);
they are part of the CLI surface (arguments_train.py:24-47), so the TPU
framework provides its own channels-last flax implementations with the same
hyperparameters the reference passes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (Array, BatchNorm, Conv3d, Dropout, GroupNorm,
                     get_act, get_norm_layer, max_pool3d, upsample)


# ---------------------------------------------------------------------------
# BasicUNet (monai.networks.nets.BasicUNet; definer.py:49-60)
# ---------------------------------------------------------------------------


class TwoConv(nn.Module):
    """conv3→norm→act ×2 (MONAI TwoConv)."""

    ch_out: int
    norm: Optional[str] = "instance"
    act: str = "leakyrelu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        norm_ctor = get_norm_layer(self.norm)
        for i in range(2):
            x = Conv3d(self.ch_out, 3, name=f"conv_{i}")(x)
            if norm_ctor is not None:
                x = norm_ctor(name=f"norm_{i}")(x)
            x = get_act(self.act)(x)
            x = Dropout(self.dropout)(x, deterministic)
        return x


class BasicUNet(nn.Module):
    """4-down/4-up U-Net with an extra final feature width (MONAI
    BasicUNet). ``features`` has 6 entries: [f0..f4, f_final]
    (definer.py:51-52 builds width·2^i for i<5 plus f0)."""

    features: Sequence[int]
    num_classes: int = 3
    act: str = "leakyrelu"
    norm: str = "instance"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        f = list(self.features)
        det = deterministic
        x0 = TwoConv(f[0], self.norm, self.act, self.dropout, name="conv_0")(x, det)
        x1 = TwoConv(f[1], self.norm, self.act, self.dropout, name="down_1")(
            max_pool3d(x0), det)
        x2 = TwoConv(f[2], self.norm, self.act, self.dropout, name="down_2")(
            max_pool3d(x1), det)
        x3 = TwoConv(f[3], self.norm, self.act, self.dropout, name="down_3")(
            max_pool3d(x2), det)
        x4 = TwoConv(f[4], self.norm, self.act, self.dropout, name="down_4")(
            max_pool3d(x3), det)

        def upcat(a, skip, up_ch, out_ch, name):
            up = nn.ConvTranspose(up_ch, (2, 2, 2), strides=(2, 2, 2),
                                  dtype=a.dtype, param_dtype=jnp.float32,
                                  name=f"{name}_upconv")(a)
            return TwoConv(out_ch, self.norm, self.act, self.dropout,
                           name=f"{name}_convs")(
                jnp.concatenate([skip, up], axis=-1), det)

        u4 = upcat(x4, x3, f[3], f[3], "upcat_4")
        u3 = upcat(u4, x2, f[2], f[2], "upcat_3")
        u2 = upcat(u3, x1, f[1], f[1], "upcat_2")
        # MONAI's upcat_1 is halves=False: the deconv keeps f[1] channels
        # and only the TwoConv narrows to the final width f[5]
        u1 = upcat(u2, x0, f[1], f[5], "upcat_1")
        return Conv3d(self.num_classes, 1, name="final_conv")(u1)


# ---------------------------------------------------------------------------
# SegResNet / SegResNetVAE (definer.py:85-110)
# ---------------------------------------------------------------------------


class ResBlock(nn.Module):
    """GN → relu → conv ×2 with residual (MONAI SegResNet ResBlock)."""

    norm_groups: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        y = GroupNorm(min(self.norm_groups, c), name="norm1")(x)
        y = jax.nn.relu(y)
        y = Conv3d(c, 3, use_bias=False, name="conv1")(y)
        y = GroupNorm(min(self.norm_groups, c), name="norm2")(y)
        y = jax.nn.relu(y)
        y = Conv3d(c, 3, use_bias=False, name="conv2")(y)
        return x + y


class SegResNet(nn.Module):
    """Encoder (1,2,2,4 ResBlocks, strided-conv downs) + (1,1,1) decoder with
    1×1 conv + trilinear up (MONAI SegResNet defaults; definer.py:85-99)."""

    init_filters: int = 8
    num_classes: int = 3
    dropout: float = 0.0
    norm: str = "group"
    blocks_down: Sequence[int] = (1, 2, 2, 4)
    blocks_up: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        f = self.init_filters
        x = Conv3d(f, 3, use_bias=False, name="conv_init")(x)
        x = Dropout(self.dropout, channel_wise=True)(x, deterministic)
        skips = []
        for i, n_blocks in enumerate(self.blocks_down):
            ch = f * 2 ** i
            if i > 0:
                x = Conv3d(ch, 3, stride=2, use_bias=False,
                           name=f"down_{i}")(x)
            for j in range(n_blocks):
                x = ResBlock(name=f"down_{i}_block_{j}")(x)
            skips.append(x)
        for i, n_blocks in enumerate(self.blocks_up):
            ch = f * 2 ** (len(self.blocks_down) - i - 2)
            x = Conv3d(ch, 1, use_bias=False, name=f"up_conv_{i}")(x)
            x = upsample(x, 2, align_corners=False)
            x = x + skips[len(self.blocks_down) - i - 2]
            for j in range(n_blocks):
                x = ResBlock(name=f"up_{i}_block_{j}")(x)
        c = x.shape[-1]
        x = GroupNorm(min(8, c), name="norm_final")(x)
        x = jax.nn.relu(x)
        return Conv3d(self.num_classes, 1, use_bias=True, name="conv_final")(x)


class SegResNetVAE(nn.Module):
    """SegResNet + VAE regularization branch (MONAI SegResNetVAE,
    definer.py:100-110).

    Output contract: ``(seg, {"vae_loss": scalar})`` — the aux dict marks
    the second element as an *additive auxiliary loss*, which
    ``deep_supervision_loss`` adds to the criterion (MONAI semantics:
    ``total = criterion(seg, target) + vae_loss``), never feeding the
    scalar to the criterion itself. During training (``deterministic=False``)
    the latent is sampled ``z = μ + σ·ε`` with the 'dropout' rng stream;
    at eval ``z = μ``."""

    input_image_size: Sequence[int]
    init_filters: int = 8
    num_classes: int = 3
    dropout: float = 0.0
    vae_nz: int = 256

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        f = self.init_filters
        blocks_down = (1, 2, 2, 4)
        xin = x
        x = Conv3d(f, 3, use_bias=False, name="conv_init")(x)
        x = Dropout(self.dropout, channel_wise=True)(x, deterministic)
        skips = []
        for i, n_blocks in enumerate(blocks_down):
            ch = f * 2 ** i
            if i > 0:
                x = Conv3d(ch, 3, stride=2, use_bias=False, name=f"down_{i}")(x)
            for j in range(n_blocks):
                x = ResBlock(name=f"down_{i}_block_{j}")(x)
            skips.append(x)
        bottom = x
        for i in range(3):
            ch = f * 2 ** (len(blocks_down) - i - 2)
            x = Conv3d(ch, 1, use_bias=False, name=f"up_conv_{i}")(x)
            x = upsample(x, 2, align_corners=False)
            x = x + skips[len(blocks_down) - i - 2]
            x = ResBlock(name=f"up_{i}_block_0")(x)
        c = x.shape[-1]
        x = GroupNorm(min(8, c), name="norm_final")(x)
        x = jax.nn.relu(x)
        seg = Conv3d(self.num_classes, 1, name="conv_final")(x)

        # VAE branch on the bottom features — mirrors MONAI SegResNetVAE's
        # module structure (vae_down = [norm, act, conv(bias), norm, act];
        # vae_fc1/2 = μ and softplus-σ heads; vae_fc_up_sample = [conv1x1,
        # upsample, norm, act]; then the shared-shape decoder stages and a
        # [norm, act, conv] reconstruction head), so reference-trained
        # checkpoints map tensor-for-tensor (utils/import_torch.py)
        v = GroupNorm(8, name="vae_norm")(bottom)
        v = jax.nn.relu(v)
        v = Conv3d(16, 3, stride=2, name="vae_down")(v)
        v = GroupNorm(8, name="vae_down_norm")(v)
        v = jax.nn.relu(v)
        flat = v.reshape(v.shape[0], -1)
        mu = nn.Dense(self.vae_nz, param_dtype=jnp.float32, name="vae_mu")(flat)
        sigma = jax.nn.softplus(nn.Dense(
            self.vae_nz, param_dtype=jnp.float32, name="vae_sigma")(flat))
        if deterministic:
            z = mu
        else:
            eps = jax.random.normal(self.make_rng("dropout"), mu.shape,
                                    jnp.float32)
            z = mu + sigma * eps
        d = nn.Dense(flat.shape[-1], param_dtype=jnp.float32,
                     name="vae_fc_up")(z)
        d = jax.nn.relu(d).reshape(v.shape)
        d = upsample(Conv3d(f * 8, 1, use_bias=False,
                            name="vae_up_conv")(d), 2,
                     align_corners=False)
        d = GroupNorm(8, name="vae_up_norm")(d)
        d = jax.nn.relu(d)
        for i in range(3):
            ch = f * 2 ** (2 - i)
            d = Conv3d(ch, 1, use_bias=False, name=f"vae_up_{i}")(d)
            d = upsample(d, 2, align_corners=False)
            d = ResBlock(name=f"vae_up_block_{i}")(d)
        d = GroupNorm(min(8, d.shape[-1]), name="vae_final_norm")(d)
        d = jax.nn.relu(d)
        recon = Conv3d(xin.shape[-1], 1, name="vae_recon")(d)
        vae_loss = jnp.mean((recon - xin) ** 2) + 0.5 * jnp.mean(
            mu ** 2 + sigma ** 2 - jnp.log(sigma ** 2 + 1e-8) - 1)
        return seg, {"vae_loss": vae_loss.astype(jnp.float32)}


# ---------------------------------------------------------------------------
# HighResNet (definer.py:111-119)
# ---------------------------------------------------------------------------


class HighResBlock(nn.Module):
    """(norm → act → dilated conv) ×2 with channel-pad residual (MONAI
    HighResBlock, channel_matching='pad'; convs keep torch's default
    bias=True — in this pre-activation layout the conv is the last op)."""

    ch: int
    dilation: int
    norm: str = "batch"
    act: str = "relu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        norm_ctor = get_norm_layer(self.norm)
        y = x
        for i in range(2):
            if norm_ctor is not None:
                y = norm_ctor(name=f"norm_{i}")(y)
            y = get_act(self.act)(y)
            y = Conv3d(self.ch, 3, dilation=self.dilation,
                       name=f"conv_{i}")(y)
        if x.shape[-1] != self.ch:
            # MONAI ChannelPad (channel_matching='pad') SPLITS the pad:
            # (out-in)//2 channels before, the remainder after — input
            # channel c lands on output channel c + (out-in)//2, so a
            # trailing-only pad silently misaligns every grown residual
            # of an imported real MONAI checkpoint
            grow = self.ch - x.shape[-1]
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                        + [(grow // 2, grow - grow // 2)])
        return x + y


class HighResNet(nn.Module):
    """Dilated residual network (MONAI HighResNet defaults: 3 groups of 3
    blocks at dilations 1/2/4, widths 16/32/64; definer.py:111-119).

    Layout mirrors MONAI's blocks Sequential: ConvNormActi(conv→norm→act),
    9 HighResBlocks, ConvNormActi(80, k1, +dropout), and a bare final conv
    — so reference checkpoints map tensor-for-tensor
    (utils/import_torch.py `_make_highresnet_rule`). norm='batch' is a real
    running-stats BatchNorm (MONAI's default ('batch', {'affine': True}))."""

    num_classes: int = 3
    act: str = "relu"
    norm: str = "batch"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        norm_ctor = get_norm_layer(self.norm)
        x = Conv3d(16, 3, name="conv_init")(x)
        if norm_ctor is not None:
            x = norm_ctor(name="norm_init")(x)
        x = get_act(self.act)(x)
        for gi, (ch, dil) in enumerate([(16, 1), (32, 2), (64, 4)]):
            for bi in range(3):
                x = HighResBlock(ch, dil, self.norm, self.act,
                                 name=f"res_{gi}_{bi}")(x)
        x = Conv3d(80, 1, name="conv_penult")(x)
        if norm_ctor is not None:
            x = norm_ctor(name="norm_penult")(x)
        x = get_act(self.act)(x)
        x = Dropout(self.dropout, channel_wise=True)(x, deterministic)
        return Conv3d(self.num_classes, 1, name="conv_final")(x)


# ---------------------------------------------------------------------------
# VNet (definer.py:120-127)
# ---------------------------------------------------------------------------


class _VLUConvs(nn.Module):
    """MONAI ``_make_nconv``: a chain of LUConvs — 5³ conv(bias) →
    BatchNorm → act (vnet.py LUConv: Convolution(k5, act=None, norm=BATCH)
    followed by the activation)."""

    ch: int
    n: int
    act: str = "elu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for k in range(self.n):
            x = Conv3d(self.ch, 5, padding=2, name=f"ops_{k}_conv")(x)
            x = BatchNorm(name=f"ops_{k}_norm")(x)
            x = get_act(self.act)(x)
        return x


class _VInputTransition(nn.Module):
    """MONAI InputTransition: 5³ conv→BN, residual add of the
    channel-tiled input, then act."""

    act: str = "elu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = Conv3d(16, 5, padding=2, name="conv")(x)
        out = BatchNorm(name="norm")(out)
        rep = 16 // x.shape[-1]
        return get_act(self.act)(out + jnp.tile(x, (1, 1, 1, 1, rep)))


class _VDownTransition(nn.Module):
    """MONAI DownTransition: 2³/s2 conv→BN→act, optional dropout, LUConv
    chain, residual add, act."""

    out_ch: int
    nconvs: int
    act: str = "elu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        down = Conv3d(self.out_ch, 2, stride=2, padding=0,
                      name="down_conv")(x)
        down = get_act(self.act)(BatchNorm(name="bn1")(down))
        out = Dropout(self.dropout, channel_wise=True)(down,
                      deterministic)
        out = _VLUConvs(self.out_ch, self.nconvs, self.act, name="ops")(out)
        return get_act(self.act)(out + down)


class _VUpTransition(nn.Module):
    """MONAI UpTransition: dropout(x) + ALWAYS dropout(0.5) on the skip,
    2³/s2 transposed conv→BN→act, concat, LUConv chain, residual add,
    act."""

    out_ch: int
    nconvs: int
    act: str = "elu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, skip: Array,
                 deterministic: bool = True) -> Array:
        out = Dropout(self.dropout, channel_wise=True)(x, deterministic)
        skip = Dropout(0.5, channel_wise=True)(skip, deterministic)
        up = nn.ConvTranspose(self.out_ch // 2, (2, 2, 2), strides=(2, 2, 2),
                              dtype=out.dtype, param_dtype=jnp.float32,
                              name="up_conv")(out)
        up = get_act(self.act)(BatchNorm(name="bn1")(up))
        xcat = jnp.concatenate([up, skip], axis=-1)
        y = _VLUConvs(self.out_ch, self.nconvs, self.act, name="ops")(xcat)
        return get_act(self.act)(y + xcat)


class _VOutputTransition(nn.Module):
    """MONAI OutputTransition: 5³ conv→BN→act then a 1×1 conv at
    num_classes channels."""

    num_classes: int
    act: str = "elu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = Conv3d(self.num_classes, 5, padding=2, name="conv")(x)
        out = get_act(self.act)(BatchNorm(name="norm")(out))
        return Conv3d(self.num_classes, 1, name="conv2")(out)


class VNet(nn.Module):
    """V-Net (Milletari et al.) in MONAI's exact layout (vnet.py;
    definer.py:120-127): in_tr / down_tr{32,64,128,256} (1,2,3,2 LUConvs) /
    up_tr{256,128,64,32} (2,2,1,1 LUConvs) / out_tr, batch-norm running
    stats throughout, dropout on the two deepest down/up transitions plus
    MONAI's fixed 0.5 skip dropout in every up transition (train only) —
    reference checkpoints map tensor-for-tensor (utils/import_torch.py
    `_torch_key_vnet`)."""

    num_classes: int = 3
    act: str = "elu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        det = deterministic
        y16 = _VInputTransition(self.act, name="in_tr")(x)
        d32 = _VDownTransition(32, 1, self.act, 0.0, name="down_tr32")(
            y16, det)
        d64 = _VDownTransition(64, 2, self.act, 0.0, name="down_tr64")(
            d32, det)
        d128 = _VDownTransition(128, 3, self.act, self.dropout,
                                name="down_tr128")(d64, det)
        d256 = _VDownTransition(256, 2, self.act, self.dropout,
                                name="down_tr256")(d128, det)
        u256 = _VUpTransition(256, 2, self.act, self.dropout,
                              name="up_tr256")(d256, d128, det)
        u128 = _VUpTransition(128, 2, self.act, self.dropout,
                              name="up_tr128")(u256, d64, det)
        u64 = _VUpTransition(64, 1, self.act, 0.0, name="up_tr64")(
            u128, d32, det)
        u32 = _VUpTransition(32, 1, self.act, 0.0, name="up_tr32")(
            u64, y16, det)
        return _VOutputTransition(self.num_classes, self.act,
                                  name="out_tr")(u32)
