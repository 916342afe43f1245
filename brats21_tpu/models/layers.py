"""Core 3D layers, norms, activations and resizes — channels-last, TPU-first.

Everything here operates on ``[B, D, H, W, C]`` arrays so that XLA lowers 3D
convolutions straight onto the MXU without layout transposes (the reference is
channels-first torch: networks/equiunet2020.py:19-48, networks/factory.py:179-224).

Trilinear ``align_corners=True`` resizing (torch ``nn.Upsample`` semantics,
equiunet2020.py:351,439) is implemented as per-axis interpolation *matmuls* —
small dense [out, in] operators applied with einsum, which the MXU eats for
free, instead of gather chains.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

#: torch ``kaiming_normal_(a=0, mode='fan_out')`` (factory.py:212):
#: std = sqrt(2 / fan_out) with fan_out = C_out * prod(kernel).
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")

#: torch default conv init (kaiming_uniform with a=sqrt(5)) — variance
#: 1/(3*fan_in) uniform. Used by EquiUnetASSPEvo which never calls
#: init_weights (equiunet2021.py:287).
torch_default_conv = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def init_by_name(name: str, gain: float = 0.02) -> Callable:
    """Reference factory.py:203-224 init registry."""
    if name == "normal":
        return nn.initializers.normal(stddev=gain)
    if name == "xavier":
        return nn.initializers.xavier_normal()
    if name == "kaiming":
        return kaiming_normal_fan_out
    if name == "orthogonal":
        return nn.initializers.orthogonal(scale=gain)
    if name == "torch_default":
        return torch_default_conv
    raise NotImplementedError(f"initialization method [{name}] is not implemented")


# ---------------------------------------------------------------------------
# Activations (reference factory.py:195-200, MONAI Act registry)
# ---------------------------------------------------------------------------

_ACTS: dict[str, Callable[[Array], Array]] = {
    "relu": jax.nn.relu,
    "leakyrelu": partial(jax.nn.leaky_relu, negative_slope=0.01),
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softmax": partial(jax.nn.softmax, axis=-1),
    "prelu": partial(jax.nn.leaky_relu, negative_slope=0.25),  # torch PReLU init value
}


def get_act(name: str) -> Callable[[Array], Array]:
    key = name.lower()
    if key not in _ACTS:
        raise ValueError(f"unknown activation {name!r}; choices: {sorted(_ACTS)}")
    return _ACTS[key]


# ---------------------------------------------------------------------------
# Norms (reference factory.py:125-192)
# ---------------------------------------------------------------------------


class GroupNorm(nn.Module):
    """GroupNorm(8) with torch semantics: biased variance, eps=1e-5, affine.

    Channels-last input; normalizes each group over (D, H, W, C//G).
    Reference: factory.py:182 ``nn.GroupNorm(8, C, affine=True)``.
    """

    num_groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        g = min(self.num_groups, c)
        if c % g:
            raise ValueError(f"channels {c} not divisible by groups {g}")
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        spatial = xf.shape[1:-1]
        grouped = xf.reshape(xf.shape[0], *spatial, g, c // g)
        axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
        mean = grouped.mean(axis=axes, keepdims=True)
        var = grouped.var(axis=axes, keepdims=True)
        grouped = (grouped - mean) * jax.lax.rsqrt(var + self.eps)
        xf = grouped.reshape(xf.shape)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (xf * scale + bias).astype(orig_dtype)


class InstanceNorm(nn.Module):
    """InstanceNorm3d with affine=True (factory.py:188): per-sample,
    per-channel normalization over spatial dims, biased variance, eps=1e-5."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, xf.ndim - 1))
        mean = xf.mean(axis=axes, keepdims=True)
        var = xf.var(axis=axes, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (xf * scale + bias).astype(orig_dtype)


class BatchNorm(nn.Module):
    """BatchNorm3d equivalent (factory.py:186). Uses flax running stats with
    torch momentum 0.1 (flax momentum = 0.9), eps=1e-5."""

    use_running_average: Optional[bool] = None
    eps: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x: Array, use_running_average: Optional[bool] = None) -> Array:
        if use_running_average is not None:
            ura = use_running_average
        elif self.use_running_average is not None:
            ura = self.use_running_average
        else:
            # convention: training mode iff the train step opened the
            # batch_stats collection as mutable (train_state.make_train_step)
            ura = not self.is_mutable_collection("batch_stats")
        return nn.BatchNorm(
            use_running_average=ura, momentum=self.momentum, epsilon=self.eps,
            dtype=jnp.float32, axis_name=None)(x)


class BCNorm(nn.Module):
    """Batch-channel norm (factory.py:125-146): an (estimated) batch norm
    followed by a group-wise standardization with per-group affine.

    The reference ``estimate=True`` path uses EstBN whose moving speed buffer
    is zero-initialised (factory.py:159) — i.e. running stats never update and
    it reduces to an affine transform with frozen unit stats; we reproduce
    that fixed-stat behaviour, then the group-batch standardization.
    """

    num_groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        # EstBN with frozen running stats (mean 0, var 1): affine only.
        w = self.param("estbn_scale", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("estbn_bias", nn.initializers.zeros, (c,), jnp.float32)
        out = xf / math.sqrt(1.0 + 1e-5) * w + b
        # group standardization over (batch*groups, -1) as in factory.py:141-145
        n = out.shape[0]
        g = self.num_groups
        flat = jnp.moveaxis(out, -1, 1).reshape(1, n * g, -1)
        mean = flat.mean(axis=-1, keepdims=True)
        var = flat.var(axis=-1, keepdims=True)
        flat = (flat - mean) * jax.lax.rsqrt(var + self.eps)
        gw = self.param("scale", nn.initializers.ones, (1, g, 1), jnp.float32)
        gb = self.param("bias", nn.initializers.zeros, (1, g, 1), jnp.float32)
        flat = flat.reshape(n, g, -1) * gw + gb
        out = jnp.moveaxis(flat.reshape(n, c, *x.shape[1:-1]), 1, -1)
        return out.astype(orig_dtype)


def get_norm_layer(norm_type: Optional[str]) -> Optional[Callable[..., nn.Module]]:
    """Norm factory mirroring factory.py:179-192. Returns a module ctor or
    None (norm 'none' → conv keeps its bias, equiunet2020.py:67-75)."""
    if norm_type in (None, "none"):
        return None
    if norm_type == "group":
        return partial(GroupNorm, num_groups=8)
    if norm_type == "batch":
        return BatchNorm
    if norm_type == "instance":
        return InstanceNorm
    if norm_type == "bcn":
        return partial(BCNorm, num_groups=8)
    raise ValueError("Norm type is not correct")


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


@lru_cache()
def _pallas_conv_default() -> bool:
    """Route eligible 3³ convs through the Pallas im2col GEMM
    (ops/pallas/conv3d_kernel.py) when BRATS21_PALLAS_CONV=1 AND the
    backend can run Pallas (TPU, or interpret mode — ops.pallas.enabled);
    a raw env flag on a CPU run would crash in lowering. Off by default
    until a measured win (docs/BENCHMARKS.md: Mosaic currently cannot
    express the C=48 im2col)."""
    import os
    from ..ops.pallas import enabled
    return (os.environ.get("BRATS21_PALLAS_CONV", "0") not in (
        "0", "false", "False")) and enabled()


class _Conv3dCore(nn.Module):
    """The conv compute with nn.Conv-compatible parameters (kernel
    ``[k,k,k,C_in/fg,C_out]``, bias ``[C_out]``) so checkpoints keep the
    ``Conv_0/kernel|bias`` tree; dispatches the hot 3³/stride-1/dilation-1
    case to the Pallas im2col conv on request."""

    features: int
    kernel_size: int
    stride: int
    dilation: int
    use_bias: bool
    pad: int
    kernel_init: Callable
    feature_group_count: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (k, k, k, c_in // self.feature_group_count, self.features),
            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)

        pallas_ok = (k == 3 and self.stride == 1 and self.dilation == 1
                     and self.feature_group_count == 1 and self.pad == 1
                     and not self.is_initializing()
                     and _pallas_conv_default())
        if pallas_ok:
            from ..ops.pallas.conv3d_kernel import conv3x3x3
            b = (bias if bias is not None
                 else jnp.zeros((self.features,), jnp.float32))
            return conv3x3x3(x, kernel.astype(x.dtype), b)

        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (self.stride,) * 3,
            [(self.pad, self.pad)] * 3,
            rhs_dilation=(self.dilation,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class Conv3d(nn.Module):
    """3D convolution, channels-last, torch-style symmetric padding.

    kernel 3 / dilation d → pad d each side (conv3x3, equiunet2020.py:19-25);
    kernel 1 → no pad (conv1x1, :37-41). Compute dtype follows input (bf16
    under the mixed-precision policy); params stay fp32.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    padding: Optional[int] = None  # default: dilation * (kernel-1) // 2
    kernel_init: Callable = kaiming_normal_fan_out
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        pad = self.padding if self.padding is not None else self.dilation * (k - 1) // 2
        return _Conv3dCore(
            features=self.features, kernel_size=k, stride=self.stride,
            dilation=self.dilation, use_bias=self.use_bias, pad=pad,
            kernel_init=self.kernel_init,
            feature_group_count=self.feature_group_count,
            name="Conv_0")(x)


class WSConv3d(nn.Module):
    """Weight-standardized conv (factory.py:13-29): weights are mean-centred
    per output channel and divided by (std + 1e-5) before the conv."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Callable = kaiming_normal_fan_out

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, k, c_in, self.features), jnp.float32)
        # flax kernel layout [kd,kh,kw,in,out]; standardize over all but out.
        mean = kernel.mean(axis=(0, 1, 2, 3), keepdims=True)
        w = kernel - mean
        # torch .std() default is unbiased (ddof=1) over the flattened kernel
        flat = w.reshape(-1, self.features)
        std = flat.std(axis=0, ddof=1) + 1e-5
        w = w / std
        pad = self.dilation * (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(self.stride,) * 3,
            padding=[(pad, pad)] * 3,
            rhs_dilation=(self.dilation,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class ConvAWS3d(nn.Module):
    """Adaptive weight standardization (factory.py:32-87): standardized
    weights re-scaled by learnable-free buffers gamma/beta (init 1/0)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Callable = kaiming_normal_fan_out

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, k, c_in, self.features), jnp.float32)
        gamma = self.variable("buffers", "weight_gamma",
                              lambda: jnp.ones((self.features,), jnp.float32))
        beta = self.variable("buffers", "weight_beta",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        flat = kernel.reshape(-1, self.features)
        mean = flat.mean(axis=0)
        std = jnp.sqrt(flat.var(axis=0, ddof=1) + 1e-5)
        w = (kernel - mean) / std
        w = gamma.value * w + beta.value
        pad = self.dilation * (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(self.stride,) * 3,
            padding=[(pad, pad)] * 3,
            rhs_dilation=(self.dilation,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------


def max_pool3d(x: Array, window: int = 2, stride: Optional[int] = None,
               ceil_mode: bool = False) -> Array:
    """MaxPool3d(2,2) (equiunet2020.py:342; ceil_mode variant :274)."""
    stride = stride or window
    pads = []
    for d in x.shape[1:4]:
        if ceil_mode and d % stride:
            pads.append((0, stride - d % stride))
        else:
            pads.append((0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, window, 1),
        window_strides=(1, stride, stride, stride, 1),
        padding=[(0, 0)] + pads + [(0, 0)])


def avg_pool3d(x: Array, window: int = 2, stride: Optional[int] = None) -> Array:
    stride = stride or window
    if stride == window and all(s % window == 0 for s in x.shape[1:4]):
        # reshape-mean: differentiable and fuses cleanly
        b, d, h, w, c = x.shape
        y = x.reshape(b, d // window, window, h // window, window,
                      w // window, window, c)
        return y.mean(axis=(2, 4, 6))
    from flax import linen as _nn
    return _nn.avg_pool(x, (window,) * 3, strides=(stride,) * 3)


def max_avg_pool(x: Array, window: int = 2) -> Array:
    """MONAI MaxAvgPool: concat(maxpool, avgpool) on channels — the
    channel-doubling downsample of EquiUnetASSPEvo (equiunet2021.py:261)."""
    return jnp.concatenate([max_pool3d(x, window), avg_pool3d(x, window)], axis=-1)


def global_avg_pool(x: Array) -> Array:
    return x.mean(axis=tuple(range(1, x.ndim - 1)))


def global_max_pool(x: Array) -> Array:
    return x.max(axis=tuple(range(1, x.ndim - 1)))


# ---------------------------------------------------------------------------
# Trilinear resize (align_corners=True) as per-axis matmuls
# ---------------------------------------------------------------------------


def _linear_interp_matrix(n_in: int, n_out: int, align_corners: bool = True) -> np.ndarray:
    """[n_out, n_in] row-stochastic linear interpolation operator matching
    torch ``F.interpolate(mode='trilinear', align_corners=...)`` per axis."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = max((i + 0.5) * n_in / n_out - 0.5, 0.0)
        i0 = min(int(math.floor(src)), n_in - 1)
        i1 = min(i0 + 1, n_in - 1)
        w = src - i0
        m[i, i0] += 1.0 - w
        m[i, i1] += w
    return m


def resize_trilinear(x: Array, out_shape: Sequence[int],
                     align_corners: bool = True) -> Array:
    """Trilinear resize of [B, D, H, W, C] to spatial ``out_shape`` via three
    einsum contractions (MXU-friendly; replaces torch nn.Upsample,
    equiunet2020.py:351,439)."""
    d, h, w = x.shape[1:4]
    od, oh, ow = out_shape
    dtype = x.dtype
    y = x
    if od != d:
        md = jnp.asarray(_linear_interp_matrix(d, od, align_corners), dtype)
        y = jnp.einsum("bdhwc,Dd->bDhwc", y, md)
    if oh != h:
        mh = jnp.asarray(_linear_interp_matrix(h, oh, align_corners), dtype)
        y = jnp.einsum("bdhwc,Hh->bdHwc", y, mh)
    if ow != w:
        mw = jnp.asarray(_linear_interp_matrix(w, ow, align_corners), dtype)
        y = jnp.einsum("bdhwc,Ww->bdhWc", y, mw)
    return y


def upsample(x: Array, scale_factor: int = 2, align_corners: bool = True) -> Array:
    d, h, w = x.shape[1:4]
    return resize_trilinear(x, (d * scale_factor, h * scale_factor, w * scale_factor),
                            align_corners=align_corners)


# ---------------------------------------------------------------------------
# Dropout helper
# ---------------------------------------------------------------------------


class Dropout(nn.Module):
    """Standard dropout gated by the 'deterministic' flag; a no-op module when
    rate == 0 so the common case stays fusion-friendly.

    ``channel_wise=True`` is torch ``nn.Dropout3d`` semantics — one mask
    value per (batch, channel), broadcast over the spatial axes. MONAI's
    ``Dropout[DROPOUT, spatial_dims]`` factory resolves to Dropout3d for
    the 3-D nets that take ``dropout_prob`` (SegResNet(+VAE), HighResNet,
    VNet — definer.py:97-127), so their train-time regularization drops
    whole feature channels, not independent voxels."""

    rate: float = 0.0
    channel_wise: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0:
            return x
        broadcast = tuple(range(1, x.ndim - 1)) if self.channel_wise else ()
        return nn.Dropout(rate=self.rate, broadcast_dims=broadcast,
                          deterministic=deterministic)(x)
