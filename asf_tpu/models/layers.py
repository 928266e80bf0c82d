"""Conv trunk building blocks (Flax, channels-last NHWC=(B, T, F, C)).

TPU-first re-expression of the reference trunk modules:
  * AudioModelStem / ResNetBasicStem  (/root/reference/audio_slowfast/models/stem_helper.py:9-168)
  * BasicTransform / BottleneckTransform / ResBlock / ResStage
    (/root/reference/audio_slowfast/models/resnet_helper.py:21-485)
  * FuseFastToSlow (/root/reference/audio_slowfast/models/audio_model_builder.py:54-111)

Module/parameter names mirror the reference state-dict keys
(``s1.pathway0_stem.conv`` etc.) so the ``.pyth`` checkpoint converter is a
mechanical key mapping.  The layout change (torch NCHW -> NHWC) and dtype
policy (fp32 params, configurable bf16 compute) are the TPU-specific parts;
XLA fuses BN+ReLU into the convolutions.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from asf_tpu.ops.maxpool import max_pool as tpu_max_pool

# Caffe2 MSRA fill: kaiming-normal, fan_out, relu gain
# (parity with utils/weight_init_helper.py:10-24 via fvcore c2_msra_fill).
msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def conv2d(
    features: int,
    kernel: Sequence[int],
    stride: Sequence[int] = (1, 1),
    padding: Sequence[int] = (0, 0),
    dilation: Sequence[int] = (1, 1),
    groups: int = 1,
    dtype: Any = jnp.float32,
    name: str | None = None,
) -> nn.Conv:
    """Bias-free torch-style Conv2d on (B, T, F, C).

    Precision policy: with fp32 compute dtype the MXU runs in HIGHEST
    precision (fp32-accurate passes) for torch/librosa parity; with bf16
    compute the fast default path is used.
    """
    precision = None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    return nn.Conv(
        features=features,
        kernel_size=tuple(kernel),
        strides=tuple(stride),
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        kernel_dilation=tuple(dilation),
        feature_group_count=groups,
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=precision,
        kernel_init=msra_init,
        name=name,
    )


def _s2d_stride2_conv(x, w, kernel, padding, precision):
    """Stride-(2,2) single-input-channel conv via space-to-depth regrouping.

    The stems convolve a 1-channel spectrogram (stem_helper.py:100-115's
    geometry); C_in=1 strided convs run at ~6 TF/s on the MXU (the systolic
    array wants >=8 input channels). Splitting time/freq parity turns the
    stride-2 conv into a stride-1 conv over 4 parity channels with regrouped
    taps — identical math up to f32 reassociation (<=5e-7, unit-tested
    against lax.conv), ~2.5x faster measured at the fast-stem geometry.

    y[b,i,j,c] = sum_{dt,df} x[b, 2i+dt-pt, 2j+df-pf, 0] * w[dt,df,0,c]:
    pre-pad so every tap offset is even-aligned, then tap (2a+p, 2e+q) acts
    on parity channel (p, q) at block offset (a, e).
    """
    kt, kf = kernel
    pt, pf = padding
    b, t, f, cin = x.shape
    assert cin == 1
    lt, lf = pt + (pt % 2), pf + (pf % 2)  # even-aligned left pads
    ot, of = lt - pt, lf - pf              # tap index shift after padding
    kt2 = -(-(kt + ot) // 2) * 2           # taps padded to even counts
    kf2 = -(-(kf + of) // 2) * 2
    to = (t + 2 * pt - kt) // 2 + 1
    fo = (f + 2 * pf - kf) // 2 + 1
    need_t = 2 * (to - 1) + kt2
    need_f = 2 * (fo - 1) + kf2
    xp = jnp.pad(
        x[..., 0],
        ((0, 0), (lt, max(0, need_t - t - lt)), (lf, max(0, need_f - f - lf))),
    )[:, :need_t, :need_f]
    xs = (
        xp.reshape(b, need_t // 2, 2, need_f // 2, 2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, need_t // 2, need_f // 2, 4)
    )
    c = w.shape[-1]
    wp = jnp.zeros((kt2, kf2, 1, c), w.dtype).at[ot : ot + kt, of : of + kf].set(w)
    wr = (
        wp.reshape(kt2 // 2, 2, kf2 // 2, 2, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(kt2 // 2, kf2 // 2, 4, c)
    )
    y = jax.lax.conv_general_dilated(
        xs, wr, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    return y[:, :to, :fo, :]


class Stride2StemConv(nn.Module):
    """Drop-in for the stem's bias-free nn.Conv (same param tree: a single
    HWIO ``kernel`` under this module's name), computing via
    :func:`_s2d_stride2_conv` when eligible. Checkpoint/.pyth layouts are
    unchanged — only the compute graph differs."""

    features: int
    kernel: Sequence[int]
    padding: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kf = self.kernel
        w = self.param(
            "kernel", msra_init, (kt, kf, 1, self.features), jnp.float32
        )
        x, w = nn.dtypes.promote_dtype(x, w, dtype=self.dtype)
        precision = None if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        return _s2d_stride2_conv(
            x, w, (kt, kf), tuple(self.padding), precision
        )


class ResNetBasicStem(nn.Module):
    """Conv([t,7], stride [2,2]) + BN + ReLU + MaxPool(3x3, stride 2, pad 1)."""

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    norm: Callable
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, bn_stats_frozen: bool = False):
        if (
            tuple(self.stride) == (2, 2)
            and x.shape[-1] == 1
            and self.dtype == jnp.bfloat16
        ):
            # MXU-friendly space-to-depth form of the same conv (see
            # Stride2StemConv); parameter tree is identical to conv2d's.
            # bf16 production only: the regrouped compute graph reassociates
            # f32 sums (~5e-7), so accuracy-parity (f32/HIGHEST) paths keep
            # the plain strided conv's op-for-op determinism.
            x = Stride2StemConv(
                self.dim_out, self.kernel, self.padding,
                dtype=self.dtype, name="conv",
            )(x)
        else:
            x = conv2d(self.dim_out, self.kernel, self.stride, self.padding, dtype=self.dtype, name="conv")(x)
        # Stem BN is exempt from BN-statistics freezing
        # (freeze_fn keeps s1.*_stem.bn live, audio_model_builder.py:327-344) —
        # callers pass bn_stats_frozen=False here.
        x = self.norm(self.dim_out, name="bn")(x, use_running_average=not train or bn_stats_frozen)
        x = nn.relu(x)
        # claim-chain VJP max pool: forward == nn.max_pool bit-for-bit,
        # backward avoids select_and_scatter (asf_tpu/ops/maxpool.py)
        x = tpu_max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


class AudioModelStem(nn.Module):
    """Per-pathway stems; names pathway{i}_stem (stem_helper.py:75-88)."""

    dim_out: Sequence[int]
    kernel: Sequence[Sequence[int]]
    stride: Sequence[Sequence[int]]
    padding: Sequence[Sequence[int]]
    norm: Callable
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        assert len(xs) == len(self.dim_out)
        out = []
        for p, x in enumerate(xs):
            stem = ResNetBasicStem(
                dim_out=self.dim_out[p],
                kernel=self.kernel[p],
                stride=self.stride[p],
                padding=self.padding[p],
                norm=self.norm,
                dtype=self.dtype,
                name=f"pathway{p}_stem",
            )
            out.append(stem(x, train=train, bn_stats_frozen=False))
        return out


class FuseFastToSlow(nn.Module):
    """Conv([k,1], stride [alpha,1]) on Fast + BN + ReLU, concat onto Slow.

    Parity with audio_model_builder.py:54-111. The fuse BN of s1 is exempt
    from stat freezing; later fuse BNs are not.
    """

    dim_in: int
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    norm: Callable
    dtype: Any = jnp.float32
    bn_freeze_exempt: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False, bn_stats_frozen: bool = False):
        x_s, x_f = xs
        fuse = conv2d(
            self.dim_in * self.fusion_conv_channel_ratio,
            kernel=(self.fusion_kernel, 1),
            stride=(self.alpha, 1),
            padding=(self.fusion_kernel // 2, 0),
            dtype=self.dtype,
            name="conv_f2s",
        )(x_f)
        frozen = bn_stats_frozen and not self.bn_freeze_exempt
        fuse = self.norm(self.dim_in * self.fusion_conv_channel_ratio, name="bn")(
            fuse, use_running_average=not train or frozen
        )
        fuse = nn.relu(fuse)
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


class BasicTransform(nn.Module):
    """Tx3 + BN + ReLU + 1x3 + BN (resnet_helper.py:21-98)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    norm: Callable
    dtype: Any = jnp.float32
    zero_init_final_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, bn_stats_frozen: bool = False):
        ura = not train or bn_stats_frozen
        x = conv2d(
            self.dim_out,
            (self.temp_kernel_size, 3),
            (1, self.stride),
            (self.temp_kernel_size // 2, 1),
            dtype=self.dtype,
            name="a",
        )(x)
        x = self.norm(self.dim_out, name="a_bn")(x, use_running_average=ura)
        x = nn.relu(x)
        x = conv2d(self.dim_out, (1, 3), (1, 1), (0, 1), dtype=self.dtype, name="b")(x)
        scale_init = nn.initializers.zeros if self.zero_init_final_bn else nn.initializers.ones
        x = self.norm(self.dim_out, name="b_bn", scale_init=scale_init)(x, use_running_average=ura)
        return x


class BottleneckTransform(nn.Module):
    """Tx1 + 1x3(grouped, dilated) + 1x1, BN/ReLU between (resnet_helper.py:101-225)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    norm: Callable = None
    dtype: Any = jnp.float32
    zero_init_final_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, bn_stats_frozen: bool = False):
        ura = not train or bn_stats_frozen
        str1x1, str3x3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)

        x = conv2d(
            self.dim_inner,
            (self.temp_kernel_size, 1),
            (1, str1x1),
            (self.temp_kernel_size // 2, 0),
            dtype=self.dtype,
            name="a",
        )(x)
        x = self.norm(self.dim_inner, name="a_bn")(x, use_running_average=ura)
        x = nn.relu(x)

        x = conv2d(
            self.dim_inner,
            (1, 3),
            (1, str3x3),
            (0, self.dilation),
            dilation=(1, self.dilation),
            groups=self.num_groups,
            dtype=self.dtype,
            name="b",
        )(x)
        x = self.norm(self.dim_inner, name="b_bn")(x, use_running_average=ura)
        x = nn.relu(x)

        x = conv2d(self.dim_out, (1, 1), (1, 1), (0, 0), dtype=self.dtype, name="c")(x)
        scale_init = nn.initializers.zeros if self.zero_init_final_bn else nn.initializers.ones
        x = self.norm(self.dim_out, name="c_bn", scale_init=scale_init)(x, use_running_average=ura)
        return x


_TRANS_FUNCS = {
    "bottleneck_transform": BottleneckTransform,
    "basic_transform": BasicTransform,
}


class ResBlock(nn.Module):
    """Residual block with projection shortcut on dim/stride change
    (resnet_helper.py:228-341)."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    trans_func_name: str
    dim_inner: int
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    norm: Callable = None
    dtype: Any = jnp.float32
    zero_init_final_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, bn_stats_frozen: bool = False):
        ura = not train or bn_stats_frozen
        trans_cls = _TRANS_FUNCS[self.trans_func_name]
        branch2 = trans_cls(
            dim_out=self.dim_out,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            dim_inner=self.dim_inner,
            num_groups=self.num_groups,
            stride_1x1=self.stride_1x1,
            dilation=self.dilation,
            norm=self.norm,
            dtype=self.dtype,
            zero_init_final_bn=self.zero_init_final_bn,
            name="branch2",
        ) if self.trans_func_name == "bottleneck_transform" else trans_cls(
            dim_out=self.dim_out,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            norm=self.norm,
            dtype=self.dtype,
            zero_init_final_bn=self.zero_init_final_bn,
            name="branch2",
        )
        if self.dim_in != self.dim_out or self.stride != 1:
            shortcut = conv2d(
                self.dim_out, (1, 1), (1, self.stride), (0, 0), dtype=self.dtype, name="branch1"
            )(x)
            shortcut = self.norm(self.dim_out, name="branch1_bn")(shortcut, use_running_average=ura)
            x = shortcut + branch2(x, train=train, bn_stats_frozen=bn_stats_frozen)
        else:
            x = x + branch2(x, train=train, bn_stats_frozen=bn_stats_frozen)
        return nn.relu(x)


class ResStage(nn.Module):
    """Per-pathway chain of ResBlocks; temporal kernels only on the first
    ``num_block_temp_kernel`` blocks (resnet_helper.py:344-485)."""

    dim_in: Sequence[int]
    dim_out: Sequence[int]
    stride: Sequence[int]
    temp_kernel_sizes: Sequence[Sequence[int]]
    num_blocks: Sequence[int]
    dim_inner: Sequence[int]
    num_groups: Sequence[int]
    num_block_temp_kernel: Sequence[int]
    dilation: Sequence[int]
    trans_func_name: str = "bottleneck_transform"
    stride_1x1: bool = False
    norm: Callable = None
    dtype: Any = jnp.float32
    zero_init_final_bn: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False, bn_stats_frozen: bool = False):
        num_pathways = len(self.num_blocks)
        assert len(xs) == num_pathways
        out = []
        for p in range(num_pathways):
            tks = (list(self.temp_kernel_sizes[p]) * self.num_blocks[p])[
                : self.num_block_temp_kernel[p]
            ] + [1] * (self.num_blocks[p] - self.num_block_temp_kernel[p])
            x = xs[p]
            for i in range(self.num_blocks[p]):
                block = ResBlock(
                    dim_in=self.dim_in[p] if i == 0 else self.dim_out[p],
                    dim_out=self.dim_out[p],
                    temp_kernel_size=tks[i],
                    stride=self.stride[p] if i == 0 else 1,
                    trans_func_name=self.trans_func_name,
                    dim_inner=self.dim_inner[p],
                    num_groups=self.num_groups[p],
                    stride_1x1=self.stride_1x1,
                    dilation=self.dilation[p],
                    norm=self.norm,
                    dtype=self.dtype,
                    zero_init_final_bn=self.zero_init_final_bn,
                    name=f"pathway{p}_res{i}",
                )
                x = block(x, train=train, bn_stats_frozen=bn_stats_frozen)
            out.append(x)
        return out
