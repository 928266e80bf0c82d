"""Batch normalisation zoo (TPU-native).

Replaces the reference's three BN flavours
(/root/reference/audio_slowfast/models/batchnorm_helper.py:16-196):

  * ``batchnorm``      -> per-device batch stats
  * ``sync_batchnorm`` -> cross-device stats via ``lax.pmean`` over the
    mesh's data axis (replaces NaiveSyncBatchNorm2d's NCCL GroupGather,
    batchnorm_helper.py:106-196); ``NUM_SYNC_DEVICES`` maps to
    ``axis_index_groups`` sub-groups.
  * ``sub_batchnorm``  -> batch split into NUM_SPLITS groups, each normalised
    with its own stats during training; running stats aggregate the split
    means (parity with SubBatchNorm2d, batchnorm_helper.py:34-103).

Torch-parity details baked in: momentum 0.1 with torch's update direction
(new = (1-m)*old + m*batch), unbiased variance for the running update but
biased variance for normalisation, fp32 statistics regardless of compute
dtype.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing channel axis with torch running-stat semantics."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    axis_index_groups: Any = None
    num_splits: int = 1
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        scale = self.param("scale", self.scale_init, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if use_running_average:
            mean = ra_mean.value
            var = ra_var.value
            y = _affine(x, mean, var, scale, bias, self.eps, self.dtype)
            return y

        x32 = x.astype(jnp.float32)
        reduce_axes = tuple(range(x32.ndim - 1))

        if self.num_splits > 1:
            b = x32.shape[0]
            assert b % self.num_splits == 0, (
                f"SubBatchNorm: batch {b} not divisible by NUM_SPLITS {self.num_splits}"
            )
            xs = x32.reshape((self.num_splits, b // self.num_splits) + x32.shape[1:])
            split_axes = tuple(range(1, xs.ndim - 1))
            mean_s = jnp.mean(xs, axis=split_axes)  # (splits, C)
            msq_s = jnp.mean(jnp.square(xs), axis=split_axes)
            var_s = msq_s - jnp.square(mean_s)
            # Normalise each split with its own stats.
            shape = (self.num_splits,) + (1,) * (xs.ndim - 2) + (self.features,)
            yn = (xs - mean_s.reshape(shape)) * jax.lax.rsqrt(var_s.reshape(shape) + self.eps)
            y = yn.reshape(x32.shape)
            y = y * scale + bias
            # Aggregate split stats for running averages
            # (SubBatchNorm2d.aggregate_stats, batchnorm_helper.py:60-83).
            mean = jnp.mean(mean_s, axis=0)
            var = jnp.mean(var_s, axis=0) + jnp.mean(jnp.square(mean_s - mean), axis=0)
            n_per_channel = (b // self.num_splits) * math.prod(x32.shape[1:-1])
        else:
            mean = jnp.mean(x32, axis=reduce_axes)
            msq = jnp.mean(jnp.square(x32), axis=reduce_axes)
            n_per_channel = math.prod(x32.shape[:-1])
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name, axis_index_groups=self.axis_index_groups)
                msq = jax.lax.pmean(msq, self.axis_name, axis_index_groups=self.axis_index_groups)
                group = (
                    len(self.axis_index_groups[0])
                    if self.axis_index_groups
                    else jax.lax.psum(1, self.axis_name)
                )
                n_per_channel = n_per_channel * group
            var = msq - jnp.square(mean)
            y = _affine(x32, mean, var, scale, bias, self.eps, self.dtype)

        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
            # torch stores the UNBIASED variance in running_var. n_per_channel
            # may be traced when synced over a mesh axis.
            n = jnp.asarray(n_per_channel, jnp.float32)
            unbias = n / jnp.maximum(n - 1.0, 1.0)
            ra_var.value = (1.0 - m) * ra_var.value + m * var * unbias

        return y.astype(self.dtype)


def _affine(x, mean, var, scale, bias, eps, dtype):
    inv = jax.lax.rsqrt(var + eps) * scale
    y = (x.astype(jnp.float32) - mean) * inv + bias
    return y.astype(dtype)


def make_norm(cfg, dtype=jnp.float32, axis_name: Optional[str] = None):
    """Returns a TorchBatchNorm factory bound to the cfg's BN options.

    Parity with ``get_norm`` (/root/reference/audio_slowfast/models/batchnorm_helper.py:16-31).
    """
    norm_type = cfg.BN.NORM_TYPE
    num_splits = cfg.BN.NUM_SPLITS if norm_type == "sub_batchnorm" else 1
    sync = norm_type == "sync_batchnorm"
    # Internal hook used by precise-BN (engine): momentum 1.0 makes the
    # running stats equal the latest batch stats (fvcore update_bn_stats
    # trick, cf. utils/bn_helper.py:12-74).
    momentum = cfg.BN.get("MOMENTUM_OVERRIDE", 0.1)

    def norm(features, name=None, scale_init=nn.initializers.ones):
        return TorchBatchNorm(
            features=features,
            momentum=momentum,
            dtype=dtype,
            axis_name=axis_name if sync else None,
            num_splits=num_splits,
            scale_init=scale_init,
            name=name,
        )

    return norm
