"""Classification heads.

Parity targets:
  * ResNetBasicHead (/root/reference/audio_slowfast/models/head_helper.py:10-109):
    per-pathway AvgPool (stride=window; see the in-code note on the
    deliberate delta from the reference's stride=1) -> concat channels ->
    dropout -> Linear;
    dual verb/noun heads when NUM_CLASSES is a list; **train returns raw
    logits, eval applies softmax then means over the (T, F) positions**
    (fully-convolutional inference, head_helper.py:87-97).
  * state-head variant (/root/reference/audio_slowfast/models/state_head_helper.py:11-143):
    adds three parallel Linear F->P projections for {-1, 0, +1} logits.

Channels-last layout means no permute is needed before the projections.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def fc_init(std: float):
    return nn.initializers.normal(stddev=std)


def dense(features: int, std: float, dtype, name: str) -> nn.Dense:
    precision = None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    return nn.Dense(
        features=features,
        use_bias=True,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=precision,
        kernel_init=fc_init(std),
        bias_init=nn.initializers.zeros,
        name=name,
    )


def _act(act_func: str, x: jnp.ndarray) -> jnp.ndarray:
    if act_func == "softmax":
        return nn.softmax(x, axis=-1)
    if act_func == "sigmoid":
        return nn.sigmoid(x)
    raise NotImplementedError(f"{act_func} is not supported as an activation function.")


class ResNetBasicHead(nn.Module):
    """Pool/concat/dropout/project head with train/eval asymmetry."""

    dim_in: Sequence[int]
    num_classes: Union[int, Sequence[int]]
    pool_size: Sequence[Sequence[int]]
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    fc_init_std: float = 0.01
    dtype: Any = jnp.float32
    with_state: bool = False  # 3x Linear F->P state projections (state_head_helper.py)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.pool_size)
        pool_out = []
        for p, x in enumerate(inputs):
            window = tuple(self.pool_size[p])
            # DELIBERATE delta: the reference constructs
            # AvgPool2d(pool_size, stride=1) (head_helper.py:49), which only
            # defines behaviour at T == NUM_FRAMES (both pathways pool to a
            # single 1x1 position — identical to this stride=window pool).
            # For LONGER inputs the reference head crashes: with stride 1
            # the slow/fast position counts differ (T/4a - w_s + 1 vs
            # T/4 - w_f + 1) and the channel concat raises. stride=window
            # keeps the pathway grids aligned, making fully-convolutional
            # inference (tools/predict.py) actually work.
            pool_out.append(
                nn.avg_pool(x, window, strides=window, padding="VALID")
            )
        x = jnp.concatenate(pool_out, axis=-1)  # (B, t', f', C)

        if self.dropout_rate > 0.0:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train, name="dropout")(x)

        classes = self.num_classes
        if isinstance(classes, (list, tuple)) and len(classes) == 1:
            classes = classes[0]

        if isinstance(classes, (list, tuple)):
            x_v = dense(classes[0], self.fc_init_std, self.dtype, "projection_verb")(x)
            x_n = dense(classes[1], self.fc_init_std, self.dtype, "projection_noun")(x)
            if not train:
                x_v = _act(self.act_func, x_v).mean(axis=(1, 2))
                x_n = _act(self.act_func, x_n).mean(axis=(1, 2))
            x_v = x_v.reshape(x_v.shape[0], -1)
            x_n = x_n.reshape(x_n.shape[0], -1)
            if self.with_state and len(classes) > 2:
                n_attr = classes[2]
                x_s = jnp.stack(
                    [
                        dense(n_attr, self.fc_init_std, self.dtype, "projection_min_1")(x),
                        dense(n_attr, self.fc_init_std, self.dtype, "projection_0")(x),
                        dense(n_attr, self.fc_init_std, self.dtype, "projection_1")(x),
                    ],
                    axis=-2,
                )  # (B, t', f', 3, P)
                if not train:
                    x_s = nn.softmax(x_s, axis=-2)
                x_s = x_s.mean(axis=(1, 2))  # (B, 3, P)
                return x_v, x_n, jnp.swapaxes(x_s, -1, -2)  # (B, P, 3)
            return x_v, x_n

        x = dense(classes, self.fc_init_std, self.dtype, "projection")(x)
        if not train:
            x = _act(self.act_func, x).mean(axis=(1, 2))
        return x.reshape(x.shape[0], -1)
