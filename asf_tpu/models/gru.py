"""Bidirectional multi-layer GRU and the GRU sequence head.

TPU-native re-expression of:
  * torch ``nn.GRU`` + pack_padded_sequence semantics
    (/root/reference/audio_slowfast/models/gru_head_helper.py:61-67,259-277)
  * ``GRUResNetBasicHead`` (/root/reference/audio_slowfast/models/gru_head_helper.py:7-298)

Design notes (TPU):
  * The input projection ``x @ W_ih^T`` for ALL timesteps is one large GEMM
    outside the scan; the ``lax.scan`` body only carries the small
    ``h @ W_hh^T`` recurrence, keeping the MXU fed.
  * torch packed-sequence semantics are reproduced with static shapes:
    outputs at padded positions are zeroed, and the reverse direction is a
    within-valid-length reversal so it starts from the last *valid* frame.
  * Weights are stored in the torch layout (``weight_ih_l{k}[_reverse]`` of
    shape (3H, in), gate order r,z,n) so ``.pyth`` conversion is a transpose-
    free copy.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .heads import dense, _act



def _gru_param(module, name, shape, hidden_size):
    # torch initialises GRU weights from U(-1/sqrt(H), 1/sqrt(H)).
    bound = 1.0 / float(hidden_size) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return module.param(name, init, shape)


def _reverse_within_length(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each (B, N, F) sequence within its valid length."""
    n = x.shape[1]
    t = jnp.arange(n)[None, :]  # (1, N)
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class TorchGRU(nn.Module):
    """Multi-layer bidirectional GRU with packed-sequence semantics."""

    hidden_size: int
    num_layers: int = 2
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, N, F)
        lengths: jnp.ndarray,  # (B,) int32
        h0: Optional[jnp.ndarray] = None,  # (num_layers * D, B, H)
    ) -> jnp.ndarray:
        B, N, _ = x.shape
        H = self.hidden_size
        D = 2 if self.bidirectional else 1
        valid = (jnp.arange(N)[None, :] < lengths[:, None])[:, :, None]  # (B, N, 1)

        layer_in = x
        for layer in range(self.num_layers):
            outs = []
            for direction in range(D):
                suffix = f"l{layer}" + ("_reverse" if direction == 1 else "")
                in_f = layer_in.shape[-1]
                w_ih = _gru_param(self, f"weight_ih_{suffix}", (3 * H, in_f), H)
                w_hh = _gru_param(self, f"weight_hh_{suffix}", (3 * H, H), H)
                b_ih = _gru_param(self, f"bias_ih_{suffix}", (3 * H,), H)
                b_hh = _gru_param(self, f"bias_hh_{suffix}", (3 * H,), H)

                seq = layer_in if direction == 0 else _reverse_within_length(layer_in, lengths)
                seq = seq.astype(self.dtype)
                # Big GEMM outside the scan: (B, N, in) @ (in, 3H)
                gx = seq @ w_ih.T.astype(self.dtype) + b_ih.astype(self.dtype)

                if h0 is not None:
                    h_init = h0[layer * D + direction].astype(jnp.float32)
                else:
                    h_init = jnp.zeros((B, H), jnp.float32)

                w_hh_t = w_hh.T.astype(self.dtype)
                b_hh_c = b_hh.astype(self.dtype)

                def step(h, gx_t):
                    gh = h.astype(self.dtype) @ w_hh_t + b_hh_c
                    gx_r, gx_z, gx_n = jnp.split(gx_t, 3, axis=-1)
                    gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
                    r = nn.sigmoid(gx_r + gh_r)
                    z = nn.sigmoid(gx_z + gh_z)
                    n_ = nn.tanh(gx_n + r * gh_n)
                    h_new = ((1.0 - z) * n_ + z * h.astype(self.dtype)).astype(jnp.float32)
                    return h_new, h_new

                _, ys = jax.lax.scan(step, h_init, jnp.swapaxes(gx, 0, 1))  # (N, B, H)
                ys = jnp.swapaxes(ys, 0, 1)  # (B, N, H)
                if direction == 1:
                    ys = _reverse_within_length(ys, lengths)
                outs.append(ys)

            layer_in = jnp.concatenate(outs, axis=-1) if D == 2 else outs[0]
            # pad_packed_sequence zeroes padded positions; this also stops
            # padded steps from contaminating the next layer's valid inputs.
            layer_in = jnp.where(valid, layer_in, 0.0)

        return layer_in  # (B, N, D*H)


class GRUResNetBasicHead(nn.Module):
    """Pool/concat -> dropout -> biGRU(h0=CLIP noun emb) -> projections.

    Output contract (gru_head_helper.py:152-195):
      verb (B, V), noun (B, Nn): length-masked mean over windows of the raw
      logits (train) / softmaxed scores (eval);
      state (B, N, P, 3) when enabled, softmaxed over the {-1,0,1} axis in eval.
    """

    dim_in: Sequence[int]
    num_classes: Union[int, Sequence[int]]
    pool_size: Sequence[Sequence[int]]
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    gru_hidden_size: int = 512
    gru_num_layers: int = 2
    only_action_recognition: bool = False
    fc_init_std: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        inputs,  # list of (B*N, t, f, C) pathway tensors
        lengths: jnp.ndarray,  # (B,)
        initial_batch_shape,  # (B, N)
        noun_embeddings: Optional[jnp.ndarray] = None,  # (B, 512)
        train: bool = False,
    ):
        B, N = initial_batch_shape
        pool_out = []
        for p, x in enumerate(inputs):
            window = tuple(self.pool_size[p])
            # stride=window: deliberate delta from gru_head_helper.py:54's
            # stride=1 — identical at T == NUM_FRAMES (single 1x1 position),
            # well-defined for longer inputs (see heads.py note)
            pool_out.append(nn.avg_pool(x, window, strides=window, padding="VALID"))
        x = jnp.concatenate(pool_out, axis=-1)  # (B*N, 1, 1, F)

        if self.dropout_rate > 0.0:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train, name="dropout")(x)

        feat = x.shape[-1]
        x = x.reshape(B, N, feat)

        D = 2  # reference GRU is always bidirectional
        gru = TorchGRU(
            hidden_size=self.gru_hidden_size,
            num_layers=self.gru_num_layers,
            bidirectional=True,
            dtype=self.dtype,
            name="gru",
        )
        h0 = None
        if noun_embeddings is not None and not self.only_action_recognition:
            h0 = jnp.tile(noun_embeddings[None], (D * self.gru_num_layers, 1, 1))
        x = gru(x, lengths, h0)  # (B, N, 2H)

        x = x.reshape(B * N, 1, 1, D * self.gru_hidden_size)
        x = dense(sum(self.dim_in), self.fc_init_std, self.dtype, "projection_to_dim_in")(x)

        classes = self.num_classes
        assert isinstance(classes, (list, tuple)), "GRU head expects multi-task classes"
        if not self.only_action_recognition:
            n_v, n_n, n_p = classes
        else:
            n_v, n_n = classes[0], classes[1]

        mask = (jnp.arange(N)[None, :] < lengths[:, None]).astype(jnp.float32)  # (B, N)
        denom = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]

        def project_and_reduce(features, name):
            y = dense(features, self.fc_init_std, self.dtype, name)(x)  # (B*N,1,1,F')
            if not train:
                y = _act(self.act_func, y).mean(axis=(1, 2))
            y = y.reshape(B, N, features)
            return (y * mask[:, :, None]).sum(axis=1) / denom  # masked mean over windows

        x_v = project_and_reduce(n_v, "projection_verb")
        x_n = project_and_reduce(n_n, "projection_noun")

        if not self.only_action_recognition:
            xs = jnp.concatenate(
                [
                    dense(n_p, self.fc_init_std, self.dtype, "projection_min_1")(x),
                    dense(n_p, self.fc_init_std, self.dtype, "projection_0")(x),
                    dense(n_p, self.fc_init_std, self.dtype, "projection_1")(x),
                ],
                axis=2,
            )  # (B*N, 1, 3, P)
            if not train:
                xs = nn.softmax(xs, axis=2)
            xs = xs.mean(axis=1)  # (B*N, 3, P)
            # The reference reinterprets (B*N, 3, P) contiguously as
            # (B, N, P, 3) via .view (gru_head_helper.py:185) — a raw memory
            # reshape, not a transpose. Reproduce bit-for-bit.
            x_s = xs.reshape(B, N, n_p, 3)
            return x_v, x_n, x_s

        return x_v, x_n
