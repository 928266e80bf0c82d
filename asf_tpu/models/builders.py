"""Model family builders + registry.

Parity targets (/root/reference/audio_slowfast/models/audio_model_builder.py):
  * ``AudioSlowFast``      — two-pathway SlowFast R50/R101 (:114-344)
  * ``AudioSlowFastGRU``   — same trunk over (B, N) window chains + GRU head (:347-620)
  * ``ResNet``             — single-pathway Slow- or Fast-only trunk (:623-796)
plus ``MODEL_REGISTRY``/``build_model`` (/root/reference/audio_slowfast/models/build.py:10-58).

The DDP/SyncBN wrapping of the reference ``build_model`` collapses into the
mesh-sharded jitted step (see asf_tpu/engine) — models here are pure Flax.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from asf_tpu.ops.maxpool import max_pool as tpu_max_pool

from .gru import GRUResNetBasicHead
from .heads import ResNetBasicHead
from .layers import AudioModelStem, FuseFastToSlow, ResStage
from .norm import make_norm

# 50/101 match the reference (audio_model_builder.py:20); 26 is an additive
# tiny variant (1 block/stage) for tests and debugging.
_MODEL_STAGE_DEPTH = {26: (1, 1, 1, 1), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

# Temporal kernel basis per arch/stage (audio_model_builder.py:23-45).
_TEMPORAL_KERNEL_BASIS = {
    "slow": [[[1]], [[1]], [[1]], [[3]], [[3]]],
    "fast": [[[5]], [[3]], [[3]], [[3]], [[3]]],
    "slowfast": [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]],
}

_POOL1 = {"slow": [[1, 1]], "fast": [[1, 1]], "slowfast": [[1, 1], [1, 1]]}


class StaticCfg:
    """Opaque holder so linen doesn't convert the CfgNode to a FrozenDict."""

    def __init__(self, value):
        self.value = value

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _cfg_of(obj):
    return obj.value if isinstance(obj, StaticCfg) else obj


MODEL_REGISTRY = {}


def register_model(name):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls

    return deco


def compute_dtype(cfg):
    name = getattr(cfg.TPU, "COMPUTE_DTYPE", "float32") if "TPU" in cfg else "float32"
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def head_pool_sizes(cfg, pool_size, pathways):
    """Head AvgPool windows derived from the input geometry
    (audio_model_builder.py:297-306)."""
    T, F = cfg.AUDIO_DATA.NUM_FRAMES, cfg.AUDIO_DATA.NUM_FREQUENCIES
    alpha = cfg.SLOWFAST.ALPHA
    if pathways == 2:
        return [
            [T // alpha // 4 // pool_size[0][0], F // 32 // pool_size[0][1]],
            [T // 4 // pool_size[1][0], F // 32 // pool_size[1][1]],
        ]
    return [[T // 4 // pool_size[0][0], F // 32 // pool_size[0][1]]]


def _num_classes(cfg):
    nc = cfg.MODEL.NUM_CLASSES
    return list(nc) if len(nc) > 1 else nc[0]


def _slowfast_trunk(cfg, dtype, xs, train: bool = False, bn_stats_frozen: bool = False):
    """Shared SlowFast two-pathway trunk: s1..s5 with lateral fusions.

    Called inside a model's ``@nn.compact`` __call__, so the submodules
    (s1, s1_fuse, ..., s5) attach to the calling model at top level —
    mirroring the reference state-dict key structure.
    """
    d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
    w = cfg.RESNET.WIDTH_PER_GROUP
    ng = cfg.RESNET.NUM_GROUPS
    dim_inner = ng * w
    beta = cfg.SLOWFAST.BETA_INV
    ratio = cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO
    fuse_k = cfg.SLOWFAST.FUSION_KERNEL_SZ
    alpha = cfg.SLOWFAST.ALPHA
    out_dim_ratio = beta // ratio
    tk = _TEMPORAL_KERNEL_BASIS["slowfast"]
    zi = cfg.RESNET.ZERO_INIT_FINAL_BN
    norm = make_norm(cfg, dtype=dtype)

    common = dict(
        trans_func_name=cfg.RESNET.TRANS_FUNC,
        stride_1x1=cfg.RESNET.STRIDE_1X1,
        norm=norm,
        dtype=dtype,
        zero_init_final_bn=zi,
    )

    xs = AudioModelStem(
        dim_out=[w, w // beta],
        kernel=[tk[0][0] + [7], tk[0][1] + [7]],
        stride=[[2, 2]] * 2,
        padding=[[tk[0][0][0] // 2, 3], [tk[0][1][0] // 2, 3]],
        norm=norm,
        dtype=dtype,
        name="s1",
    )(xs, train=train)
    xs = FuseFastToSlow(
        w // beta, ratio, fuse_k, alpha, norm=norm, dtype=dtype,
        bn_freeze_exempt=True, name="s1_fuse",
    )(xs, train=train, bn_stats_frozen=bn_stats_frozen)

    xs = ResStage(
        dim_in=[w + w // out_dim_ratio, w // beta],
        dim_out=[w * 4, w * 4 // beta],
        dim_inner=[dim_inner, dim_inner // beta],
        temp_kernel_sizes=tk[1],
        stride=cfg.RESNET.FREQUENCY_STRIDES[0],
        num_blocks=[d2] * 2,
        num_groups=[ng] * 2,
        num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[0],
        dilation=cfg.RESNET.FREQUENCY_DILATIONS[0],
        name="s2",
        **common,
    )(xs, train=train, bn_stats_frozen=bn_stats_frozen)
    xs = FuseFastToSlow(
        w * 4 // beta, ratio, fuse_k, alpha, norm=norm, dtype=dtype, name="s2_fuse"
    )(xs, train=train, bn_stats_frozen=bn_stats_frozen)

    pool_size = _POOL1["slowfast"]
    xs = [
        tpu_max_pool(
            x, tuple(pool_size[p]), strides=tuple(pool_size[p]),
            padding=((0, 0), (0, 0)),
        )
        for p, x in enumerate(xs)
    ]

    xs = ResStage(
        dim_in=[w * 4 + w * 4 // out_dim_ratio, w * 4 // beta],
        dim_out=[w * 8, w * 8 // beta],
        dim_inner=[dim_inner * 2, dim_inner * 2 // beta],
        temp_kernel_sizes=tk[2],
        stride=cfg.RESNET.FREQUENCY_STRIDES[1],
        num_blocks=[d3] * 2,
        num_groups=[ng] * 2,
        num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[1],
        dilation=cfg.RESNET.FREQUENCY_DILATIONS[1],
        name="s3",
        **common,
    )(xs, train=train, bn_stats_frozen=bn_stats_frozen)
    xs = FuseFastToSlow(
        w * 8 // beta, ratio, fuse_k, alpha, norm=norm, dtype=dtype, name="s3_fuse"
    )(xs, train=train, bn_stats_frozen=bn_stats_frozen)

    xs = ResStage(
        dim_in=[w * 8 + w * 8 // out_dim_ratio, w * 8 // beta],
        dim_out=[w * 16, w * 16 // beta],
        dim_inner=[dim_inner * 4, dim_inner * 4 // beta],
        temp_kernel_sizes=tk[3],
        stride=cfg.RESNET.FREQUENCY_STRIDES[2],
        num_blocks=[d4] * 2,
        num_groups=[ng] * 2,
        num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[2],
        dilation=cfg.RESNET.FREQUENCY_DILATIONS[2],
        name="s4",
        **common,
    )(xs, train=train, bn_stats_frozen=bn_stats_frozen)
    xs = FuseFastToSlow(
        w * 16 // beta, ratio, fuse_k, alpha, norm=norm, dtype=dtype, name="s4_fuse"
    )(xs, train=train, bn_stats_frozen=bn_stats_frozen)

    xs = ResStage(
        dim_in=[w * 16 + w * 16 // out_dim_ratio, w * 16 // beta],
        dim_out=[w * 32, w * 32 // beta],
        dim_inner=[dim_inner * 8, dim_inner * 8 // beta],
        temp_kernel_sizes=tk[4],
        stride=cfg.RESNET.FREQUENCY_STRIDES[3],
        num_blocks=[d5] * 2,
        num_groups=[ng] * 2,
        num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[3],
        dilation=cfg.RESNET.FREQUENCY_DILATIONS[3],
        name="s5",
        **common,
    )(xs, train=train, bn_stats_frozen=bn_stats_frozen)
    return xs


@register_model("AudioSlowFast")
class AudioSlowFast(nn.Module):
    """Two-stream SlowFast audio classifier (audio_model_builder.py:114-344)."""

    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False, bn_stats_frozen: bool = False):
        cfg = _cfg_of(self.cfg)
        w = cfg.RESNET.WIDTH_PER_GROUP
        beta = cfg.SLOWFAST.BETA_INV
        xs = _slowfast_trunk(cfg, self.dtype, xs, train=train, bn_stats_frozen=bn_stats_frozen)
        classes = _num_classes(cfg)
        head = ResNetBasicHead(
            dim_in=[w * 32, w * 32 // beta],
            num_classes=classes,
            pool_size=head_pool_sizes(cfg, _POOL1["slowfast"], 2),
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dtype=self.dtype,
            with_state=(
                not cfg.MODEL.ONLY_ACTION_RECOGNITION
                and isinstance(classes, (list, tuple))
                and len(classes) > 2
            ),
            name="head",
        )
        return head(xs, train=train)


@register_model("AudioSlowFastGRU")
class AudioSlowFastGRU(nn.Module):
    """SlowFast trunk over chained windows + biGRU head (audio_model_builder.py:347-620).

    Inputs are (B, N, T, F, C) per pathway; reshaped to (B*N, T, F, C) for the
    trunk (parity with :567-580).
    """

    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        xs,
        lengths,
        noun_embeddings: Optional[jnp.ndarray] = None,
        train: bool = False,
        bn_stats_frozen: bool = False,
    ):
        cfg = _cfg_of(self.cfg)
        w = cfg.RESNET.WIDTH_PER_GROUP
        beta = cfg.SLOWFAST.BETA_INV
        B, N = xs[0].shape[0], xs[0].shape[1]
        xs = [x.reshape((B * N,) + x.shape[2:]) for x in xs]
        xs = _slowfast_trunk(cfg, self.dtype, xs, train=train, bn_stats_frozen=bn_stats_frozen)
        head = GRUResNetBasicHead(
            dim_in=[w * 32, w * 32 // beta],
            num_classes=_num_classes(cfg),
            pool_size=head_pool_sizes(cfg, _POOL1["slowfast"], 2),
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            gru_hidden_size=cfg.MODEL.GRU_HIDDEN_SIZE,
            gru_num_layers=cfg.MODEL.GRU_NUM_LAYERS,
            only_action_recognition=cfg.MODEL.ONLY_ACTION_RECOGNITION,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dtype=self.dtype,
            name="head",
        )
        return head(
            xs,
            lengths=lengths,
            initial_batch_shape=(B, N),
            noun_embeddings=noun_embeddings,
            train=train,
        )


@register_model("ResNet")
class ResNet(nn.Module):
    """Single-pathway Slow-/Fast-only R50 (audio_model_builder.py:623-796)."""

    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False, bn_stats_frozen: bool = False):
        cfg = _cfg_of(self.cfg)
        arch = cfg.MODEL.ARCH
        assert arch in _TEMPORAL_KERNEL_BASIS
        tk = _TEMPORAL_KERNEL_BASIS[arch]
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        w = cfg.RESNET.WIDTH_PER_GROUP
        ng = cfg.RESNET.NUM_GROUPS
        dim_inner = ng * w
        zi = cfg.RESNET.ZERO_INIT_FINAL_BN
        norm = make_norm(cfg, dtype=self.dtype)
        common = dict(
            trans_func_name=cfg.RESNET.TRANS_FUNC,
            stride_1x1=cfg.RESNET.STRIDE_1X1,
            norm=norm,
            dtype=self.dtype,
            zero_init_final_bn=zi,
        )

        xs = AudioModelStem(
            dim_out=[w],
            kernel=[tk[0][0] + [7]],
            stride=[[2, 2]],
            padding=[[tk[0][0][0] // 2, 3]],
            norm=norm,
            dtype=self.dtype,
            name="s1",
        )(xs, train=train)

        dims = [(w, w * 4, dim_inner, d2), (w * 4, w * 8, dim_inner * 2, d3),
                (w * 8, w * 16, dim_inner * 4, d4), (w * 16, w * 32, dim_inner * 8, d5)]
        for si, (di, do, dn, nb) in enumerate(dims):
            xs = ResStage(
                dim_in=[di],
                dim_out=[do],
                dim_inner=[dn],
                temp_kernel_sizes=tk[si + 1],
                stride=cfg.RESNET.FREQUENCY_STRIDES[si],
                num_blocks=[nb],
                num_groups=[ng],
                num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[si],
                dilation=cfg.RESNET.FREQUENCY_DILATIONS[si],
                name=f"s{si + 2}",
                **common,
            )(xs, train=train, bn_stats_frozen=bn_stats_frozen)
            if si == 0:
                pool_size = _POOL1[arch]
                xs = [
                    tpu_max_pool(
                        x, tuple(pool_size[0]), strides=tuple(pool_size[0]),
                        padding=((0, 0), (0, 0)),
                    )
                    for x in xs
                ]

        head = ResNetBasicHead(
            dim_in=[w * 32],
            num_classes=_num_classes(cfg),
            pool_size=head_pool_sizes(cfg, _POOL1[arch], 1),
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dtype=self.dtype,
            name="head",
        )
        return head(xs, train=train)


def build_model(cfg):
    """Instantiate the registered model for ``cfg.MODEL.MODEL_NAME``.

    DDP/SyncBN wrapping (reference models/build.py:46-57) is unnecessary:
    data parallelism comes from the mesh-sharded jitted step, and BN sync
    from split-stats over the GSPMD-sharded global batch inside
    TorchBatchNorm (models/norm.py — NUM_SYNC_DEVICES groups map onto
    ``num_splits``; no collective primitive in the model).
    """
    name = cfg.MODEL.MODEL_NAME
    # Upstream auditory-slow-fast YAMLs use MODEL_NAME "SlowFast" for the
    # same architecture this fork registers as "AudioSlowFast".
    aliases = {"SlowFast": "AudioSlowFast"}
    name = aliases.get(name, name)
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Model {name} not registered; have {sorted(MODEL_REGISTRY)}")
    # State projections apply to the GRU model (audio_model_builder.py:371-378)
    # and to the single-clip AudioSlowFast (the reference ships the head as
    # state_head_helper.py but never registers it; here it is first-class).
    if name in ("AudioSlowFast", "AudioSlowFastGRU") and not cfg.MODEL.ONLY_ACTION_RECOGNITION:
        _maybe_append_state_classes(cfg)
    return MODEL_REGISTRY[name](cfg=StaticCfg(cfg), dtype=compute_dtype(cfg))


def _maybe_append_state_classes(cfg):
    """Append len(PDDL attributes) to NUM_CLASSES (audio_model_builder.py:371-378)."""
    if isinstance(cfg.MODEL.PDDL_ATTRIBUTES, str) and cfg.MODEL.PDDL_ATTRIBUTES.endswith(".csv"):
        import pandas as pd

        attrs = pd.read_csv(cfg.MODEL.PDDL_ATTRIBUTES)["attribute"].to_list()
        if len(cfg.MODEL.NUM_CLASSES) == 2:
            cfg.MODEL.NUM_CLASSES.append(len(attrs))
