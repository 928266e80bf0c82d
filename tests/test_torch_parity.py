"""Numerical parity of asf_tpu building blocks against torch ops.

These tests validate both the layer math and the .pyth converter's weight
layout transforms, using torch (CPU) as the oracle — the same kernels the
reference runs on.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from asf_tpu.checkpoint.pyth_converter import flax_to_torch_state, torch_state_to_flax
from asf_tpu.models.layers import conv2d
from asf_tpu.models.norm import TorchBatchNorm
from asf_tpu.models.gru import TorchGRU

RTOL = 2e-5
ATOL = 2e-5


def _np(x):
    # copy: torch updates BN running stats in place and numpy() is a view
    return x.detach().cpu().numpy().copy()


@pytest.mark.parametrize(
    "cin,cout,kernel,stride,padding,dilation,groups",
    [
        (1, 8, (5, 7), (2, 2), (2, 3), (1, 1), 1),
        (8, 16, (3, 1), (1, 1), (1, 0), (1, 1), 1),
        (16, 16, (1, 3), (1, 2), (0, 2), (1, 2), 1),
        (8, 8, (1, 3), (1, 1), (0, 1), (1, 1), 2),
    ],
)
def test_conv2d_matches_torch(cin, cout, kernel, stride, padding, dilation, groups):
    torch.manual_seed(0)
    tconv = tnn.Conv2d(
        cin, cout, kernel, stride=stride, padding=padding, dilation=dilation,
        groups=groups, bias=False,
    )
    x = torch.randn(2, cin, 16, 20)
    want = _np(tconv(x))  # (B, C, H, W)

    fconv = conv2d(cout, kernel, stride, padding, dilation, groups)
    kern = np.transpose(_np(tconv.weight), (2, 3, 1, 0))  # OIHW -> HWIO
    xj = jnp.asarray(np.transpose(_np(x), (0, 2, 3, 1)))  # NCHW -> NHWC
    got = fconv.apply({"params": {"kernel": kern}}, xj)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_batchnorm_matches_torch_train_and_eval():
    torch.manual_seed(1)
    C = 6
    tbn = tnn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
    tbn.weight.data.uniform_(0.5, 1.5)
    tbn.bias.data.uniform_(-0.5, 0.5)

    fbn = TorchBatchNorm(features=C)
    variables = {
        "params": {"scale": _np(tbn.weight), "bias": _np(tbn.bias)},
        "batch_stats": {"mean": _np(tbn.running_mean), "var": _np(tbn.running_var)},
    }

    x = torch.randn(4, C, 5, 7)
    xj = jnp.asarray(np.transpose(_np(x), (0, 2, 3, 1)))

    # --- train step: normalised output + running-stat updates must match
    tbn.train()
    want = _np(tbn(x))
    got, mutated = fbn.apply(variables, xj, use_running_average=False, mutable=["batch_stats"])
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]), _np(tbn.running_mean), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]), _np(tbn.running_var), rtol=1e-4, atol=1e-5
    )

    # --- eval step with the updated stats
    tbn.eval()
    x2 = torch.randn(4, C, 5, 7)
    want2 = _np(tbn(x2))
    variables2 = {"params": variables["params"], "batch_stats": dict(mutated["batch_stats"])}
    got2 = fbn.apply(variables2, jnp.asarray(np.transpose(_np(x2), (0, 2, 3, 1))), use_running_average=True)
    got2 = np.transpose(np.asarray(got2), (0, 3, 1, 2))
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-4)


def test_gru_matches_torch_packed_bidirectional():
    """2-layer biGRU with variable lengths + h0 vs torch pack_padded_sequence."""
    torch.manual_seed(2)
    B, N, F, H, L = 3, 5, 12, 8, 2
    tgru = tnn.GRU(input_size=F, hidden_size=H, num_layers=L, batch_first=True, bidirectional=True)

    x = torch.randn(B, N, F)
    lengths = torch.tensor([5, 3, 1])
    h0 = torch.randn(2 * L, B, H)

    packed = tnn.utils.rnn.pack_padded_sequence(x, lengths, batch_first=True, enforce_sorted=False)
    out_packed, _ = tgru(packed, h0)
    want, _ = tnn.utils.rnn.pad_packed_sequence(out_packed, batch_first=True, total_length=N)
    want = _np(want)  # (B, N, 2H); padded positions are zeros

    fgru = TorchGRU(hidden_size=H, num_layers=L, bidirectional=True)
    params = {}
    for name, p in tgru.named_parameters():
        params[name] = _np(p)
    got = fgru.apply(
        {"params": params},
        jnp.asarray(_np(x)),
        jnp.asarray(_np(lengths)),
        jnp.asarray(_np(h0)),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_gru_no_h0_matches_torch():
    torch.manual_seed(3)
    B, N, F, H = 2, 4, 6, 5
    tgru = tnn.GRU(input_size=F, hidden_size=H, num_layers=1, batch_first=True, bidirectional=True)
    x = torch.randn(B, N, F)
    lengths = torch.tensor([4, 4])
    out, _ = tgru(x)
    want = _np(out)

    fgru = TorchGRU(hidden_size=H, num_layers=1, bidirectional=True)
    params = {name: _np(p) for name, p in tgru.named_parameters()}
    got = fgru.apply({"params": params}, jnp.asarray(_np(x)), jnp.asarray(_np(lengths)), None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_converter_roundtrip():
    """torch state -> flax -> torch state is an identity (up to dtype)."""
    torch.manual_seed(4)
    sd = {
        "s1.pathway0_stem.conv.weight": torch.randn(64, 1, 1, 7),
        "s1.pathway0_stem.bn.weight": torch.randn(64),
        "s1.pathway0_stem.bn.bias": torch.randn(64),
        "s1.pathway0_stem.bn.running_mean": torch.randn(64),
        "s1.pathway0_stem.bn.running_var": torch.rand(64) + 0.5,
        "s1.pathway0_stem.bn.num_batches_tracked": torch.tensor(10),
        "head.projection_verb.weight": torch.randn(97, 2304),
        "head.projection_verb.bias": torch.randn(97),
        "head.gru.weight_ih_l0": torch.randn(24, 16),
        "head.gru.bias_hh_l1_reverse": torch.randn(24),
    }
    fx = torch_state_to_flax(sd)
    assert "_skipped_keys" not in fx
    assert fx["params"]["s1"]["pathway0_stem"]["conv"]["kernel"].shape == (1, 7, 1, 64)
    assert fx["params"]["head"]["projection_verb"]["kernel"].shape == (2304, 97)
    assert fx["batch_stats"]["s1"]["pathway0_stem"]["bn"]["mean"].shape == (64,)
    assert fx["params"]["head"]["gru"]["weight_ih_l0"].shape == (24, 16)

    back = flax_to_torch_state(fx)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            assert k not in back
            continue
        np.testing.assert_allclose(back[k], _np(v), rtol=0, atol=0)


def test_converter_clear_name_pattern():
    sd = {"backbone.s1.conv.weight": torch.randn(8, 1, 3, 3)}
    fx = torch_state_to_flax(sd, clear_name_patterns=("backbone.",))
    assert "s1" in fx["params"]


@pytest.mark.parametrize(
    "kt,cout,t,f",
    [
        (1, 64, 100, 128),   # slow stem geometry
        (5, 8, 400, 128),    # fast stem geometry
        (5, 8, 101, 130),    # odd extents
        (3, 4, 37, 41),
    ],
)
def test_stride2_stem_conv_matches_plain_conv(kt, cout, t, f):
    """Stride2StemConv (space-to-depth parity regrouping, layers.py) computes
    the SAME conv as the plain strided nn.Conv on C_in=1 input, with the
    identical param tree — only the compute graph differs."""
    from asf_tpu.models.layers import Stride2StemConv

    rng = np.random.default_rng(3)
    kernel, padding = (kt, 7), (kt // 2, 3)
    x = jnp.asarray(rng.standard_normal((2, t, f, 1)).astype(np.float32))
    kern = rng.standard_normal((kt, 7, 1, cout)).astype(np.float32) * 0.2

    want = conv2d(cout, kernel, (2, 2), padding).apply(
        {"params": {"kernel": kern}}, x
    )
    mod = Stride2StemConv(cout, kernel, padding)
    # init produces the same single-"kernel" param with the same shape
    init_params = mod.init(jax.random.PRNGKey(0), x)["params"]
    assert init_params["kernel"].shape == (kt, 7, 1, cout)
    got = mod.apply({"params": {"kernel": jnp.asarray(kern)}}, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_stem_s2d_bf16_gate_keeps_param_tree():
    """Under COMPUTE_DTYPE=bfloat16 the stems switch to Stride2StemConv; the
    param tree must be identical to the f32 (plain conv) build and the
    forward must agree within bf16 tolerance."""
    from asf_tpu.config import get_cfg
    from asf_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [6]
    cfg.MODEL.ARCH = "slowfast"
    cfg.RESNET.DEPTH = 26
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.AUDIO_DATA.NUM_FRAMES = 64
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
    cfg.SLOWFAST.ALPHA = 4

    rng = np.random.default_rng(0)
    slow = jnp.asarray(rng.standard_normal((2, 16, 32, 1)).astype(np.float32) * 0.3)
    fast = jnp.asarray(rng.standard_normal((2, 64, 32, 1)).astype(np.float32) * 0.3)

    cfg.TPU.COMPUTE_DTYPE = "float32"
    m32 = build_model(cfg)
    v32 = m32.init(jax.random.PRNGKey(0), [slow, fast], train=False)

    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    m16 = build_model(cfg)
    v16 = m16.init(jax.random.PRNGKey(0), [slow, fast], train=False)

    assert jax.tree_util.tree_structure(v32["params"]) == jax.tree_util.tree_structure(
        v16["params"]
    )
    shapes32 = jax.tree.map(lambda a: a.shape, v32["params"])
    shapes16 = jax.tree.map(lambda a: a.shape, v16["params"])
    assert shapes32 == shapes16

    # same weights through both compute paths: bf16 rounding only
    out32 = m32.apply(v32, [slow, fast], train=False)
    out16 = m16.apply(v32, [slow, fast], train=False)
    for a, b in zip(jax.tree.leaves(out32), jax.tree.leaves(out16)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=0.1, atol=0.1
        )
