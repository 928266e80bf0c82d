"""Claim-chain max-pool VJP (asf_tpu/ops/maxpool.py) parity.

Forward must equal flax ``nn.max_pool`` bit-for-bit; backward must equal
torch ``F.max_pool2d``'s gradient bit-for-bit — including tie-heavy inputs,
where first-match routing (first max in the window, row-major) decides which
input cell receives the gradient. The stems pool after ReLU, so exact-zero
ties are common in production (reference: stem_helper.py:139-168).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from flax import linen as nn

from asf_tpu.ops.maxpool import max_pool

GEOMS = [
    # (shape, window, strides, padding)
    ((2, 9, 8, 3), (3, 3), (2, 2), ((1, 1), (1, 1))),  # stem pool
    ((2, 10, 7, 3), (3, 3), (2, 2), ((1, 1), (1, 1))),  # odd freq dim
    ((2, 8, 8, 4), (1, 2), (1, 2), ((0, 0), (0, 0))),  # pathway pool
    ((1, 6, 6, 2), (2, 2), (2, 2), ((0, 0), (0, 0))),  # non-overlapping
    ((2, 7, 5, 2), (3, 2), (1, 2), ((1, 1), (0, 0))),  # mixed stride/pad
]


def _torch_grad(x, g, window, strides, padding):
    assert padding[0][0] == padding[0][1] and padding[1][0] == padding[1][1]
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
    y = F.max_pool2d(
        xt, window, stride=strides, padding=(padding[0][0], padding[1][0])
    )
    y.backward(torch.tensor(np.transpose(g, (0, 3, 1, 2))))
    return np.transpose(xt.grad.numpy(), (0, 2, 3, 1)), np.transpose(
        y.detach().numpy(), (0, 2, 3, 1)
    )


@pytest.mark.parametrize("shape,window,strides,padding", GEOMS)
def test_forward_matches_flax(shape, window, strides, padding):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape), jnp.float32)
    got = max_pool(x, window, strides, padding)
    want = nn.max_pool(x, window, strides=strides, padding=padding)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape,window,strides,padding", GEOMS)
def test_backward_matches_torch_tie_free(shape, window, strides, padding):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape).astype(np.float32)  # continuous: no ties
    fn = lambda v: max_pool(v, window, strides, padding)
    y, vjp = jax.vjp(fn, jnp.asarray(x))
    # integer-valued upstream grads: sums over overlapping windows are exact
    # regardless of accumulation order, so equality asserts pure routing
    g = rng.integers(-8, 9, y.shape).astype(np.float32)
    (gx,) = vjp(jnp.asarray(g))
    want_gx, want_y = _torch_grad(x, g, window, strides, padding)
    np.testing.assert_array_equal(np.asarray(y), want_y)
    np.testing.assert_array_equal(np.asarray(gx), want_gx)


@pytest.mark.parametrize("shape,window,strides,padding", GEOMS)
def test_backward_matches_torch_tie_heavy(shape, window, strides, padding):
    rng = np.random.default_rng(2)
    # quantized to {0,1,2}: most windows contain duplicated maxima, so the
    # gradient routing (first max wins) is what is being asserted
    x = rng.integers(0, 3, shape).astype(np.float32)
    fn = lambda v: max_pool(v, window, strides, padding)
    y, vjp = jax.vjp(fn, jnp.asarray(x))
    g = rng.integers(-8, 9, y.shape).astype(np.float32)  # exact sums (above)
    (gx,) = vjp(jnp.asarray(g))
    want_gx, _ = _torch_grad(x, g, window, strides, padding)
    np.testing.assert_array_equal(np.asarray(gx), want_gx)


def test_backward_under_jit_and_relu_zero_ties():
    """jit + the production pattern: ReLU zeros tie inside pool windows."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 12, 10, 4)).astype(np.float32)

    def net(v):
        h = jax.nn.relu(v)  # exact 0.0 ties everywhere v < 0
        return jnp.sum(max_pool(h) * 0.5)

    gx = jax.jit(jax.grad(net))(jnp.asarray(x))
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
    (0.5 * F.max_pool2d(torch.relu(xt), 3, stride=2, padding=1)).sum().backward()
    want = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(gx), want, atol=0, rtol=0)


def test_sas_escape_hatch(monkeypatch):
    monkeypatch.setenv("ASF_MAXPOOL_SAS_BWD", "1")
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 5, 5, 2)), jnp.float32)
    got = max_pool(x)
    want = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
