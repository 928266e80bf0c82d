"""Max-pool with a TPU-friendly backward (no select_and_scatter).

The stems pool (3, 3)/stride-2 right after conv+BN+ReLU
(/root/reference/audio_slowfast/models/stem_helper.py:139-168 — torch
``nn.MaxPool2d(3, 2, 1)``), on the largest activations in the whole net.
XLA differentiates ``reduce_window(max)`` into ``select_and_scatter_add``,
which lowers to a windowed serial scan on the TPU vector unit — the same
class of slow path as the round-1 SpecAugment gather (CLAUDE.md) and the
prime suspect in the unprofiled backward (VERDICT r3 weak #5).

This module keeps the optimal forward (``lax.reduce_window``) and swaps the
VJP for a claim-chain over the window taps: for each static tap offset the
gradient cell claims windows whose max it equals and that no earlier tap
claimed (row-major tap order = torch's and XLA's first-match tie routing).
Claims then land via stride-residue PARITY PLANES: input position
``p = s*a + d`` belongs to residue ``d % s``, so every tap accumulates into
one of ``s_t * s_f`` output-sized planes (plain pads + adds — planes are
disjoint, so at most ``ceil(k/s)`` adds collide per cell) and ONE
stack/reshape interleave materialises the input-sized gradient. The first
version of this landing used one interior-dilated ``lax.pad`` + full-size
add PER TAP (9 gradient-sized round-trips through HBM at the stem pool);
the plane form writes the gradient once. Every op is an elementwise
compare/select, a plain pad, or a reshape — VPU/copy-bandwidth work with
static shapes, no scatter. Gradients are BIT-IDENTICAL to torch's MaxPool2d
backward (first max in the window wins ties; contributions from overlapping
windows sum) — asserted against torch in tests/test_maxpool.py.

Set ``ASF_MAXPOOL_SAS_BWD=1`` to fall back to the stock
``select_and_scatter`` autodiff path (A/B escape hatch for benchmarks).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax


def _use_sas_bwd() -> bool:
    return bool(int(os.environ.get("ASF_MAXPOOL_SAS_BWD", "0")))


@functools.lru_cache(maxsize=None)
def _make_pool(window: tuple, strides: tuple, padding: tuple):
    kt, kf = window
    st, sf = strides
    (pt0, pt1), (pf0, pf1) = padding

    def _fwd_raw(x):
        return lax.reduce_window(
            x,
            -jnp.inf,
            lax.max,
            (1, kt, kf, 1),
            (1, st, sf, 1),
            ((0, 0), (pt0, pt1), (pf0, pf1), (0, 0)),
        )

    @jax.custom_vjp
    def pool(x):
        return _fwd_raw(x)

    def pool_fwd(x):
        y = _fwd_raw(x)
        return y, (x, y)

    def pool_bwd(res, g):
        x, y = res
        b, _, _, c = x.shape
        neg = jnp.asarray(-jnp.inf, x.dtype)
        xp = jnp.pad(
            x, ((0, 0), (pt0, pt1), (pf0, pf1), (0, 0)), constant_values=neg
        )
        tp, fp = xp.shape[1], xp.shape[2]
        to, fo = y.shape[1], y.shape[2]
        zero = jnp.zeros((), g.dtype)
        claimed = jnp.zeros(y.shape, bool)
        # residue-plane accumulators: plane[rt][rf][i, j] is the gradient of
        # input position (st*i + rt, sf*j + rf) — planes partition the input.
        lt_ = -(-tp // st)
        lf_ = -(-fp // sf)
        planes = [[None for _ in range(sf)] for _ in range(st)]
        for dt in range(kt):
            for df in range(kf):
                t_end = dt + st * (to - 1) + 1
                f_end = df + sf * (fo - 1) + 1
                if t_end > tp or f_end > fp:  # tap never inside any window
                    continue
                tap = lax.slice(
                    xp, (0, dt, df, 0), (b, t_end, f_end, c), (1, st, sf, 1)
                )
                take = (tap == y) & ~claimed
                claimed = claimed | take
                # tap (dt, df) lands at p = (st*a + dt, sf*e + df): plane
                # (dt % st, df % sf), index (a + dt//st, e + df//sf).
                rt, sht = dt % st, dt // st
                rf, shf = df % sf, df // sf
                part = lax.pad(
                    jnp.where(take, g, zero),
                    zero,
                    (
                        (0, 0, 0),
                        (sht, lt_ - to - sht, 0),
                        (shf, lf_ - fo - shf, 0),
                        (0, 0, 0),
                    ),
                )
                prev = planes[rt][rf]
                planes[rt][rf] = part if prev is None else prev + part
        zplane = None
        rows = []
        for rt in range(st):
            row = []
            for rf in range(sf):
                p_ = planes[rt][rf]
                if p_ is None:
                    if zplane is None:
                        zplane = jnp.zeros((b, lt_, lf_, c), g.dtype)
                    p_ = zplane
                row.append(p_)
            rows.append(jnp.stack(row, axis=3))  # (b, lt, lf, sf, c)
        # interleave: row-major over (i, rt) pairs is exactly p_t = st*i + rt
        grad = jnp.stack(rows, axis=2).reshape(b, lt_ * st, lf_ * sf, c)[
            :, :tp, :fp, :
        ]
        return (grad[:, pt0 : tp - pt1, pf0 : fp - pf1, :],)

    pool.defvjp(pool_fwd, pool_bwd)
    return pool


def max_pool(x, window=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))):
    """(B, T, F, C) max pool; forward == flax ``nn.max_pool`` bit-for-bit,
    backward routed via the claim-chain VJP (torch first-match semantics)."""
    window = tuple(int(w) for w in window)
    strides = tuple(int(s) for s in strides)
    padding = tuple((int(p[0]), int(p[1])) for p in padding)
    if _use_sas_bwd():
        from flax import linen as nn

        return nn.max_pool(x, window, strides=strides, padding=padding)
    assert jnp.issubdtype(x.dtype, jnp.floating), x.dtype
    return _make_pool(window, strides, padding)(x)
