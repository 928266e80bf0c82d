"""Golden test of the vectorised state-label builder against a direct numpy
re-enactment of the reference's prepare_state_labels
(/root/reference/audio_slowfast/tools/train_utils.py:41-73): windows before
length//2 carry the precondition, the rest up to length the postcondition,
one-hot over {-1,0,1} -> 3 classes, padded windows filled with -1."""

import numpy as np
import jax.numpy as jnp

from asf_tpu.engine.steps import prepare_state_labels_jnp


def reference_semantics(precs, posts, lengths, n):
    b, p = posts.shape
    state = np.repeat(posts[:, None, :], n, axis=1).copy()
    for i, length in enumerate(lengths):
        state[i, : length // 2] = precs[i]
    state = (state + 1).astype(np.int64)
    one_hot = np.eye(3, dtype=np.float32)[state]  # (B, N, P, 3)
    for i, length in enumerate(lengths):
        one_hot[i, length:] = -1.0
    return one_hot


def test_prepare_state_labels_matches_reference_semantics():
    rng = np.random.default_rng(0)
    b, n, p = 5, 7, 4
    precs = rng.integers(-1, 2, (b, p)).astype(np.float32)
    posts = rng.integers(-1, 2, (b, p)).astype(np.float32)
    lengths = np.array([1, 2, 3, 7, 5], np.int32)

    got = np.asarray(
        prepare_state_labels_jnp(
            jnp.asarray(precs), jnp.asarray(posts), jnp.asarray(lengths), n
        )
    )
    want = reference_semantics(precs, posts, lengths, n)
    np.testing.assert_array_equal(got, want)


def test_single_window_gets_postcondition():
    # N=1, length=1: 1//2 == 0 windows of precondition -> the only window is
    # the postcondition (the semantics the single-clip state head relies on)
    precs = np.array([[-1.0, 0.0]], np.float32)
    posts = np.array([[1.0, 0.0]], np.float32)
    got = np.asarray(
        prepare_state_labels_jnp(
            jnp.asarray(precs), jnp.asarray(posts), jnp.asarray([1]), 1
        )
    )
    want = np.eye(3, dtype=np.float32)[np.array([[[2, 1]]])]
    np.testing.assert_array_equal(got, want)
