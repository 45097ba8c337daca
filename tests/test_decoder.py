"""Greedy CTC decode vs tf.nn.ctc_greedy_decoder (merge repeats, drop blanks,
dense 0-padded output like sparse_tensor_to_dense(default_value=0))."""

import numpy as np

import jax.numpy as jnp

from lstm_ctc_ocr_tpu.ops.decoder import greedy_decode


def _tf_greedy(logits, lens):
    """TF greedy decode remapped to blank=0 semantics.

    tf.nn.ctc_greedy_decoder hardwires blank = num_classes-1, while the
    training path (warp-ctc and ours) uses blank=0 — the reference lives
    with this mismatch and relies on the metric stripping 0s
    (test.py:78-81). For a real oracle comparison we permute classes so
    TF's blank is our class 0, then shift ids back.
    """
    import tensorflow as tf
    perm = np.r_[1:logits.shape[2], 0]           # [c1..cK, blank]
    tm = np.swapaxes(logits, 0, 1)[:, :, perm]
    decoded, _ = tf.nn.ctc_greedy_decoder(tf.constant(tm), tf.constant(lens),
                                          merge_repeated=True)
    dense = tf.sparse.to_dense(decoded[0], default_value=-1).numpy()
    return np.where(dense >= 0, dense + 1, 0).astype(np.int32)


def _strip(row):
    return [int(v) for v in row if v != 0]


def test_greedy_matches_tf_random():
    rng = np.random.RandomState(0)
    logits = rng.randn(5, 12, 7).astype(np.float32) * 3
    lens = np.array([12, 9, 5, 12, 1], np.int32)
    ours = np.asarray(greedy_decode(jnp.asarray(logits), jnp.asarray(lens)))
    theirs = _tf_greedy(logits, lens)
    for i in range(len(lens)):
        assert _strip(ours[i]) == _strip(theirs[i]), i


def test_greedy_known_sequence():
    # frames argmax: [2, 2, 0, 2, 1, 1, 0, 0] -> merge/blank-strip -> [2, 2, 1]
    path = [2, 2, 0, 2, 1, 1, 0, 0]
    c = 4
    logits = np.full((1, len(path), c), -5.0, np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 5.0
    out = np.asarray(greedy_decode(jnp.asarray(logits),
                                   jnp.asarray(np.array([len(path)], np.int32))))
    assert _strip(out[0]) == [2, 2, 1]


def test_greedy_respects_length():
    path = [1, 0, 2, 3]  # with len=1 only the first frame counts -> [1]
    logits = np.full((1, 4, 5), -5.0, np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 5.0
    out = np.asarray(greedy_decode(jnp.asarray(logits),
                                   jnp.asarray(np.array([1], np.int32))))
    assert _strip(out[0]) == [1]


def test_greedy_all_blank():
    logits = np.zeros((2, 6, 3), np.float32)
    logits[..., 0] = 9.0
    out = np.asarray(greedy_decode(jnp.asarray(logits),
                                   jnp.asarray(np.array([6, 6], np.int32))))
    assert out.sum() == 0
