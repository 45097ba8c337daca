"""Conformance: JAX CTC kernels vs the C++ reference implementation
(the native twin of warp-ctc; BASELINE.md 'loss/grad <= 1e-5')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.native.ctc_ref import ctc_loss_grad
from lstm_ctc_ocr_tpu.ops.ctc import ctc_loss


def _rand_case(seed, n=5, t=18, c=11, lmax=6, tmin=13):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, t, c).astype(np.float32) * 2.5
    label_lens = rng.randint(1, lmax + 1, size=n).astype(np.int32)
    labels = np.zeros((n, lmax), np.int32)
    for i in range(n):
        labels[i, :label_lens[i]] = rng.randint(1, c, size=label_lens[i])
    logit_lens = rng.randint(tmin, t + 1, size=n).astype(np.int32)
    return logits, labels, label_lens, logit_lens


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_jax_ctc_matches_cpp_reference(seed):
    logits, labels, label_lens, logit_lens = _rand_case(seed)
    ref_loss, ref_grad = ctc_loss_grad(logits, labels, label_lens, logit_lens)

    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(label_lens), jnp.asarray(logit_lens)))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5, atol=1e-5)

    f = lambda lg: jnp.sum(ctc_loss(lg, jnp.asarray(labels),
                                    jnp.asarray(label_lens),
                                    jnp.asarray(logit_lens)))
    our_grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    np.testing.assert_allclose(our_grad, ref_grad, rtol=1e-5, atol=1e-5)


def test_cpp_reference_matches_tf():
    """Anchor the C++ reference itself against tf.nn.ctc_loss."""
    import tensorflow as tf
    logits, labels, label_lens, logit_lens = _rand_case(9, n=4, t=15, c=8)
    ref_loss, ref_grad = ctc_loss_grad(logits, labels, label_lens, logit_lens)
    lg = tf.constant(logits)
    with tf.GradientTape() as tape:
        tape.watch(lg)
        loss = tf.nn.ctc_loss(labels=tf.constant(labels), logits=lg,
                              label_length=tf.constant(label_lens),
                              logit_length=tf.constant(logit_lens),
                              logits_time_major=False, blank_index=0)
        total = tf.reduce_sum(loss)
    tf_grad = tape.gradient(total, lg).numpy()
    np.testing.assert_allclose(ref_loss, loss.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ref_grad, tf_grad, rtol=1e-5, atol=1e-5)


def test_cpp_reference_long_labels():
    """Long-line stress shape (20+ chars, 62-class vocab)."""
    rng = np.random.RandomState(3)
    n, t, c, l = 2, 90, 64, 24
    logits = rng.randn(n, t, c).astype(np.float32)
    labels = np.zeros((n, l), np.int32)
    label_lens = np.array([20, 24], np.int32)
    for i in range(n):
        labels[i, :label_lens[i]] = rng.randint(1, 63, size=label_lens[i])
    logit_lens = np.array([85, 90], np.int32)
    ref_loss, ref_grad = ctc_loss_grad(logits, labels, label_lens, logit_lens)
    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(label_lens), jnp.asarray(logit_lens)))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5, atol=1e-5)
    f = lambda lg: jnp.sum(ctc_loss(lg, jnp.asarray(labels),
                                    jnp.asarray(label_lens),
                                    jnp.asarray(logit_lens)))
    our_grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    # f32 scan over 90 frames vs the C++ double path: ~1e-4 abs is pure
    # accumulation rounding (losses themselves agree to 1e-5)
    np.testing.assert_allclose(our_grad, ref_grad, rtol=1e-4, atol=1e-4)


def test_native_rejects_out_of_range_labels():
    """Out-of-range label ids / lengths must fail loudly, not corrupt heap."""
    import pytest
    from lstm_ctc_ocr_tpu.native.ctc_ref import ctc_loss_grad

    logits = np.zeros((1, 5, 4), np.float32)
    good = np.array([[1, 2]], np.int32)
    with pytest.raises(AssertionError):
        ctc_loss_grad(logits, np.array([[1, 4]], np.int32),   # id == C
                      np.array([2], np.int32), np.array([5], np.int32))
    with pytest.raises(AssertionError):
        ctc_loss_grad(logits, good, np.array([3], np.int32),  # l_len > L
                      np.array([5], np.int32))
    with pytest.raises(AssertionError):
        ctc_loss_grad(logits, good, np.array([2], np.int32),
                      np.array([9], np.int32))                # t_len > T
