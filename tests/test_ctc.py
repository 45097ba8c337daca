"""CTC loss conformance: vs tf.nn.ctc_loss (loss + grads <= 1e-5), vs optax,
finite differences, and the warp-ctc-style flat wrapper.

This pins the from-scratch forward-backward (ops/ctc.py) to the reference's
native component contract (warp-ctc; see BASELINE.md 'CTC loss/grad
conformance <= 1e-5').
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.ops.ctc import ctc_loss, ctc_loss_flat


def _rand_case(seed, n=4, t=14, c=7, lmax=4, tmin=9):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, t, c).astype(np.float32) * 2.0
    label_lens = rng.randint(1, lmax + 1, size=n).astype(np.int32)
    labels = np.zeros((n, lmax), np.int32)
    for i in range(n):
        # labels in 1..C-1 (0 is blank); allow repeats on purpose
        labels[i, :label_lens[i]] = rng.randint(1, c, size=label_lens[i])
    logit_lens = rng.randint(tmin, t + 1, size=n).astype(np.int32)
    return logits, labels, label_lens, logit_lens


def _tf_ctc(logits, labels, label_lens, logit_lens, want_grad=False):
    import tensorflow as tf
    lg = tf.constant(logits)
    with tf.GradientTape() as tape:
        tape.watch(lg)
        loss = tf.nn.ctc_loss(
            labels=tf.constant(labels), logits=lg,
            label_length=tf.constant(label_lens),
            logit_length=tf.constant(logit_lens),
            logits_time_major=False, blank_index=0)
        total = tf.reduce_sum(loss)
    if want_grad:
        grad = tape.gradient(total, lg).numpy()
        return loss.numpy(), grad
    return loss.numpy(), None


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_loss_matches_tf(seed):
    logits, labels, label_lens, logit_lens = _rand_case(seed)
    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(label_lens), jnp.asarray(logit_lens)))
    theirs, _ = _tf_ctc(logits, labels, label_lens, logit_lens)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('seed', [0, 5])
def test_grad_matches_tf(seed):
    logits, labels, label_lens, logit_lens = _rand_case(seed)
    f = lambda lg: jnp.sum(ctc_loss(lg, jnp.asarray(labels),
                                    jnp.asarray(label_lens),
                                    jnp.asarray(logit_lens)))
    ours = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    _, theirs = _tf_ctc(logits, labels, label_lens, logit_lens, want_grad=True)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_loss_matches_optax():
    import optax
    logits, labels, label_lens, logit_lens = _rand_case(7, n=6, t=16, c=9, lmax=5)
    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(label_lens), jnp.asarray(logit_lens)))
    t = logits.shape[1]
    lmax = labels.shape[1]
    t_idx = np.arange(t)[None, :]
    logit_pad = (t_idx >= logit_lens[:, None]).astype(np.float32)
    l_idx = np.arange(lmax)[None, :]
    label_pad = (l_idx >= label_lens[:, None]).astype(np.float32)
    theirs = np.asarray(optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_pad),
                                       jnp.asarray(labels), jnp.asarray(label_pad),
                                       blank_id=0))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_grad_finite_difference():
    logits, labels, label_lens, logit_lens = _rand_case(11, n=2, t=8, c=5, lmax=2, tmin=6)
    lg = jnp.asarray(logits)
    f = lambda x: jnp.sum(ctc_loss(x, jnp.asarray(labels),
                                   jnp.asarray(label_lens), jnp.asarray(logit_lens)))
    g = np.asarray(jax.grad(f)(lg))
    rng = np.random.RandomState(0)
    for _ in range(5):
        i = rng.randint(logits.shape[0])
        t = rng.randint(logit_lens[i])   # only valid frames carry gradient
        c = rng.randint(logits.shape[2])
        eps = 1e-3
        lp = logits.copy(); lp[i, t, c] += eps
        lm = logits.copy(); lm[i, t, c] -= eps
        fd = (float(f(jnp.asarray(lp))) - float(f(jnp.asarray(lm)))) / (2 * eps)
        assert abs(fd - g[i, t, c]) < 5e-3, (fd, g[i, t, c])


def test_padded_frames_have_zero_grad():
    logits, labels, label_lens, logit_lens = _rand_case(3)
    f = lambda lg: jnp.sum(ctc_loss(lg, jnp.asarray(labels),
                                    jnp.asarray(label_lens), jnp.asarray(logit_lens)))
    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    for i, ln in enumerate(logit_lens):
        if ln < logits.shape[1]:
            assert np.abs(g[i, ln:, :]).max() == 0.0


def test_impossible_alignment_is_infinite():
    # label needs 2L+1=9 frames minimum with repeats... use len 3 > logit len 2
    logits = np.zeros((1, 4, 5), np.float32)
    labels = np.array([[1, 1, 1, 0]], np.int32)    # repeats need blank gaps: 3*2-1+... > 4
    out = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(np.array([3], np.int32)),
                              jnp.asarray(np.array([4], np.int32))))
    assert out[0] > 1e20  # effectively +inf (log(0) clamp)


def test_impossible_alignment_has_zero_grad():
    """Infeasible examples must contribute zero gradient (the C++ twin's
    convention, native/ctc_ref.cpp:101) — not the junk produced when the
    NEG_INF logz cancels the NEG_INF in alpha+beta. Feasible examples in
    the same batch keep their gradients."""
    rng = np.random.RandomState(11)
    logits = rng.randn(2, 2, 5).astype(np.float32)
    labels = np.array([[1, 1], [2, 0]], np.int32)   # ex0: needs 3 frames, has 2
    label_lens = np.array([2, 1], np.int32)
    logit_lens = np.array([2, 2], np.int32)

    def f(lg):
        return jnp.sum(ctc_loss(lg, jnp.asarray(labels),
                                jnp.asarray(label_lens),
                                jnp.asarray(logit_lens)))

    loss = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(label_lens),
                               jnp.asarray(logit_lens)))
    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    assert loss[0] > 1e20            # infeasible: loss effectively +inf
    assert np.abs(g[0]).max() == 0.0  # ...and exactly zero gradient
    assert np.isfinite(loss[1]) and np.abs(g[1]).max() > 0.0

    # the Pallas kernel agrees (interpret mode off-TPU)
    from lstm_ctc_ocr_tpu.ops.ctc_pallas import ctc_loss_pallas

    def fp(lg):
        return jnp.sum(ctc_loss_pallas(lg, jnp.asarray(labels),
                                       jnp.asarray(label_lens),
                                       jnp.asarray(logit_lens)))

    gp = np.asarray(jax.grad(fp)(jnp.asarray(logits)))
    assert np.abs(gp[0]).max() == 0.0
    np.testing.assert_allclose(gp[1], g[1], rtol=1e-5, atol=1e-6)


def test_ctc_impl_dispatch():
    """cfg.CTC_IMPL selects the implementation (mirrors cfg.LSTM_IMPL).
    'pallas' is a TPU-only fast path: off-TPU (this suite runs on the CPU
    backend) the selector falls back to the scan implementation rather
    than interpret-mode Pallas."""
    import jax
    from lstm_ctc_ocr_tpu.config import cfg
    from lstm_ctc_ocr_tpu.ops.ctc import select_ctc_loss
    old = cfg.CTC_IMPL
    try:
        cfg.CTC_IMPL = 'pallas'
        got = select_ctc_loss()
        if jax.default_backend() == 'tpu':
            assert got is not ctc_loss          # the kernel dispatch wrapper
        else:
            assert got is ctc_loss              # CPU fallback, no interpret
        cfg.CTC_IMPL = 'scan'
        assert select_ctc_loss() is ctc_loss
    finally:
        cfg.CTC_IMPL = old


def test_flat_wrapper_matches_dense():
    logits, labels, label_lens, logit_lens = _rand_case(5)
    flat = np.concatenate([labels[i, :label_lens[i]] for i in range(len(label_lens))])
    dense_loss = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                                     jnp.asarray(label_lens), jnp.asarray(logit_lens)))
    tm = np.swapaxes(logits, 0, 1)
    flat_loss = np.asarray(ctc_loss_flat(tm, flat, label_lens, logit_lens,
                                         max_label_len=labels.shape[1]))
    np.testing.assert_allclose(dense_loss, flat_loss, rtol=1e-6, atol=1e-6)


def test_jit_and_batch_one():
    logits, labels, label_lens, logit_lens = _rand_case(9, n=1, t=10, c=6, lmax=3, tmin=10)
    fn = jax.jit(ctc_loss)
    out = np.asarray(fn(jnp.asarray(logits), jnp.asarray(labels),
                        jnp.asarray(label_lens), jnp.asarray(logit_lens)))
    theirs, _ = _tf_ctc(logits, labels, label_lens, logit_lens)
    np.testing.assert_allclose(out, theirs, rtol=1e-5, atol=1e-5)
