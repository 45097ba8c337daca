"""BiLSTM scan: cell math vs Keras LSTM, masking/reversal vs a numpy oracle
(tf.nn.bidirectional_dynamic_rnn sequence_length semantics, network.py:104-109).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.ops.rnn import (bilstm, bilstm_init, lstm_init,
                                      lstm_scan, reverse_sequence)


def _np_lstm(kernel, bias, x_tm, lens, forget_bias=1.0):
    """Plain numpy masked LSTM oracle, gate order (i, j, f, o)."""
    t_len, n, d = x_tm.shape
    h_dim = kernel.shape[1] // 4
    w, u = kernel[:d], kernel[d:]
    h = np.zeros((n, h_dim), np.float64)
    c = np.zeros((n, h_dim), np.float64)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    outs = np.zeros((t_len, n, h_dim), np.float64)
    for t in range(t_len):
        gates = x_tm[t] @ w + h @ u + bias
        i, j, f, o = np.split(gates, 4, axis=-1)
        nc = sig(f + forget_bias) * c + sig(i) * np.tanh(j)
        nh = sig(o) * np.tanh(nc)
        live = (t < lens)[:, None]
        h = np.where(live, nh, h)
        c = np.where(live, nc, c)
        outs[t] = np.where(live, nh, 0.0)
    return outs


def test_lstm_scan_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    t_len, n, d, h = 7, 3, 5, 4
    params = lstm_init(jax.random.PRNGKey(0), d, h)
    x = rng.randn(t_len, n, d).astype(np.float32)
    lens = np.array([7, 4, 1], np.int32)
    ours = np.asarray(lstm_scan(params, jnp.asarray(x), jnp.asarray(lens)))
    ref = _np_lstm(np.asarray(params['kernel'], np.float64),
                   np.asarray(params['bias'], np.float64),
                   x.astype(np.float64), lens)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_lstm_matches_keras():
    """Cell math vs tf.keras.layers.LSTM (external oracle), full lengths."""
    import tensorflow as tf
    rng = np.random.RandomState(1)
    t_len, n, d, h = 6, 2, 4, 3
    params = lstm_init(jax.random.PRNGKey(1), d, h)
    x = rng.randn(n, t_len, d).astype(np.float32)
    lens = np.full((n,), t_len, np.int32)

    kernel = np.asarray(params['kernel'])
    w, u = kernel[:d], kernel[d:]
    # ours: (i, j, f, o); keras: (i, f, c, o) with j == c
    perm = np.concatenate([np.arange(0, h), np.arange(2 * h, 3 * h),
                           np.arange(h, 2 * h), np.arange(3 * h, 4 * h)])
    layer = tf.keras.layers.LSTM(h, return_sequences=True, unit_forget_bias=False)
    layer.build((n, t_len, d))
    bias_k = np.zeros((4 * h,), np.float32)
    bias_k[h:2 * h] = 1.0  # keras f-bias 1.0 == our compute-time forget_bias
    layer.set_weights([w[:, perm], u[:, perm], bias_k])
    theirs = layer(tf.constant(x)).numpy()

    ours = np.asarray(lstm_scan(params, jnp.swapaxes(jnp.asarray(x), 0, 1),
                                jnp.asarray(lens)))
    ours = np.swapaxes(ours, 0, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_reverse_sequence_matches_tf():
    import tensorflow as tf
    rng = np.random.RandomState(2)
    x = rng.randn(6, 3, 2).astype(np.float32)  # [T, N, D]
    lens = np.array([6, 3, 1], np.int32)
    ours = np.asarray(reverse_sequence(jnp.asarray(x), jnp.asarray(lens)))
    theirs = tf.reverse_sequence(
        np.swapaxes(x, 0, 1), lens, seq_axis=1, batch_axis=0).numpy()
    np.testing.assert_allclose(ours, np.swapaxes(theirs, 0, 1), rtol=1e-6)


def test_bilstm_shapes_and_mask():
    t_len, n, d, nh = 9, 4, 6, 8  # nh = total hidden (2 dirs x 4)
    params = bilstm_init(jax.random.PRNGKey(3), d, nh)
    x = np.random.RandomState(3).randn(n, t_len, d).astype(np.float32)
    lens = np.array([9, 5, 2, 7], np.int32)
    out = np.asarray(bilstm(params, jnp.asarray(x), jnp.asarray(lens)))
    assert out.shape == (n, t_len, nh)
    # outputs past sequence length are exactly zero (dynamic_rnn contract)
    for i, ln in enumerate(lens):
        assert np.abs(out[i, ln:, :]).max() == 0.0 if ln < t_len else True
    # backward half at the first frame depends on the *last valid* frame:
    # truncating the padding must not change outputs within the valid range
    out2 = np.asarray(bilstm(params, jnp.asarray(x[:, :7]),
                             jnp.asarray(np.minimum(lens, 7))))
    for i, ln in enumerate(lens):
        if ln <= 7:  # rows whose sequence was actually clipped differ by design
            np.testing.assert_allclose(out[i, :ln], out2[i, :ln],
                                       rtol=1e-5, atol=1e-6)


def test_bilstm_matches_tf_bidirectional():
    """Full bidirectional vs keras Bidirectional(LSTM) with masking."""
    import tensorflow as tf
    rng = np.random.RandomState(4)
    t_len, n, d, h = 8, 3, 4, 3
    params = bilstm_init(jax.random.PRNGKey(4), d, 2 * h)
    x = rng.randn(n, t_len, d).astype(np.float32)
    lens = np.array([8, 5, 3], np.int32)

    def mk_keras(p):
        kernel = np.asarray(p['kernel'])
        w, u = kernel[:d], kernel[d:]
        perm = np.concatenate([np.arange(0, h), np.arange(2 * h, 3 * h),
                               np.arange(h, 2 * h), np.arange(3 * h, 4 * h)])
        bias_k = np.zeros((4 * h,), np.float32)
        bias_k[h:2 * h] = 1.0
        return w[:, perm], u[:, perm], bias_k

    fw = tf.keras.layers.LSTM(h, return_sequences=True, unit_forget_bias=False)
    bi = tf.keras.layers.Bidirectional(fw, merge_mode='concat')
    bi.build((n, t_len, d))
    wf, uf, bf = mk_keras(params['fw'])
    wb, ub, bb = mk_keras(params['bw'])
    bi.set_weights([wf, uf, bf, wb, ub, bb])
    mask = tf.sequence_mask(lens, t_len)
    theirs = bi(tf.constant(x), mask=mask).numpy()
    # keras zeroes masked outputs too
    ours = np.asarray(bilstm(params, jnp.asarray(x), jnp.asarray(lens)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
