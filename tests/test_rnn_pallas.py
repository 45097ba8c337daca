"""Fused Pallas LSTM scan (interpret mode on CPU): must match the lax.scan
implementation in ops/rnn.py — forward outputs and gradients w.r.t. inputs,
kernel, and bias — including the dynamic_rnn length-masking semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg
from lstm_ctc_ocr_tpu.ops import rnn, rnn_pallas


def _case(seed, t=9, n=6, d=12, h=8):
    rng = np.random.RandomState(seed)
    params = {
        'kernel': jnp.asarray(rng.randn(d + h, 4 * h).astype(np.float32) * 0.3),
        'bias': jnp.asarray(rng.randn(4 * h).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.randn(t, n, d).astype(np.float32))
    lens = jnp.asarray(rng.randint(1, t + 1, size=n).astype(np.int32))
    return params, x, lens


@pytest.mark.parametrize('seed', [0, 1])
def test_pallas_scan_matches_lax_scan(seed):
    params, x, lens = _case(seed)
    out_p = np.asarray(rnn_pallas.lstm_scan(params, x, lens))
    out_s = np.asarray(rnn.lstm_scan(params, x, lens))
    np.testing.assert_allclose(out_p, out_s, rtol=1e-5, atol=1e-5)


def test_pallas_scan_masks_past_length():
    params, x, lens = _case(2)
    out = np.asarray(rnn_pallas.lstm_scan(params, x, lens))
    t_idx = np.arange(x.shape[0])[:, None]
    dead = t_idx >= np.asarray(lens)[None, :]
    assert np.all(out[dead] == 0.0)


@pytest.mark.parametrize('seed', [0, 3])
def test_pallas_scan_gradients_match(seed):
    params, x, lens = _case(seed, t=7, n=5, d=10, h=8)

    def loss_p(params, x):
        return jnp.sum(jnp.tanh(rnn_pallas.lstm_scan(params, x, lens)))

    def loss_s(params, x):
        return jnp.sum(jnp.tanh(rnn.lstm_scan(params, x, lens)))

    (gp_params, gp_x) = jax.grad(loss_p, argnums=(0, 1))(params, x)
    (gs_params, gs_x) = jax.grad(loss_s, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gs_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_params['kernel']),
                               np.asarray(gs_params['kernel']),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_params['bias']),
                               np.asarray(gs_params['bias']),
                               rtol=1e-4, atol=1e-5)


def test_bilstm_dispatch_pallas_matches_jax():
    params_rng = jax.random.PRNGKey(0)
    cells = rnn.bilstm_init(params_rng, input_dim=12, num_hids=16)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 9, 12).astype(np.float32))   # [N, T, D]
    lens = jnp.asarray(np.array([9, 5, 1, 7], np.int32))
    old = cfg.LSTM_IMPL
    try:
        cfg.LSTM_IMPL = 'jax'
        out_jax = np.asarray(rnn.bilstm(cells, x, lens))
        cfg.LSTM_IMPL = 'pallas'
        out_pal = np.asarray(rnn.bilstm(cells, x, lens))
    finally:
        cfg.LSTM_IMPL = old
    np.testing.assert_allclose(out_pal, out_jax, rtol=1e-5, atol=1e-5)
