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
    """LSTM_IMPL='pallas' is a TPU-only fast path: off-TPU the selector
    falls back to lax.scan (not interpret-mode Pallas). The full bilstm
    built on the forced kernel must still match the scan path."""
    old = cfg.LSTM_IMPL
    try:
        cfg.LSTM_IMPL = 'pallas'
        assert rnn.select_scan() is rnn.lstm_scan     # CPU backend here
        cfg.LSTM_IMPL = 'jax'
        assert rnn.select_scan() is rnn.lstm_scan
    finally:
        cfg.LSTM_IMPL = old

    cells = rnn.bilstm_init(jax.random.PRNGKey(0), input_dim=12, num_hids=16)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 9, 12).astype(np.float32))   # [N, T, D]
    lens = jnp.asarray(np.array([9, 5, 1, 7], np.int32))
    out_jax = np.asarray(rnn.bilstm(cells, x, lens))

    import lstm_ctc_ocr_tpu.ops.rnn as rnn_mod
    orig = rnn_mod.select_scan
    rnn_mod.select_scan = lambda: rnn_pallas.lstm_scan   # force the kernel
    try:
        out_pal = np.asarray(rnn.bilstm(cells, x, lens))
    finally:
        rnn_mod.select_scan = orig
    np.testing.assert_allclose(out_pal, out_jax, rtol=1e-5, atol=1e-5)


# --- bf16: the SHIPPED training path (cfg.TRAIN.DTYPE='bfloat16') ------------

def _bf16_ulp_atol(ref, n_ulp=4.0):
    """bf16 has an 8-bit mantissa: 1 ulp ~= scale * 2^-8. Both
    implementations accumulate in f32 but round to bf16 at different points
    (custom_vjp casts grads to the param dtype), so results may differ by a
    couple of ulps of each tensor's own scale."""
    scale = float(np.max(np.abs(np.asarray(ref, np.float32)))) or 1.0
    return n_ulp * scale / 256.0


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_pallas_scan_bf16_forward_matches(seed):
    params, x, lens = _case(seed, t=23, n=8, d=16, h=8)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    xb = x.astype(jnp.bfloat16)
    out_p = rnn_pallas.lstm_scan(pb, xb, lens)
    out_s = rnn.lstm_scan(pb, xb, lens)
    assert out_p.dtype == jnp.bfloat16 and out_s.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.float32(out_p), np.float32(out_s),
                               atol=_bf16_ulp_atol(out_s), rtol=0)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_pallas_scan_bf16_gradients_match(seed):
    """Directly pins the bf16 backward kernel (the shipped gradient path)
    against lax.scan AD in bf16 — not just transitively via convergence."""
    params, x, lens = _case(seed, t=23, n=8, d=16, h=8)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    xb = x.astype(jnp.bfloat16)

    def loss_p(p, x):
        return jnp.sum(jnp.tanh(rnn_pallas.lstm_scan(p, x, lens)
                                .astype(jnp.float32)))

    def loss_s(p, x):
        return jnp.sum(jnp.tanh(rnn.lstm_scan(p, x, lens)
                                .astype(jnp.float32)))

    (gp, gpx) = jax.grad(loss_p, argnums=(0, 1))(pb, xb)
    (gs, gsx) = jax.grad(loss_s, argnums=(0, 1))(pb, xb)
    for a, b in [(gp['kernel'], gs['kernel']), (gp['bias'], gs['bias']),
                 (gpx, gsx)]:
        np.testing.assert_allclose(np.float32(a), np.float32(b),
                                   atol=_bf16_ulp_atol(b), rtol=0)


def test_bilstm_bf16_pallas_matches_jax():
    """Full BiLSTM layer in bf16: Pallas kernels vs the lax.scan path."""
    cells = rnn.bilstm_init(jax.random.PRNGKey(0), input_dim=12, num_hids=16)
    cells = jax.tree.map(lambda p: p.astype(jnp.bfloat16), cells)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 9, 12).astype(np.float32)).astype(jnp.bfloat16)
    lens = jnp.asarray(np.array([9, 5, 1, 7], np.int32))
    out_jax = rnn.bilstm(cells, x, lens)

    import lstm_ctc_ocr_tpu.ops.rnn as rnn_mod
    orig = rnn_mod.select_scan
    rnn_mod.select_scan = lambda: rnn_pallas.lstm_scan   # force the kernel
    try:
        out_pal = rnn.bilstm(cells, x, lens)
    finally:
        rnn_mod.select_scan = orig
    np.testing.assert_allclose(np.float32(out_pal), np.float32(out_jax),
                               atol=_bf16_ulp_atol(out_jax), rtol=0)


# --- fused BiLSTM (single-kernel fw+bw, VERDICT r1 item 5) -------------------

@pytest.mark.parametrize('seed,t', [(0, 19), (1, 8), (2, 24)])
def test_fused_bilstm_forward_matches_scan_pair(seed, t):
    """rnn_pallas.bilstm (one kernel, reversal absorbed into the masked
    descending scan) vs the two-scan + reverse_sequence formulation."""
    cells = rnn.bilstm_init(jax.random.PRNGKey(seed), input_dim=12,
                            num_hids=16)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(4, t, 12).astype(np.float32))
    lens = jnp.asarray(rng.randint(1, t + 1, size=(4,)).astype(np.int32))
    ref = np.asarray(rnn.bilstm_scan_pair(cells, x, lens))
    fused = np.asarray(rnn_pallas.bilstm(cells, x, lens))
    np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)


def test_fused_bilstm_gradients_match_scan_pair():
    cells = rnn.bilstm_init(jax.random.PRNGKey(3), input_dim=12, num_hids=16)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 19, 12).astype(np.float32))
    lens = jnp.asarray(np.array([19, 5, 1, 12], np.int32))

    def loss(bilstm_fn):
        return lambda p, x: jnp.sum(jnp.tanh(bilstm_fn(p, x, lens)))

    gr, grx = jax.grad(loss(rnn.bilstm_scan_pair), argnums=(0, 1))(cells, x)
    gf, gfx = jax.grad(loss(rnn_pallas.bilstm), argnums=(0, 1))(cells, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5), gr, gf)
    np.testing.assert_allclose(np.asarray(gfx), np.asarray(grx),
                               rtol=1e-5, atol=1e-5)


def test_fused_bilstm_bf16_matches_scan_pair():
    """The shipped bf16 path through the fused kernel, ulp tolerances."""
    cells = rnn.bilstm_init(jax.random.PRNGKey(0), input_dim=12, num_hids=16)
    cells = jax.tree.map(lambda p: p.astype(jnp.bfloat16), cells)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 9, 12).astype(np.float32)).astype(jnp.bfloat16)
    lens = jnp.asarray(np.array([9, 5, 1, 7], np.int32))
    ref = rnn.bilstm_scan_pair(cells, x, lens)
    fused = rnn_pallas.bilstm(cells, x, lens)
    np.testing.assert_allclose(np.float32(fused), np.float32(ref),
                               atol=_bf16_ulp_atol(ref), rtol=0)

    def loss(fn):
        return lambda p: jnp.sum(jnp.tanh(fn(p, x, lens).astype(jnp.float32)))

    gr = jax.grad(loss(rnn.bilstm_scan_pair))(cells)
    gf = jax.grad(loss(rnn_pallas.bilstm))(cells)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.float32(a), np.float32(b), atol=_bf16_ulp_atol(b), rtol=0), gf, gr)


def test_select_bilstm_dispatch():
    """'pallas' is TPU-only for the fused BiLSTM too; CPU falls back to the
    scan pair."""
    old = cfg.LSTM_IMPL
    try:
        cfg.LSTM_IMPL = 'pallas'
        assert rnn.select_bilstm() is rnn.bilstm_scan_pair   # CPU backend
        cfg.LSTM_IMPL = 'jax'
        assert rnn.select_bilstm() is rnn.bilstm_scan_pair
    finally:
        cfg.LSTM_IMPL = old


# --- batch-chunked grid (VMEM frame constant in batch size) ------------------

def test_fused_bilstm_multi_chunk_batch():
    """Batches past the per-chunk row cap tile onto the leading grid dim
    (f32 cap is 32, so n=40 pads to 64 and runs as 2 chunks): outputs and
    all gradients must still match the scan pair, including the padded
    rows being invisible."""
    assert rnn_pallas._chunk_rows(jnp.float32) == 32
    cells = rnn.bilstm_init(jax.random.PRNGKey(7), input_dim=12, num_hids=16)
    rng = np.random.RandomState(7)
    n, t = 40, 11
    x = jnp.asarray(rng.randn(n, t, 12).astype(np.float32))
    lens = jnp.asarray(rng.randint(1, t + 1, size=(n,)).astype(np.int32))

    ref = np.asarray(rnn.bilstm_scan_pair(cells, x, lens))
    fused = np.asarray(rnn_pallas.bilstm(cells, x, lens))
    assert fused.shape == (n, t, 16)
    np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda p, x: jnp.sum(jnp.tanh(fn(p, x, lens)))

    gr, grx = jax.grad(loss(rnn.bilstm_scan_pair), argnums=(0, 1))(cells, x)
    gf, gfx = jax.grad(loss(rnn_pallas.bilstm), argnums=(0, 1))(cells, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), gr, gf)
    np.testing.assert_allclose(np.asarray(gfx), np.asarray(grx),
                               rtol=1e-4, atol=1e-5)


def test_lstm_scan_multi_chunk_batch():
    params, _, _ = _case(11)
    rng = np.random.RandomState(11)
    n, t = 40, 9
    x = jnp.asarray(rng.randn(t, n, 12).astype(np.float32))
    lens = jnp.asarray(rng.randint(1, t + 1, size=(n,)).astype(np.int32))
    out_p = np.asarray(rnn_pallas.lstm_scan(params, x, lens))
    out_s = np.asarray(rnn.lstm_scan(params, x, lens))
    assert out_p.shape == (t, n, 8)
    np.testing.assert_allclose(out_p, out_s, rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda p, x: jnp.sum(jnp.tanh(fn(p, x, lens)))

    gs, gsx = jax.grad(loss(rnn.lstm_scan), argnums=(0, 1))(params, x)
    gp, gpx = jax.grad(loss(rnn_pallas.lstm_scan), argnums=(0, 1))(params, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), gs, gp)
    np.testing.assert_allclose(np.asarray(gpx), np.asarray(gsx),
                               rtol=1e-4, atol=1e-5)
