"""Pallas CTC kernel (interpret mode on CPU): must match the scan version,
the C++ reference, and TF exactly like ops/ctc.py does."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.native.ctc_ref import ctc_loss_grad
from lstm_ctc_ocr_tpu.ops.ctc import ctc_loss
from lstm_ctc_ocr_tpu.ops.ctc_pallas import ctc_loss_pallas


def _rand_case(seed, n=5, t=16, c=9, lmax=5, tmin=11):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, t, c).astype(np.float32) * 2.0
    label_lens = rng.randint(1, lmax + 1, size=n).astype(np.int32)
    labels = np.zeros((n, lmax), np.int32)
    for i in range(n):
        labels[i, :label_lens[i]] = rng.randint(1, c, size=label_lens[i])
    logit_lens = rng.randint(tmin, t + 1, size=n).astype(np.int32)
    return logits, labels, label_lens, logit_lens


@pytest.mark.parametrize('seed', [0, 1])
def test_pallas_matches_scan_loss_and_grad(seed):
    logits, labels, label_lens, logit_lens = _rand_case(seed)
    args = (jnp.asarray(labels), jnp.asarray(label_lens), jnp.asarray(logit_lens))
    lp = np.asarray(ctc_loss_pallas(jnp.asarray(logits), *args))
    ls = np.asarray(ctc_loss(jnp.asarray(logits), *args))
    np.testing.assert_allclose(lp, ls, rtol=1e-5, atol=1e-5)
    gp = np.asarray(jax.grad(lambda x: jnp.sum(ctc_loss_pallas(x, *args)))(
        jnp.asarray(logits)))
    gs = np.asarray(jax.grad(lambda x: jnp.sum(ctc_loss(x, *args)))(
        jnp.asarray(logits)))
    np.testing.assert_allclose(gp, gs, rtol=1e-5, atol=1e-5)


def test_pallas_matches_cpp_reference():
    logits, labels, label_lens, logit_lens = _rand_case(7, n=11, t=20, c=12, lmax=6)
    ref_loss, ref_grad = ctc_loss_grad(logits, labels, label_lens, logit_lens)
    args = (jnp.asarray(labels), jnp.asarray(label_lens), jnp.asarray(logit_lens))
    ours = np.asarray(ctc_loss_pallas(jnp.asarray(logits), *args))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5, atol=1e-5)
    g = np.asarray(jax.grad(lambda x: jnp.sum(ctc_loss_pallas(x, *args)))(
        jnp.asarray(logits)))
    np.testing.assert_allclose(g, ref_grad, rtol=1e-5, atol=1e-5)


def test_pallas_batch_not_multiple_of_tile():
    """N=11 exercises the TILE_N padding path (losses for pad rows dropped)."""
    logits, labels, label_lens, logit_lens = _rand_case(3, n=11)
    args = (jnp.asarray(labels), jnp.asarray(label_lens), jnp.asarray(logit_lens))
    lp = np.asarray(ctc_loss_pallas(jnp.asarray(logits), *args))
    ls = np.asarray(ctc_loss(jnp.asarray(logits), *args))
    assert lp.shape == (11,)
    np.testing.assert_allclose(lp, ls, rtol=1e-5, atol=1e-5)


def test_pallas_jit_and_impossible():
    logits = np.zeros((1, 4, 5), np.float32)
    labels = np.array([[1, 1, 1, 0]], np.int32)
    fn = jax.jit(ctc_loss_pallas)
    out = np.asarray(fn(jnp.asarray(logits), jnp.asarray(labels),
                        jnp.asarray(np.array([3], np.int32)),
                        jnp.asarray(np.array([4], np.int32))))
    assert out[0] > 1e20


def test_pallas_long_line():
    """Long-line config shape: 24-char labels (S=49 lanes), T=90."""
    rng = np.random.RandomState(5)
    n, t, c, l = 3, 90, 64, 24
    logits = rng.randn(n, t, c).astype(np.float32)
    labels = np.zeros((n, l), np.int32)
    label_lens = np.array([20, 24, 22], np.int32)
    for i in range(n):
        labels[i, :label_lens[i]] = rng.randint(1, 63, size=label_lens[i])
    logit_lens = np.array([85, 90, 88], np.int32)
    args = (jnp.asarray(labels), jnp.asarray(label_lens), jnp.asarray(logit_lens))
    lp = np.asarray(ctc_loss_pallas(jnp.asarray(logits), *args))
    ref_loss, _ = ctc_loss_grad(logits, labels, label_lens, logit_lens)
    np.testing.assert_allclose(lp, ref_loss, rtol=1e-5, atol=1e-5)


def test_pallas_over_lane_budget_falls_back_to_scan():
    """Labels past the lane budget (2L+1 > 128) must not crash: both the
    direct kernel wrapper and the cfg dispatch route to the scan CTC."""
    import copy
    from lstm_ctc_ocr_tpu.config import cfg
    from lstm_ctc_ocr_tpu.ops.ctc import select_ctc_loss
    rng = np.random.RandomState(9)
    n, t, c, l = 2, 160, 20, 70            # S = 141 > 128 lanes
    logits = rng.randn(n, t, c).astype(np.float32)
    labels = np.zeros((n, l), np.int32)
    label_lens = np.array([64, 70], np.int32)
    for i in range(n):
        labels[i, :label_lens[i]] = rng.randint(1, c, size=label_lens[i])
    logit_lens = np.array([150, 160], np.int32)
    args = (jnp.asarray(labels), jnp.asarray(label_lens),
            jnp.asarray(logit_lens))
    ref = np.asarray(ctc_loss(jnp.asarray(logits), *args))
    via_kernel = np.asarray(ctc_loss_pallas(jnp.asarray(logits), *args))
    np.testing.assert_allclose(via_kernel, ref, rtol=1e-6, atol=1e-6)
    old = copy.deepcopy(dict(cfg))
    try:
        cfg.CTC_IMPL = 'pallas'
        via_cfg = np.asarray(select_ctc_loss()(jnp.asarray(logits), *args))
    finally:
        cfg.clear()
        for k, v in old.items():
            cfg[k] = v
    np.testing.assert_allclose(via_cfg, ref, rtol=1e-6, atol=1e-6)
    assert np.isfinite(ref).all()


def test_pallas_bf16_logits_loss_and_grad_match_scan():
    """bf16 logits (the shipped TRAIN.DTYPE) through both CTC impls: each
    casts to f32 internally (log-space stability), so losses agree to f32
    tolerances and the bf16 input-gradients to ~1 ulp of their scale."""
    logits, labels, label_lens, logit_lens = _rand_case(13, n=6, t=18, c=12)
    lb = jnp.asarray(logits).astype(jnp.bfloat16)
    args = (jnp.asarray(labels), jnp.asarray(label_lens),
            jnp.asarray(logit_lens))
    lp = np.asarray(ctc_loss_pallas(lb, *args))
    ls = np.asarray(ctc_loss(lb, *args))
    np.testing.assert_allclose(lp, ls, rtol=1e-5, atol=1e-5)

    gp = jax.grad(lambda x: jnp.sum(ctc_loss_pallas(x, *args)))(lb)
    gs = jax.grad(lambda x: jnp.sum(ctc_loss(x, *args)))(lb)
    assert gp.dtype == jnp.bfloat16 and gs.dtype == jnp.bfloat16
    scale = float(np.max(np.abs(np.float32(gs)))) or 1.0
    np.testing.assert_allclose(np.float32(gp), np.float32(gs),
                               atol=3.0 * scale / 256.0, rtol=0)
