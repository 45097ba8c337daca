"""Conformance of the shifted-matmul conv lowering (ops/conv.py) against
jax.lax.conv_general_dilated — forward and gradients, incl. every conv shape
the CRNN model (models/crnn.py, reference LSTM_train.py:22-36) actually runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_ctc_ocr_tpu.config import cfg
from lstm_ctc_ocr_tpu.ops.conv import conv2d_shifted


def _xla_conv(x, k, strides, padding):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


# (in_shape, kernel_shape, strides, padding)
CASES = [
    # the model's own convs at the W=96 bucket (H'=24 after /4, etc.)
    ((2, 96, 32, 1), (3, 3, 1, 8), (1, 1), 'SAME'),      # conv1 (tiny Ci)
    ((2, 48, 16, 8), (3, 3, 8, 16), (1, 1), 'SAME'),     # conv2
    ((2, 24, 8, 16), (3, 3, 16, 32), (1, 1), 'SAME'),    # conv3_x
    ((2, 24, 4, 32), (3, 3, 32, 64), (1, 1), 'SAME'),    # conv4_x
    ((2, 24, 2, 64), (2, 2, 64, 64), (1, 1), 'VALID'),   # conv5
    # off-model shapes: strides, even kernels, VALID/SAME odd sizes
    ((3, 13, 7, 5), (3, 3, 5, 6), (2, 2), 'SAME'),
    ((3, 13, 7, 5), (3, 2, 5, 6), (2, 1), 'VALID'),
    ((1, 5, 5, 4), (5, 5, 4, 3), (1, 1), 'SAME'),
    ((2, 9, 9, 3), (1, 1, 3, 7), (3, 3), 'SAME'),
]


@pytest.mark.parametrize('in_shape,k_shape,strides,padding', CASES)
def test_forward_matches_xla(in_shape, k_shape, strides, padding):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*in_shape), jnp.float32)
    k = jnp.asarray(rng.randn(*k_shape), jnp.float32)
    ref = _xla_conv(x, k, strides, padding)
    got = conv2d_shifted(x, k, strides, padding)
    assert got.shape == ref.shape
    # identical math, different f32 accumulation order (k*k sequential adds
    # vs XLA's reduction tree) — agreement is ~1e-6 relative
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize('in_shape,k_shape,strides,padding', CASES[:5])
def test_gradients_match_xla(in_shape, k_shape, strides, padding):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*in_shape), jnp.float32)
    k = jnp.asarray(rng.randn(*k_shape), jnp.float32)
    ct = jnp.asarray(rng.randn(
        *_xla_conv(x, k, strides, padding).shape), jnp.float32)

    def loss(fn):
        return lambda x, k: jnp.vdot(fn(x, k, strides, padding), ct)

    gx_ref, gk_ref = jax.grad(loss(_xla_conv), argnums=(0, 1))(x, k)
    gx, gk = jax.grad(loss(conv2d_shifted), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-4)


def test_model_forward_identical_under_conv_impl():
    """The full CRNN logits are bit-comparable (f32, ~1e-5) between
    CONV_IMPL settings — the dispatch changes lowering, not the model."""
    from lstm_ctc_ocr_tpu.models.factory import get_network
    old_impl, old_dtype = cfg.CONV_IMPL, cfg.TRAIN.DTYPE
    try:
        cfg.TRAIN.DTYPE = 'float32'
        net = get_network('LSTM_train')
        n, w = 2, 64
        params = net.init_params(
            jax.random.PRNGKey(0),
            {'data': (n, w, cfg.NUM_FEATURES), 'time_step_len': (n,)})
        rng = np.random.RandomState(2)
        feed = {'data': jnp.asarray(rng.rand(n, w, cfg.NUM_FEATURES),
                                    jnp.float32),
                'time_step_len': jnp.asarray([w // 4 - 1] * n, jnp.int32)}
        outs = {}
        for impl in ('xla', 'shifted'):
            cfg.CONV_IMPL = impl
            outs[impl] = np.asarray(
                net.apply(params, feed, train=False)['logits'])
        np.testing.assert_allclose(outs['shifted'], outs['xla'],
                                   rtol=1e-5, atol=1e-5)
    finally:
        cfg.CONV_IMPL, cfg.TRAIN.DTYPE = old_impl, old_dtype


@pytest.mark.parametrize('in_shape,k_shape', [
    ((2, 24, 4, 32), (3, 3, 32, 64)),     # conv4-like
    ((2, 24, 2, 64), (2, 2, 64, 64)),     # conv5-like
])
def test_bf16_matches_xla_conv(in_shape, k_shape):
    """bf16 (the default TRAIN.DTYPE): the shifted lowering accumulates the
    tap sum in f32 and rounds once, like lax.conv — outputs must agree to
    bf16 resolution, not drift by k*k-1 extra roundings."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(*in_shape), jnp.bfloat16)
    k = jnp.asarray(rng.randn(*k_shape), jnp.bfloat16)
    ref = _xla_conv(x, k, (1, 1), 'SAME')
    got = conv2d_shifted(x, k, (1, 1), 'SAME')
    assert got.dtype == jnp.bfloat16
    # one bf16 ulp (2^-8 relative) of slack for reduction-order ties
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2 ** -8, atol=1e-2)
