"""Conformance: fused conv3x3+BN+ReLU Pallas kernel vs the unfused
models/layers.py composition (interpret mode off-TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.models.layers import conv_single_apply
from lstm_ctc_ocr_tpu.ops.conv_bn_pallas import conv3x3_bn_relu


def _reference(params, x, dtype):
    return np.asarray(conv_single_apply(
        params, x, {'dtype': dtype}, 3, 3, params['kernel'].shape[-1], 1, 1,
        bn=True, biased=True, relu=True, padding='SAME')).astype(np.float32)


@pytest.mark.parametrize('shape,co', [
    ((16, 24, 4, 32), 48),    # conv4_1-like geometry, small channels
    ((8, 12, 2, 64), 64),     # conv4_2-after-pool H=2 geometry
    ((6, 10, 4, 16), 32),     # odd tile: n not a multiple of the limit
])
def test_fused_matches_unfused_f32(shape, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    params = {
        'kernel': jnp.asarray(rng.randn(3, 3, shape[-1], co)
                              .astype(np.float32) * 0.1),
        'biases': jnp.asarray(rng.randn(co).astype(np.float32) * 0.1),
        'bn_gamma': jnp.asarray(1.0 + 0.1 * rng.randn(co).astype(np.float32)),
        'bn_beta': jnp.asarray(0.1 * rng.randn(co).astype(np.float32)),
    }
    want = _reference(params, x, None)
    got = np.asarray(conv3x3_bn_relu(
        x, params['kernel'], params['biases'],
        params['bn_gamma'], params['bn_beta'])).astype(np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_matches_unfused_bf16():
    rng = np.random.RandomState(1)
    shape, co = (16, 24, 4, 32), 48
    x32 = rng.randn(*shape).astype(np.float32)
    params = {
        'kernel': jnp.asarray(rng.randn(3, 3, shape[-1], co)
                              .astype(np.float32) * 0.1),
        'biases': jnp.asarray(rng.randn(co).astype(np.float32) * 0.1),
        'bn_gamma': jnp.asarray(np.ones(co, np.float32)),
        'bn_beta': jnp.asarray(np.zeros(co, np.float32)),
    }
    want = _reference(params, jnp.asarray(x32), jnp.bfloat16)
    got = np.asarray(conv3x3_bn_relu(
        jnp.asarray(x32, jnp.bfloat16),
        params['kernel'], params['biases'],
        params['bn_gamma'], params['bn_beta'])).astype(np.float32)
    # bf16 activations: stats/normalize agree to bf16 resolution
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
