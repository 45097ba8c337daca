"""Model geometry: the CNN time-axis arithmetic (T = W/4 - 1), DSL behavior,
logits shape/orientation, regularization collection (SURVEY.md section 3.5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg
from lstm_ctc_ocr_tpu.models.factory import get_network


@pytest.mark.parametrize('w', [64, 96, 128])
def test_forward_shapes(w):
    net = get_network('LSTM_train')
    n = 2
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (n, w, 32), 'time_step_len': (n,)})
    # analytic shape inference matches the reference arithmetic
    assert net.output_shape('conv5') == (n, w // 4 - 1, 1, 512)
    assert net.output_shape('reshaped_layer') == (n, w // 4 - 1, 512)
    assert net.output_shape('logits') == (w // 4 - 1, n, cfg.NCLASSES)

    x = np.random.RandomState(0).rand(n, w, 32).astype(np.float32)
    lens = np.array([w // 4 - 1] * n, np.int32)
    out = net.apply(params, {'data': jnp.asarray(x),
                             'time_step_len': jnp.asarray(lens)})
    assert out['logits'].shape == (w // 4 - 1, n, cfg.NCLASSES)
    assert np.isfinite(np.asarray(out['logits'])).all()


def test_logits_masked_by_time_steps():
    """Past time_step_len the BiLSTM output is zero, so logits collapse to
    the projection bias — the model-level masking contract. (Note exact
    *content* invariance cannot hold: conv4's BN uses batch statistics in
    both graphs, a preserved reference quirk, network.py:176-178.)"""
    net = get_network('LSTM_train')
    n, w = 2, 96
    params = net.init_params(jax.random.PRNGKey(1),
                             {'data': (n, w, 32), 'time_step_len': (n,)})
    x = np.random.RandomState(1).rand(n, w, 32).astype(np.float32)
    lens = np.array([10, w // 4 - 1], np.int32)
    logits = np.asarray(net.apply(params, {'data': jnp.asarray(x),
                                           'time_step_len': jnp.asarray(lens)})['logits'])
    bias = np.asarray(params['logits']['biases'])
    np.testing.assert_allclose(logits[10:, 0],
                               np.broadcast_to(bias, logits[10:, 0].shape),
                               rtol=1e-6, atol=1e-6)
    # valid frames are NOT bias-only
    assert np.abs(logits[:10, 0] - bias).max() > 1e-3


def test_test_network_same_topology():
    tr = get_network('LSTM_train')
    te = get_network('LSTM_test')
    assert [s.kind for s in tr.specs] == [s.kind for s in te.specs]


def test_duplicate_pool2_quirk_preserved():
    net = get_network('LSTM_train')
    names = [s.name for s in net.specs]
    assert names.count('pool2') == 2  # LSTM_train.py:27,30


def test_regularization_paths():
    net = get_network('LSTM_train')
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (1, 64, 32), 'time_step_len': (1,)})
    reg_layers = {n for n, _, _ in net.reg_paths}
    # conv kernels + the bi_lstm projection, NOT biases/BN/LSTM cells
    assert 'conv1' in reg_layers and 'conv5' in reg_layers and 'logits' in reg_layers
    r = float(net.regularization_loss(params))
    assert r > 0
    # manual check: coeff/2 * sum of squares over the collected tensors
    import numpy as np
    expect = 0.0
    for ln, path, coeff in net.reg_paths:
        w = params[ln]
        for k in path:
            w = w[k]
        c = cfg.TRAIN.WEIGHT_DECAY if coeff is None else coeff
        expect += c * 0.5 * float(np.sum(np.square(np.asarray(w))))
    assert abs(r - expect) < 1e-6 * max(1.0, expect)


def test_bfloat16_compute_path():
    net = get_network('LSTM_train')
    n, w = 2, 64
    params = net.init_params(jax.random.PRNGKey(2),
                             {'data': (n, w, 32), 'time_step_len': (n,)})
    x = np.random.RandomState(2).rand(n, w, 32).astype(np.float32)
    lens = np.array([w // 4 - 1] * n, np.int32)
    out32 = np.asarray(net.apply(params, {'data': jnp.asarray(x),
                                          'time_step_len': jnp.asarray(lens)})['logits'])
    outbf = np.asarray(net.apply(params, {'data': jnp.asarray(x),
                                          'time_step_len': jnp.asarray(lens)},
                                 dtype=jnp.bfloat16)['logits'])
    assert outbf.dtype == np.float32      # logits accumulate in f32
    # bf16 path tracks f32 within typical mixed-precision tolerance
    assert np.max(np.abs(out32 - outbf)) / (np.max(np.abs(out32)) + 1e-6) < 0.15


def test_unknown_network_name():
    with pytest.raises(KeyError):
        get_network('resnet_train')
