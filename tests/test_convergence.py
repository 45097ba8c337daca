"""Integration: the full training stack (synth data -> bucketed batches ->
jitted train step -> CTC) actually learns. A shortened stand-in for the
reference's de-facto integration test of training to high accuracy
(SURVEY.md section 4); the full ">=95% sequence accuracy" run is the
long-form version of exactly this config (lstm/digit4.yml)."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg, cfg_from_file

pytestmark = pytest.mark.slow   # multi-minute: see pytest.ini


@pytest.fixture(autouse=True)
def _digit_cfg():
    snapshot = copy.deepcopy(dict(cfg))
    cfg_from_file('lstm/digit4.yml')
    cfg.TRAIN.DTYPE = 'float32'
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.LEARNING_RATE = 3e-4
    cfg.BUCKETS = [128]          # one bucket -> one XLA compile (CPU test)
    yield
    cfg.clear()
    for k, v in snapshot.items():
        cfg[k] = v


def test_digit4_loss_collapses():
    from lstm_ctc_ocr_tpu.data.pool import PoolSampler
    from lstm_ctc_ocr_tpu.engine.train import (compute_dtype, make_optimizer,
                                               make_train_step)
    from lstm_ctc_ocr_tpu.models.factory import get_network

    pool = PoolSampler(64, seed=1, verbose=False)   # tiny pool: memorizable
    stream = pool.batch_iterator(int(cfg.TRAIN.BATCH_SIZE),
                                 refresh_per_batch=0)

    net = get_network('LSTM_train')
    b0 = next(stream)
    n, w = b0.image.shape[:2]
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (n, w, 32), 'time_step_len': (n,)})
    tx = make_optimizer()
    opt_state = tx.init(params)
    bn_state = net.init_bn_state()
    step = make_train_step(net, tx, compute_dtype())

    first = None
    losses = []
    for i in range(60):
        b = next(stream)
        params, opt_state, bn_state, total, ctc = step(
            params, opt_state, bn_state,
            jnp.asarray(b.image), jnp.asarray(b.label),
            jnp.asarray(b.label_len), jnp.asarray(b.time_step), i)
        v = float(ctc)
        assert np.isfinite(v), f'non-finite loss at iter {i}'
        if first is None:
            first = v
        losses.append(v)

    tail = float(np.mean(losses[-10:]))
    assert first > 15.0, f'unexpectedly low initial loss {first}'
    assert tail < first * 0.5, \
        f'loss did not collapse: first {first:.2f}, tail mean {tail:.2f}'
