"""Long-line config (BASELINE config #4): 20-24 char labels through the
renderer, bucketer, both CTC implementations, and one train step."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg, cfg_from_file


@pytest.fixture(autouse=True)
def _longline_cfg():
    snapshot = copy.deepcopy(dict(cfg))
    cfg_from_file('lstm/longline.yml')
    cfg.TRAIN.DTYPE = 'float32'
    cfg.TRAIN.BATCH_SIZE = 4
    yield
    cfg.clear()
    for k, v in snapshot.items():
        cfg[k] = v


def _longline_batch(n=4, seed=11):
    import random
    from lstm_ctc_ocr_tpu.data import gen
    rng = random.Random(seed)
    imgs, labels = [], []
    for _ in range(n):
        im, lab = gen.generate_img(rng)
        imgs.append(im)
        labels.append(lab)
    return gen.bucket_batch(imgs, labels), labels


def test_longline_render_and_bucket():
    b, labels = _longline_batch()
    assert all(20 <= len(s) <= 24 for s in labels)
    assert b.image.shape[1] in cfg.BUCKETS          # wide buckets engaged
    assert b.image.shape[1] >= 256
    assert (b.label_len >= 20).all()
    assert b.label.shape[1] == 24
    # every frame count exceeds the CTC minimum 2L+1 needs T >= L (loose check)
    assert (b.time_step > b.label_len).all()


def test_longline_ctc_pallas_matches_scan():
    from lstm_ctc_ocr_tpu.ops.ctc import ctc_loss
    from lstm_ctc_ocr_tpu.ops.ctc_pallas import ctc_loss_pallas
    b, _ = _longline_batch()
    t = int(b.time_step.max())
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, t, cfg.NCLASSES).astype(np.float32))
    args = (jnp.asarray(b.label), jnp.asarray(b.label_len),
            jnp.asarray(b.time_step))
    lp = np.asarray(ctc_loss_pallas(logits, *args))
    ls = np.asarray(ctc_loss(logits, *args))
    assert np.isfinite(lp).all()
    np.testing.assert_allclose(lp, ls, rtol=1e-5, atol=1e-5)


def test_longline_train_step_runs():
    from lstm_ctc_ocr_tpu.engine.train import (compute_dtype, make_optimizer,
                                               make_train_step)
    from lstm_ctc_ocr_tpu.models.factory import get_network
    b, _ = _longline_batch()
    n, w = b.image.shape[:2]
    net = get_network('LSTM_train')
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (n, w, 32), 'time_step_len': (n,)})
    tx = make_optimizer()
    opt_state = tx.init(params)
    step = make_train_step(net, tx, compute_dtype())
    params, opt_state, _, total, ctc = step(
        params, opt_state, net.init_bn_state(),
        jnp.asarray(b.image), jnp.asarray(b.label),
        jnp.asarray(b.label_len), jnp.asarray(b.time_step), 0)
    assert np.isfinite(float(total))
    assert float(ctc) > 0.0
