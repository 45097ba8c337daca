"""Engine: checkpoint save/restore-latest contract, TB event writer format,
optimizer/schedule semantics, and a short CPU training smoke run."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_checkpoint_roundtrip_and_latest(tmp_path):
    from lstm_ctc_ocr_tpu.engine import checkpoint
    state = {'params': {'a': jnp.arange(6.0).reshape(2, 3),
                        'b': {'c': jnp.ones((4,))}},
             'opt_state': {'mu': jnp.zeros((2, 3))}}
    d = str(tmp_path)
    checkpoint.save(state, d, 10)
    state2 = jax.tree.map(lambda x: x * 2, state)
    checkpoint.save(state2, d, 20)
    # restore_latest picks the highest parsed step (train.py:98-103 contract)
    restored, step = checkpoint.restore_latest(state, d)
    assert step == 20
    np.testing.assert_array_equal(np.asarray(restored['params']['a']),
                                  np.asarray(state2['params']['a']))
    # partial template restore (eval path: params only)
    p = checkpoint.restore({'params': state['params']},
                           checkpoint.latest_checkpoint(d)[0])
    np.testing.assert_array_equal(np.asarray(p['params']['b']['c']),
                                  np.asarray(state2['params']['b']['c']))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    from lstm_ctc_ocr_tpu.engine import checkpoint
    d = str(tmp_path)
    checkpoint.save({'w': jnp.zeros((2, 2))}, d, 1)
    with pytest.raises(ValueError):
        checkpoint.restore({'w': jnp.zeros((3, 3))},
                           checkpoint.latest_checkpoint(d)[0])


def test_summary_writer_tf_readable(tmp_path):
    """Events written by our pure-python writer parse with TF's reader."""
    from lstm_ctc_ocr_tpu.engine.summary import SummaryWriter
    import tensorflow as tf
    d = str(tmp_path)
    w = SummaryWriter(d)
    w.add_scalar('loss', 1.5, 3)
    w.add_scalar('loss', 0.5, 7)
    w.close()
    events = []
    for raw in tf.data.TFRecordDataset(w.path):
        ev = tf.compat.v1.Event()
        ev.ParseFromString(raw.numpy())
        events.append(ev)
    assert events[0].file_version == 'brain.Event:2'
    scalars = [(e.step, e.summary.value[0].tag, e.summary.value[0].simple_value)
               for e in events[1:]]
    assert scalars == [(3, 'loss', 1.5), (7, 'loss', 0.5)]


def test_lr_schedule_step_decay():
    import copy
    from lstm_ctc_ocr_tpu.config import cfg
    from lstm_ctc_ocr_tpu.engine.train import lr_schedule
    old = copy.deepcopy(dict(cfg.TRAIN))
    try:
        cfg.TRAIN.LEARNING_RATE = 0.01
        cfg.TRAIN.GAMMA = 0.1
        cfg.TRAIN.STEPSIZE = 100
        assert float(lr_schedule(0)) == pytest.approx(0.01)
        assert float(lr_schedule(99)) == pytest.approx(0.01)
        assert float(lr_schedule(100)) == pytest.approx(0.001)
        assert float(lr_schedule(250)) == pytest.approx(0.0001)
    finally:
        cfg.TRAIN.clear()
        for k, v in old.items():
            cfg.TRAIN[k] = v


def test_train_step_reduces_loss():
    """A few steps on one repeated small batch must reduce the CTC loss."""
    import copy
    from lstm_ctc_ocr_tpu.config import cfg
    old = copy.deepcopy(dict(cfg))
    try:
        cfg.TRAIN.LEARNING_RATE = 0.001
        cfg.TRAIN.GAMMA = 1.0
        cfg.TRAIN.DTYPE = 'float32'
        from lstm_ctc_ocr_tpu.engine.train import (make_optimizer,
                                                   make_train_step)
        from lstm_ctc_ocr_tpu.models.factory import get_network
        net = get_network('LSTM_train')
        n, w = 4, 64
        params = net.init_params(jax.random.PRNGKey(0),
                                 {'data': (n, w, 32), 'time_step_len': (n,)})
        tx = make_optimizer()
        opt_state = tx.init(params)
        step = make_train_step(net, tx, None)
        bn_state = net.init_bn_state()
        rng = np.random.RandomState(0)
        image = jnp.asarray(rng.rand(n, w, 32).astype(np.float32))
        label = jnp.asarray(rng.randint(1, 11, size=(n, 6)).astype(np.int32))
        label_len = jnp.asarray(np.full((n,), 4, np.int32))
        time_step = jnp.asarray(np.full((n,), w // 4 - 1, np.int32))
        losses = []
        for i in range(8):
            params, opt_state, bn_state, total, ctc = step(
                params, opt_state, bn_state, image,
                label, label_len, time_step, i)
            losses.append(float(ctc))
        assert losses[-1] < losses[0] * 0.9, losses
        assert np.isfinite(losses).all()
    finally:
        cfg.clear()
        for k, v in old.items():
            cfg[k] = v


def test_uint8_transfer_bit_identical():
    """The uint8 wire format (cfg.TRANSFER_DTYPE='uint8', default) must be
    BIT-identical to the f32 one: the device runs the exact same f32
    x/255 division the host ran before (network.py:apply), so loss and
    gradients match exactly, not just to tolerance."""
    import copy
    from lstm_ctc_ocr_tpu.config import cfg
    old = copy.deepcopy(dict(cfg))
    try:
        cfg.TRAIN.DTYPE = 'float32'
        from lstm_ctc_ocr_tpu.data import gen
        from lstm_ctc_ocr_tpu.engine.train import make_loss_fn
        from lstm_ctc_ocr_tpu.models.factory import get_network
        rng = np.random.RandomState(1)
        imgs = [rng.randint(0, 256, (32, w), np.uint8) for w in (70, 88)]
        labels = ['ab', 'c0z']
        cfg.TRANSFER_DTYPE = 'uint8'
        b_u8 = gen.bucket_batch(imgs, labels, buckets=[96])
        cfg.TRANSFER_DTYPE = 'float32'
        b_f32 = gen.bucket_batch(imgs, labels, buckets=[96])
        assert b_u8.image.dtype == np.uint8
        assert b_f32.image.dtype == np.float32

        net = get_network('LSTM_train')
        n = 2
        params = net.init_params(jax.random.PRNGKey(0),
                                 {'data': (n, 96, 32), 'time_step_len': (n,)})
        loss_fn = make_loss_fn(net, None)
        key = jax.random.PRNGKey(3)

        def val_and_grad(image):
            (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, jnp.asarray(image), jnp.asarray(b_u8.label),
                jnp.asarray(b_u8.label_len), jnp.asarray(b_u8.time_step), key)
            return float(total), grads

        t_u8, g_u8 = val_and_grad(b_u8.image)
        t_f32, g_f32 = val_and_grad(b_f32.image)
        assert t_u8 == t_f32
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), g_u8, g_f32)
    finally:
        cfg.clear()
        for k, v in old.items():
            cfg[k] = v


def test_npy_pretrained_roundtrip(tmp_path):
    """convert_ckpt2npy output loads back via the pre_train .npy path
    (reference Network.load format, network.py:50-63)."""
    import sys
    sys.path.insert(0, 'tools')
    from lstm_ctc_ocr_tpu.engine import checkpoint
    from convert_ckpt2npy import convert

    params = {'conv1': {'kernel': jnp.arange(8.0).reshape(2, 2, 1, 2),
                        'biases': jnp.zeros((2,))},
              'fc': {'weights': jnp.ones((4, 3))}}
    d = str(tmp_path)
    ckpt = checkpoint.save({'params': params}, d, 5)
    npy = str(tmp_path / 'w.npy')
    convert(ckpt, npy)

    fresh = jax.tree.map(lambda x: np.zeros_like(x), params)
    loaded = checkpoint.load_npy_pretrained(fresh, npy)
    np.testing.assert_array_equal(np.asarray(loaded['conv1']['kernel']),
                                  np.asarray(params['conv1']['kernel']))
    np.testing.assert_array_equal(np.asarray(loaded['fc']['weights']),
                                  np.asarray(params['fc']['weights']))

    # unknown layer raises unless ignore_missing
    import pytest as _pytest
    bad = {'conv9': {'kernel': np.zeros((1,))}}
    np.save(str(tmp_path / 'bad.npy'), bad, allow_pickle=True)
    with _pytest.raises(KeyError):
        checkpoint.load_npy_pretrained(fresh, str(tmp_path / 'bad.npy'))
    checkpoint.load_npy_pretrained(fresh, str(tmp_path / 'bad.npy'),
                                   ignore_missing=True)


def test_npy_pretrained_list_nodes_roundtrip(tmp_path):
    """Converter digit keys ('cells/0/...') must land back in list-valued
    pytree nodes (the stacked `lstm` DSL layer stores cells as a list)."""
    import numpy as np
    from lstm_ctc_ocr_tpu.engine import checkpoint

    params = {'logits': {'cells': [{'kernel': np.ones((4, 8), np.float32)},
                                   {'kernel': np.full((8, 8), 2.0,
                                                      np.float32)}],
                         'weights': np.zeros((2, 3), np.float32)}}
    ck = str(tmp_path / 'm_iter_5.ckpt.npz')
    checkpoint.save({'params': params}, str(tmp_path), step=5)

    import importlib
    import sys
    sys.path.insert(0, 'tools')
    conv = importlib.import_module('convert_ckpt2npy')
    out = str(tmp_path / 'm.npy')
    found = checkpoint.latest_checkpoint(str(tmp_path))
    conv.convert(found[0], out)

    fresh = {'logits': {'cells': [{'kernel': np.zeros((4, 8), np.float32)},
                                  {'kernel': np.zeros((8, 8), np.float32)}],
                        'weights': np.ones((2, 3), np.float32)}}
    loaded = checkpoint.load_npy_pretrained(fresh, out)
    np.testing.assert_array_equal(loaded['logits']['cells'][1]['kernel'],
                                  params['logits']['cells'][1]['kernel'])
    np.testing.assert_array_equal(loaded['logits']['weights'],
                                  params['logits']['weights'])


def test_release_checkpoint_fallback(tmp_path, monkeypatch):
    """save_release writes a tracked params-only f16 checkpoint under
    checkpoints/<EXP_DIR>/; eval restore falls back to it when output/ is
    empty, and float leaves come back in the template dtype."""
    from lstm_ctc_ocr_tpu.engine import checkpoint
    root = tmp_path
    out_dir = str(root / 'output' / 'exp')
    params = {'w': jnp.arange(6.0).reshape(2, 3) / 7.0,
              'step': jnp.asarray(3, jnp.int32)}
    rel = checkpoint.save_release(params, out_dir, 42)
    assert rel == os.path.join(str(root), 'checkpoints', 'exp',
                               checkpoint.snapshot_name(42))
    with np.load(rel) as data:
        assert data['params/w'].dtype == np.float16      # f16 on disk
        assert data['params/step'].dtype == np.int32     # non-float untouched
    # output/ empty -> eval restore finds the release
    found = checkpoint.latest_eval_checkpoint(out_dir)
    assert found is not None and found[1] == 42
    restored = checkpoint.restore({'params': params}, found[0])['params']
    assert np.asarray(restored['w']).dtype == np.float32  # template dtype wins
    np.testing.assert_allclose(np.asarray(restored['w']),
                               np.asarray(params['w']), rtol=1e-3)
    # a real training snapshot takes precedence over the release
    checkpoint.save({'params': params}, out_dir, 7)
    found2 = checkpoint.latest_eval_checkpoint(out_dir)
    assert found2[1] == 7 and 'checkpoints' not in found2[0]


def test_release_keeps_out_of_range_leaves_f32(tmp_path):
    from lstm_ctc_ocr_tpu.engine import checkpoint
    out_dir = str(tmp_path / 'output' / 'exp')
    params = {'big': jnp.asarray([1e5, 2e5], jnp.float32)}  # overflows f16
    rel = checkpoint.save_release(params, out_dir, 1)
    with np.load(rel) as data:
        assert data['params/big'].dtype == np.float32


def test_checkpoint_prune_keeps_cadence_snapshots(tmp_path):
    """max_to_keep pruning must not evict on-cadence (SNAPSHOT_ITERS grid)
    snapshots: near convergence the low-loss trigger writes a snapshot
    every few steps, and without the keep_every exemption that spam
    silently deletes the periodic history (the checkpoints a resume or a
    release would want)."""
    from lstm_ctc_ocr_tpu.engine import checkpoint
    state = {'params': {'a': jnp.zeros((2,))}}
    d = str(tmp_path)
    # cadence snapshots at 1000/2000, then low-loss spam at 2001..2006
    for step in (1000, 2000, 2001, 2002, 2003, 2004, 2005, 2006):
        checkpoint.save(state, d, step, max_to_keep=4, keep_every=1000)
    steps = sorted(s for _, s in checkpoint.list_checkpoints(d))
    # cadence files survive; only the newest (4 - #cadence) spam files stay
    assert 1000 in steps and 2000 in steps, steps
    assert steps == [1000, 2000, 2005, 2006], steps
    # keep_every=0 reproduces the plain newest-N policy
    d2 = str(tmp_path / 'plain')
    for step in (1000, 2000, 2001, 2002):
        checkpoint.save(state, d2, step, max_to_keep=2)
    steps2 = sorted(s for _, s in checkpoint.list_checkpoints(d2))
    assert steps2 == [2001, 2002], steps2
