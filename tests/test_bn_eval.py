"""BN_EVAL: moving-statistics eval vs the reference's batch-stats quirk.

The reference runs tf.contrib.layers.batch_norm(is_training=True) in BOTH
train and test graphs (/root/reference/lib/networks/network.py:176-178), so
eval output depends on batch composition. cfg.BN_EVAL='batch' (default)
reproduces that; 'moving' normalizes with EMA statistics the train step
accumulates (engine/train.py) — these tests pin the EMA math, the
batch-composition invariance, the checkpoint round-trip including the
pre-BN_EVAL backward-compat path, and the calibration estimator.
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg


@pytest.fixture
def bn_cfg():
    old = copy.deepcopy(dict(cfg))
    cfg.TRAIN.DTYPE = 'float32'
    cfg.TRAIN.LEARNING_RATE = 0.001
    cfg.TRAIN.GAMMA = 1.0
    cfg.PARALLEL = 'off'
    yield
    cfg.clear()
    for k, v in old.items():
        cfg[k] = v


def _net_and_params(n, w, train=False):
    from lstm_ctc_ocr_tpu.models.factory import get_network
    net = get_network('LSTM_train' if train else 'LSTM_test')
    params = net.init_params(
        jax.random.PRNGKey(0), {'data': (n, w, 32), 'time_step_len': (n,)})
    return net, params


def _batch(n, w, seed=0):
    rng = np.random.RandomState(seed)
    image = rng.rand(n, w, 32).astype(np.float32)
    label = rng.randint(1, 20, size=(n, 6)).astype(np.int32)
    label_len = rng.randint(4, 7, size=(n,)).astype(np.int32)
    time_step = np.full((n,), w // 4 - 1, np.int32)
    return image, label, label_len, time_step


def test_init_bn_state_covers_every_bn_conv(bn_cfg):
    net, _ = _net_and_params(2, 64)
    state = net.init_bn_state()
    bn_specs = {s.name: s.kwargs['c_o'] for s in net.specs
                if s.kind == 'conv_single' and s.kwargs.get('bn')}
    assert bn_specs, 'CRNN has bn=True convs by construction'
    assert set(state) == set(bn_specs)
    for name, c in bn_specs.items():
        assert state[name]['mean'].shape == (c,)
        assert state[name]['var'].shape == (c,)
        np.testing.assert_array_equal(np.asarray(state[name]['mean']), 0.0)
        np.testing.assert_array_equal(np.asarray(state[name]['var']), 1.0)


def test_train_step_ema_matches_hand_computation(bn_cfg):
    """One train step must move bn_state to m*init + (1-m)*batch_stats where
    batch_stats are the forward pass's own batch mean/var."""
    from lstm_ctc_ocr_tpu.engine.train import (make_loss_fn, make_optimizer,
                                               make_train_step)
    n, w = 4, 64
    net, params = _net_and_params(n, w, train=True)
    tx = make_optimizer()
    opt_state = tx.init(params)
    bn0 = net.init_bn_state()
    image, label, label_len, time_step = _batch(n, w)

    # the same forward the step runs (same rng derivation), collected by hand
    base_key = jax.random.PRNGKey(int(cfg.RNG_SEED))
    rng = jax.random.fold_in(base_key, 0)
    coll = {}
    net.apply(params, {'data': jnp.asarray(image),
                       'time_step_len': jnp.asarray(time_step)},
              train=True, rng=rng, dtype=None, bn_collect=coll)
    m = float(cfg.BN_MOMENTUM)
    want = jax.tree.map(lambda old, new: m * np.asarray(old)
                        + (1 - m) * np.asarray(new), bn0, coll)

    step = make_train_step(net, tx, None)
    _, _, bn1, _, _ = step(params, opt_state, jax.tree.map(jnp.copy, bn0),
                           jnp.asarray(image), jnp.asarray(label),
                           jnp.asarray(label_len), jnp.asarray(time_step), 0)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(bn1)[0],
            jax.tree_util.tree_flatten_with_path(want)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=str(path))


def test_moving_eval_is_batch_composition_invariant(bn_cfg):
    """Under BN_EVAL='moving' the logits for an image must not depend on
    what else is in the batch; under 'batch' (reference parity) they do."""
    n, w = 4, 64
    net, params = _net_and_params(n, w)
    rng = np.random.RandomState(3)
    imgs = rng.rand(n, w, 32).astype(np.float32)
    ts = np.full((n,), w // 4 - 1, np.int32)
    other = rng.rand(n, w, 32).astype(np.float32)

    # realistic-ish moving stats (any fixed values work for invariance)
    bn_state = net.init_bn_state()
    bn_state = jax.tree.map(
        lambda x: x + 0.05 * rng.rand(*x.shape).astype(np.float32), bn_state)

    def logits(batch_imgs, batch_ts, bn_stats):
        out = net.apply(params, {'data': jnp.asarray(batch_imgs),
                                 'time_step_len': jnp.asarray(batch_ts)},
                        train=False, dtype=None, bn_stats=bn_stats)
        return np.asarray(out['logits'])   # [T, N, C]

    # moving: row 0 alone == row 0 among different companions
    solo = logits(imgs[:1], ts[:1], bn_state)
    mixed = logits(np.concatenate([imgs[:1], other[1:]]), ts, bn_state)
    np.testing.assert_allclose(solo[:, 0], mixed[:, 0], rtol=1e-6, atol=1e-6)

    # batch (reference quirk): same comparison must NOT be identical
    solo_b = logits(imgs[:1], ts[:1], None)
    mixed_b = logits(np.concatenate([imgs[:1], other[1:]]), ts, None)
    assert np.abs(solo_b[:, 0] - mixed_b[:, 0]).max() > 1e-4


def test_decode_step_uses_moving_stats_only_when_configured(bn_cfg):
    """make_decode_step honors cfg.BN_EVAL at trace time: 'moving' output
    changes with bn_state, 'batch' output ignores it."""
    from lstm_ctc_ocr_tpu.engine.train import make_decode_step
    n, w = 2, 64
    net, params = _net_and_params(n, w)
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(n, w, 32).astype(np.float32))
    ts = jnp.asarray(np.full((n,), w // 4 - 1, np.int32))
    bn_a = net.init_bn_state()
    bn_b = jax.tree.map(lambda x: x + 0.5, bn_a)

    cfg.BN_EVAL = 'batch'
    dec = make_decode_step(net, None)
    np.testing.assert_array_equal(np.asarray(dec(params, bn_a, img, ts)),
                                  np.asarray(dec(params, bn_b, img, ts)))

    cfg.BN_EVAL = 'moving'
    dec_m = make_decode_step(net, None)
    a = np.asarray(dec_m(params, bn_a, img, ts))
    b = np.asarray(dec_m(params, bn_b, img, ts))
    # wildly different stats must perturb the decode on random weights
    assert not np.array_equal(a, b)


def test_checkpoint_roundtrip_and_backward_compat(bn_cfg, tmp_path):
    """bn_state survives save/restore; pre-BN_EVAL snapshots (no bn_state
    keys) restore via allow_missing_prefixes keeping the fresh init."""
    from lstm_ctc_ocr_tpu.engine import checkpoint
    net, params = _net_and_params(2, 64)
    bn = jax.tree.map(lambda x: x + 0.25, net.init_bn_state())
    d = str(tmp_path)
    checkpoint.save({'params': params, 'bn_state': bn}, d, 7)
    found = checkpoint.latest_checkpoint(d)
    assert found is not None and found[1] == 7
    assert checkpoint.has_keys_under(found[0], 'bn_state')
    state = checkpoint.restore(
        {'params': params, 'bn_state': net.init_bn_state()}, found[0])
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(state['bn_state'])[0],
            jax.tree_util.tree_flatten_with_path(bn)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # old-era snapshot: params only
    d2 = str(tmp_path / 'old')
    checkpoint.save({'params': params}, d2, 3)
    path_old = checkpoint.latest_checkpoint(d2)[0]
    assert not checkpoint.has_keys_under(path_old, 'bn_state')
    with pytest.raises(KeyError):
        checkpoint.restore({'params': params,
                            'bn_state': net.init_bn_state()}, path_old)
    state = checkpoint.restore(
        {'params': params, 'bn_state': net.init_bn_state()}, path_old,
        allow_missing_prefixes=('bn_state',))
    leaves = jax.tree.leaves(state['bn_state'])
    assert all(np.all(np.isin(np.asarray(x), (0.0, 1.0))) for x in leaves)


def test_release_carries_f32_bn_state(bn_cfg, tmp_path):
    from lstm_ctc_ocr_tpu.engine import checkpoint
    net, params = _net_and_params(2, 64)
    bn = jax.tree.map(lambda x: x + 0.125, net.init_bn_state())
    out_dir = str(tmp_path / 'output' / 'exp')
    rel = checkpoint.save_release(params, out_dir, 5, bn_state=bn)
    assert checkpoint.has_keys_under(rel, 'bn_state')
    with np.load(rel) as data:
        for k in data.files:
            if k.startswith('bn_state/'):
                assert data[k].dtype == np.float32   # stats never f16
            elif data[k].dtype.kind == 'f':
                assert data[k].dtype == np.float16
    state = checkpoint.restore(
        {'params': params, 'bn_state': net.init_bn_state()}, rel)
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(state['bn_state'])[0],
            jax.tree_util.tree_flatten_with_path(bn)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_solver_snapshot_includes_bn_state_and_eval_uses_it(bn_cfg, tmp_path):
    """End-to-end: a short SolverWrapper run snapshots bn_state; the eval
    driver under BN_EVAL='moving' restores it and scores the val dir; a
    params-only snapshot makes the same eval fail loudly."""
    from PIL import Image as PILImage

    from lstm_ctc_ocr_tpu.config import AttrDict
    from lstm_ctc_ocr_tpu.data.gen import generate_img
    from lstm_ctc_ocr_tpu.engine import checkpoint
    from lstm_ctc_ocr_tpu.engine.test import SolverWrapper as EvalSolver
    from lstm_ctc_ocr_tpu.engine.train import SolverWrapper
    from lstm_ctc_ocr_tpu.models.factory import get_network

    cfg.TRAIN.BATCH_SIZE = 4
    cfg.VAL.BATCH_SIZE = 4
    cfg.VAL.VAL_STEP = 10**9
    cfg.TRAIN.SNAPSHOT_ITERS = 4
    cfg.TRAIN.DISPLAY = 10**9
    cfg.TRAIN.NUM_WORKERS = 0
    cfg.MIN_LEN = cfg.MAX_LEN = 4
    cfg.MAX_CHAR_LEN = 4
    out_dir = str(tmp_path / 'out')
    sw = SolverWrapper(get_network('LSTM_train'), AttrDict({'name': 'x'}),
                       None, out_dir, str(tmp_path / 'logs'))
    sw.train_model(5, restore=False)
    found = checkpoint.latest_checkpoint(out_dir)
    assert found is not None
    assert checkpoint.has_keys_under(found[0], 'bn_state')

    import random
    val_path = tmp_path / 'val'
    val_path.mkdir()
    rnd = random.Random(5)
    for i in range(6):
        img, label = generate_img(rnd)
        PILImage.fromarray(img).save(
            str(val_path / '{:08d}_{}.png'.format(i, label)))
    val_dir = str(val_path)
    cfg.BN_EVAL = 'moving'
    cfg.TEST.BATCH_SIZE = 3
    ev = EvalSolver(get_network('LSTM_test'), AttrDict({'name': 'x'}),
                    out_dir, None)
    acc, p50 = ev.test_model(testDir=val_dir, restore=True)
    assert 0.0 <= acc <= 1.0

    # params-only artifact + BN_EVAL=moving must fail loudly
    stale = str(tmp_path / 'stale')
    with np.load(found[0]) as data:
        flat = {k: data[k] for k in data.files if k.startswith('params/')}
    import os
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, checkpoint.snapshot_name(1)), 'wb') as f:
        np.savez(f, **flat)
    ev2 = EvalSolver(get_network('LSTM_test'), AttrDict({'name': 'x'}),
                     stale, None)
    with pytest.raises(RuntimeError, match='calibrate_bn'):
        ev2.test_model(testDir=val_dir, restore=True)
