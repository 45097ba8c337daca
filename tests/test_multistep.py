"""Multi-step dispatch (cfg.TRAIN.STEPS_PER_DISPATCH): the K-step lax.scan
chunk program must reproduce K consecutive 1-step dispatches exactly — same
fold_in key stream, same optax schedule counts, same BN-EMA — on a single
device, through the full SolverWrapper loop, and on the 8-device DP mesh.

The knob amortizes the per-dispatch host/tunnel round-trip (PERF.md
host-pipeline section); the reference has no analogue (its sess.run is
synchronous per iter, /root/reference/lib/lstm/train.py:121-138), so the
contract here is purely internal: K is a throughput knob that must never
change the training trajectory.
"""

import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg

pytestmark = pytest.mark.slow   # multi-minute: see pytest.ini


@pytest.fixture
def f32_cfg():
    old = copy.deepcopy(dict(cfg))
    cfg.TRAIN.DTYPE = 'float32'
    cfg.TRAIN.LEARNING_RATE = 0.001
    cfg.TRAIN.GAMMA = 1.0
    # Momentum (linear in grads) so scan-vs-unrolled fp reordering noise is
    # not amplified by Adam's sign-like early-step update (same rationale as
    # tests/test_parallel.py's fixture)
    cfg.TRAIN.SOLVER = 'Momentum'
    cfg.PARALLEL = 'off'
    yield
    cfg.clear()
    for k, v in old.items():
        cfg[k] = v


def _batches(k, n, w, rng):
    image = rng.rand(k, n, w, 32).astype(np.float32)
    label = rng.randint(1, 20, size=(k, n, 6)).astype(np.int32)
    label_len = rng.randint(4, 7, size=(k, n)).astype(np.int32)
    time_step = np.full((k, n), w // 4 - 1, np.int32)
    return image, label, label_len, time_step


def test_chunk_step_matches_k_single_steps(f32_cfg):
    """One K=5 chunk dispatch == five 1-step dispatches, to float tolerance,
    including the per-step loss array, optimizer state, and the BN EMA."""
    from lstm_ctc_ocr_tpu.engine.train import (make_optimizer,
                                               make_train_chunk_step,
                                               make_train_step)
    from lstm_ctc_ocr_tpu.models.factory import get_network

    k, n, w = 5, 4, 64
    net = get_network('LSTM_train')
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (n, w, 32), 'time_step_len': (n,)})
    tx = make_optimizer()
    rng = np.random.RandomState(0)
    image, label, label_len, time_step = _batches(k, n, w, rng)

    step = make_train_step(net, tx, None)
    p1, o1 = jax.tree.map(jnp.copy, params), tx.init(params)
    b1 = net.init_bn_state()
    singles = []
    it0 = 7                                     # arbitrary resume offset
    for j in range(k):
        p1, o1, b1, total, _ = step(
            p1, o1, b1, jnp.asarray(image[j]), jnp.asarray(label[j]),
            jnp.asarray(label_len[j]), jnp.asarray(time_step[j]), it0 + j)
        singles.append(float(total))

    # (a) strict per-step equivalence: a K=1 chunk IS one optimizer step —
    # only scan-body-vs-standalone fusion noise apart (same tolerance as the
    # DP-vs-single-device tests). This pins the shared sgd_step math and the
    # fold_in(base, it0) key exactly.
    chunk1 = make_train_chunk_step(net, tx, None, 1)
    pa, oa = jax.tree.map(jnp.copy, params), tx.init(params)
    pa, oa, ba, t1, _ = chunk1(
        pa, oa, net.init_bn_state(), jnp.asarray(image[:1]),
        jnp.asarray(label[:1]), jnp.asarray(label_len[:1]),
        jnp.asarray(time_step[:1]), it0)
    ps, os_ = jax.tree.map(jnp.copy, params), tx.init(params)
    ps, os_, bs, ts, _ = make_train_step(net, tx, None)(
        ps, os_, net.init_bn_state(), jnp.asarray(image[0]),
        jnp.asarray(label[0]), jnp.asarray(label_len[0]),
        jnp.asarray(time_step[0]), it0)
    np.testing.assert_allclose(float(t1[0]), float(ts), rtol=1e-6)
    for tree_a, tree_b in ((pa, ps), (oa, os_), (ba, bs)):
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    # (b) K-step trajectory: the ~1e-6 per-step fusion noise feeds back
    # through BN batch statistics and the momentum buffer, so the param gap
    # grows with K (measured: ~1.3e-4 max abs at K=5). A real contract bug —
    # wrong key index, skipped BN/optimizer update, shifted schedule count —
    # moves params by O(lr * grad) ~ 1e-3+ per bad step and the per-step loss
    # array by far more than 1e-4, so these bounds still separate signal
    # from float noise.
    chunk = make_train_chunk_step(net, tx, None, k)
    pk, ok = jax.tree.map(jnp.copy, params), tx.init(params)
    bk = net.init_bn_state()
    pk, ok, bk, totals, ctcs = chunk(
        pk, ok, bk, jnp.asarray(image), jnp.asarray(label),
        jnp.asarray(label_len), jnp.asarray(time_step), it0)

    assert totals.shape == (k,) and ctcs.shape == (k,)
    np.testing.assert_allclose(np.asarray(totals), np.asarray(singles),
                               rtol=1e-4)
    for tree_a, tree_b in ((p1, pk), (o1, ok), (b1, bk)):
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-4)


def test_chunk_step_compiles_once_per_bucket(f32_cfg):
    """The K-step program keeps the one-program-per-bucket invariant: the
    dispatch-group set adds at most ONE signature per bucket."""
    from lstm_ctc_ocr_tpu.engine.train import (make_optimizer,
                                               make_train_chunk_step)
    from lstm_ctc_ocr_tpu.models.factory import get_network

    k, n = 3, 4
    buckets = [int(b) for b in cfg.BUCKETS[:2]]
    net = get_network('LSTM_train')
    params = net.init_params(
        jax.random.PRNGKey(0),
        {'data': (n, buckets[0], 32), 'time_step_len': (n,)})
    tx = make_optimizer()
    opt_state = tx.init(params)
    bn_state = net.init_bn_state()
    chunk = make_train_chunk_step(net, tx, None, k)
    rng = np.random.RandomState(0)
    it = 0
    for _ in range(3):
        for w in buckets:
            batch = _batches(k, n, w, rng)
            params, opt_state, bn_state, totals, _ = chunk(
                params, opt_state, bn_state,
                *(jnp.asarray(a) for a in batch), it)
            it += k
    assert np.all(np.isfinite(np.asarray(totals)))
    assert chunk._cache_size() == len(buckets), chunk._cache_size()


def test_parallel_chunk_matches_single_device(f32_cfg):
    """The DP chunk step on the 8-device mesh reproduces the single-device
    chunk step (XLA inserts the grad psum / BN all-reduce per scan step)."""
    from lstm_ctc_ocr_tpu.engine.train import (make_optimizer,
                                               make_train_chunk_step)
    from lstm_ctc_ocr_tpu.models.factory import get_network
    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh

    k, n, w = 3, 16, 64
    net = get_network('LSTM_train')
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (n, w, 32), 'time_step_len': (n,)})
    tx = make_optimizer()
    rng = np.random.RandomState(0)
    batch = _batches(k, n, w, rng)

    chunk1 = make_train_chunk_step(net, tx, None, k)
    p1, o1 = jax.tree.map(jnp.copy, params), tx.init(params)
    p1, o1, b1, t1, _ = chunk1(p1, o1, net.init_bn_state(),
                               *(jnp.asarray(a) for a in batch), 0)

    m = pmesh.make_mesh(8)
    chunk8 = pmesh.make_parallel_train_chunk_step(net, tx, None, m, k)
    p8, o8 = jax.tree.map(jnp.copy, params), tx.init(params)
    b8 = jax.device_put(net.init_bn_state(), pmesh.replicated(m))
    sharded = pmesh.shard_chunk(m, *batch)
    assert all(len(s.sharding.device_set) == 8 for s in sharded)
    p8, o8, b8, t8, _ = chunk8(p8, o8, b8, *sharded, 0)

    np.testing.assert_allclose(np.asarray(t1), np.asarray(t8), rtol=1e-5)
    for tree_a, tree_b in ((p1, p8), (b1, b8)):
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


def _solver_run(tmp_path, tag, steps_per_dispatch, max_iters=9):
    from lstm_ctc_ocr_tpu.config import AttrDict
    from lstm_ctc_ocr_tpu.engine.train import SolverWrapper
    from lstm_ctc_ocr_tpu.models.factory import get_network

    cfg.TRAIN.STEPS_PER_DISPATCH = steps_per_dispatch
    out_dir = str(tmp_path / ('out_' + tag))
    log_dir = str(tmp_path / ('log_' + tag))
    os.makedirs(out_dir)
    os.makedirs(log_dir)
    net = get_network('LSTM_train')
    sw = SolverWrapper(net, AttrDict({'name': 'test'}), None, out_dir, log_dir)
    params, _ = sw.train_model(max_iters=max_iters, restore=False)
    return params, out_dir


def test_solver_multistep_matches_single_dispatch(f32_cfg, tmp_path, capsys):
    """End-to-end: the SolverWrapper loop at K=4 reproduces K=1 on the same
    deterministic synth stream — group clipping at snapshot/val boundaries,
    the width-change holdover, lagged group readback, and the snapshot
    cadence all included."""
    cfg.CHARSET = '0123456789'
    cfg.NCLASSES = 12
    cfg.MIN_LEN = 4
    cfg.MAX_LEN = 4
    cfg.MAX_CHAR_LEN = 4
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.NUM_WORKERS = 0
    cfg.TRAIN.DISPLAY = 2
    cfg.TRAIN.SNAPSHOT_ITERS = 4   # forces 1-step clipping before each x4
    cfg.VAL.BATCH_SIZE = 8
    cfg.VAL.VAL_STEP = 8
    cfg.DATA_BACKEND = 'synth'

    p_one, _ = _solver_run(tmp_path, 'k1', 1)
    out_one = capsys.readouterr().out
    p_four, out_dir = _solver_run(tmp_path, 'k4', 4)
    out_four = capsys.readouterr().out

    # 9 steps of per-step fusion noise amplified through BN/momentum (see
    # test_chunk_step_matches_k_single_steps (b) for the tolerance model)
    for a, b in zip(jax.tree.leaves(p_one), jax.tree.leaves(p_four)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)
    # cadence parity: the same display lines appear in both runs (loss
    # values may differ in the last float digits; compare the iter headers)
    def iters_displayed(s):
        return [ln.split(',')[0] for ln in s.splitlines()
                if ln.startswith('iter: ')]
    assert iters_displayed(out_four) == iters_displayed(out_one) != []
    # snapshot cadence fired at 4 and 8 from the chunked loop
    snaps = sorted(f for f in os.listdir(out_dir) if f.endswith('.ckpt.npz'))
    assert any('iter_4' in f for f in snaps), snaps
    assert any('iter_8' in f for f in snaps), snaps
