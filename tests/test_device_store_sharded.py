"""Sharded device store (data/device_store.py:ShardedDeviceStore): the
multi-host residence layout — per-device dataset partitions in HBM, block
arrays [D, R, ...] sharded over the mesh, per-device index gather. The
block gather must reproduce host-batch math exactly for the same rows, and
the layout must cover every dataset row per epoch."""

import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg


@pytest.fixture(autouse=True)
def _cfg_snapshot():
    snapshot = copy.deepcopy(dict(cfg))
    yield
    cfg.clear()
    for k, v in snapshot.items():
        cfg[k] = v


def _fake_blocks(n_dev, rows, width=80, seed=0):
    rng = np.random.RandomState(seed)
    chars = list('abc049')
    images, labels = [], []
    for d in range(n_dev):
        images.append([rng.randint(0, 256, (int(cfg.IMG_HEIGHT), width),
                                   np.uint8) for _ in range(rows)])
        labels.append([''.join(rng.choice(chars, 4)) for _ in range(rows)])
    return images, labels


def test_sharded_blocks_match_bucket_batch():
    """Each device's block holds exactly the rows bucket_batch would build
    for that device's partition (store-wide bucket)."""
    from lstm_ctc_ocr_tpu.data import gen
    from lstm_ctc_ocr_tpu.data.device_store import ShardedDeviceStore
    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(4)
    images, labels = _fake_blocks(4, 5)
    store = ShardedDeviceStore(images, labels, 'uniform', seed=0, mesh=mesh,
                               verbose=False)
    img = np.asarray(store.img)
    lab = np.asarray(store.lab)
    for d in range(4):
        ref = gen.bucket_batch(images[d], labels[d],
                               buckets=[store.w_bucket])
        np.testing.assert_array_equal(img[d], ref.image)
        np.testing.assert_array_equal(lab[d], ref.label)


def test_sharded_epoch_covers_every_row_once():
    """'epoch' mode: one global epoch = every (device, row) pair exactly
    once (partitions are disjoint, per-device shuffled walks)."""
    from lstm_ctc_ocr_tpu.data.device_store import ShardedDeviceStore
    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(4)
    images, labels = _fake_blocks(4, 8)
    store = ShardedDeviceStore(images, labels, 'epoch', seed=3, mesh=mesh,
                               verbose=False)
    seen = [[] for _ in range(4)]
    for _ in range(4):                       # 4 batches x (4 dev x 2) = 32
        idx = store.next_indices(8, 1)[0]    # [4, 2]
        for d in range(4):
            seen[d].extend(idx[d].tolist())
    for d in range(4):
        assert sorted(seen[d]) == list(range(8)), seen[d]


@pytest.mark.slow
def test_sharded_gather_matches_host_batches():
    """N sharded-gather steps == N host-batch DP steps on the SAME mesh fed
    the batches the gather assembles (device-major concat of each device's
    picked rows): identical losses, identical final params — the sharded
    layout cannot change the math."""
    from lstm_ctc_ocr_tpu.data import gen
    from lstm_ctc_ocr_tpu.data.device_store import ShardedDeviceStore
    from lstm_ctc_ocr_tpu.engine.train import make_optimizer
    from lstm_ctc_ocr_tpu.models.factory import get_network
    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh

    cfg.TRAIN.DTYPE = 'float32'
    n_dev, rows, batch, steps = 8, 6, 8, 3
    mesh = pmesh.make_mesh(n_dev)
    images, labels = _fake_blocks(n_dev, rows)
    store = ShardedDeviceStore(images, labels, 'uniform', seed=1, mesh=mesh,
                               verbose=False)

    net = get_network('LSTM_train')
    tx = make_optimizer()

    def init():
        params = net.init_params(jax.random.PRNGKey(0),
                                 {'data': (batch, store.w_bucket, 32),
                                  'time_step_len': (batch,)})
        state = (params, tx.init(params), net.init_bn_state())
        repl = pmesh.replicated(mesh)
        return tuple(jax.device_put(t, repl) for t in state)

    # pre-draw the index plan so both paths consume identical rows
    plan = [store.next_indices(batch, 1)[0] for _ in range(steps)]

    # sharded gather path
    params, opt_state, bn_state = init()
    gstep = pmesh.make_parallel_train_step_gather_sharded(net, tx, None,
                                                          mesh)
    from jax.sharding import PartitionSpec as P
    g_losses = []
    for i, idx in enumerate(plan):
        params, opt_state, bn_state, total, _ = gstep(
            params, opt_state, bn_state, *store.arrays,
            store._put(idx, P('data')), i)
        g_losses.append(float(total))
    g_params = jax.device_get(params)

    # host-batch path: assemble the same global batches on the host
    params, opt_state, bn_state = init()
    hstep = pmesh.make_parallel_train_step(net, tx, None, mesh)
    h_losses = []
    for i, idx in enumerate(plan):
        ims = [images[d][r] for d in range(n_dev) for r in idx[d]]
        labs = [labels[d][r] for d in range(n_dev) for r in idx[d]]
        b = gen.bucket_batch(ims, labs, buckets=[store.w_bucket])
        sharded = pmesh.shard_batch(mesh, b.image, b.label, b.label_len,
                                    b.time_step)
        params, opt_state, bn_state, total, _ = hstep(
            params, opt_state, bn_state, *sharded, i)
        h_losses.append(float(total))
    h_params = jax.device_get(params)

    np.testing.assert_allclose(g_losses, h_losses, rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(h_params), jax.tree.leaves(g_params)):
        np.testing.assert_allclose(b_, a, rtol=2e-5, atol=2e-6)


def test_sharded_refresh_flush_updates_blocks():
    """Per-device staged refresh: the vmapped donated scatter lands each
    device's fresh rows in its own partition only."""
    from lstm_ctc_ocr_tpu.data.device_store import ShardedDeviceStore
    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(4)
    images, labels = _fake_blocks(4, 4)
    store = ShardedDeviceStore(images, labels, 'uniform', seed=0, mesh=mesh,
                               flush_every=1, verbose=False)
    rng = np.random.RandomState(42)
    fresh = [rng.randint(0, 256, (int(cfg.IMG_HEIGHT), 60), np.uint8)
             for _ in range(4)]
    before = np.asarray(store.img)
    for d in range(4):
        store.stage_refresh(d, 2, fresh[d], 'zz')
    after = np.asarray(store.img)
    for d in range(4):
        np.testing.assert_array_equal(
            after[d, 2, :60], fresh[d].swapaxes(0, 1).reshape(60, -1))
        # untouched rows identical
        np.testing.assert_array_equal(after[d, 0], before[d, 0])
    assert int(np.asarray(store.lab_len)[1, 2]) == 2


@pytest.mark.slow
def test_solver_runs_sharded_layout(tmp_path, monkeypatch):
    """SolverWrapper end to end with DATA_DEVICE_LAYOUT='sharded' over the
    8-device mesh: per-device pool partitions, block-gather chunk steps,
    per-device refresh flushes — the forced-sharded production loop."""
    monkeypatch.chdir(tmp_path)
    from lstm_ctc_ocr_tpu.engine.train import SolverWrapper

    cfg.TRAIN.DTYPE = 'float32'
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.SNAPSHOT_ITERS = 4
    cfg.TRAIN.DISPLAY = 2
    cfg.TRAIN.STEPS_PER_DISPATCH = 2
    cfg.VAL.VAL_STEP = 1000
    cfg.VAL.BATCH_SIZE = 8
    cfg.DATA_BACKEND = 'pool'
    cfg.DATA_DEVICE = 'on'
    cfg.DATA_DEVICE_LAYOUT = 'sharded'
    cfg.PARALLEL = 'auto'
    cfg.POOL_SIZE = 32                       # 4 rows per device
    cfg.POOL_REFRESH = 1
    cfg.MIN_LEN = cfg.MAX_LEN = 4
    cfg.CHARSET = '0123456789'

    from lstm_ctc_ocr_tpu.models.factory import get_network
    net = get_network('LSTM_train')
    out = str(tmp_path / 'out')
    os.makedirs(out, exist_ok=True)
    sw = SolverWrapper(net, None, None, out, str(tmp_path / 'logs'))
    params, _ = sw.train_model(max_iters=9)
    assert any(f.endswith('.ckpt.npz') for f in os.listdir(out))
