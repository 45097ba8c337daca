"""Data parallelism on a virtual 8-device CPU mesh: the sharded train step
must reproduce the single-device step bit-for-bit (same program, different
partitioning; XLA inserts the grad psum / BN all-reduce)."""

import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg


@pytest.fixture
def f32_cfg():
    old = copy.deepcopy(dict(cfg))
    cfg.TRAIN.DTYPE = 'float32'
    cfg.TRAIN.LEARNING_RATE = 0.001
    cfg.TRAIN.GAMMA = 1.0
    # Momentum (linear in grads) so cross-shard fp reduction order is not
    # amplified by Adam's sign-like first-step update
    cfg.TRAIN.SOLVER = 'Momentum'
    yield
    cfg.clear()
    for k, v in old.items():
        cfg[k] = v


def _batch(n, w, rng):
    image = rng.rand(n, w, 32).astype(np.float32)
    label = rng.randint(1, 20, size=(n, 6)).astype(np.int32)
    label_len = rng.randint(4, 7, size=(n,)).astype(np.int32)
    time_step = np.full((n,), w // 4 - 1, np.int32)
    return image, label, label_len, time_step


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8


def test_parallel_step_matches_single_device(f32_cfg):
    from lstm_ctc_ocr_tpu.engine.train import make_optimizer, make_train_step
    from lstm_ctc_ocr_tpu.models.factory import get_network
    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh

    net = get_network('LSTM_train')
    n, w = 16, 64
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (n, w, 32), 'time_step_len': (n,)})
    tx = make_optimizer()
    rng = np.random.RandomState(0)
    image, label, label_len, time_step = _batch(n, w, rng)
    # single device
    step1 = make_train_step(net, tx, None)
    p1, o1 = jax.tree.map(jnp.copy, params), tx.init(params)
    b1 = net.init_bn_state()
    for it in range(2):
        p1, o1, b1, total1, ctc1 = step1(p1, o1, b1, jnp.asarray(image),
                                     jnp.asarray(label), jnp.asarray(label_len),
                                     jnp.asarray(time_step), it)

    # 8-device DP
    m = pmesh.make_mesh(8)
    step8 = pmesh.make_parallel_train_step(net, tx, None, m)
    p8, o8 = jax.tree.map(jnp.copy, params), tx.init(params)
    b8 = jax.device_put(net.init_bn_state(), pmesh.replicated(m))
    sharded = pmesh.shard_batch(m, image, label, label_len, time_step)
    for it in range(2):
        p8, o8, b8, total8, ctc8 = step8(p8, o8, b8, *sharded, it)

    np.testing.assert_allclose(float(ctc1), float(ctc8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # the moving BN statistics must also agree: the sharded batch mean/var
    # are all-reduced across devices, so the EMA tracks the GLOBAL batch
    for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_parallel_decode(f32_cfg):
    from lstm_ctc_ocr_tpu.models.factory import get_network
    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh
    net = get_network('LSTM_test')
    n, w = 8, 64
    params = net.init_params(jax.random.PRNGKey(1),
                             {'data': (n, w, 32), 'time_step_len': (n,)})
    m = pmesh.make_mesh(8)
    dec = pmesh.make_parallel_decode_step(net, None, m)
    rng = np.random.RandomState(1)
    image, _, _, time_step = _batch(n, w, rng)
    sh_img, sh_ts = pmesh.shard_batch(m, image, time_step)
    out = np.asarray(dec(params, net.init_bn_state(), sh_img, sh_ts))
    assert out.shape == (n, w // 4 - 1)


def _solver_run(tmp_path, tag, parallel):
    """Drive the REAL training product (SolverWrapper.train_model) for a few
    iters on the deterministic synth stream and return the final params."""
    from lstm_ctc_ocr_tpu.config import AttrDict, cfg
    from lstm_ctc_ocr_tpu.engine.train import SolverWrapper
    from lstm_ctc_ocr_tpu.models.factory import get_network

    cfg.PARALLEL = parallel
    out_dir = str(tmp_path / ('out_' + tag))
    log_dir = str(tmp_path / ('log_' + tag))
    os.makedirs(out_dir)
    os.makedirs(log_dir)
    net = get_network('LSTM_train')
    sw = SolverWrapper(net, AttrDict({'name': 'test'}), None, out_dir, log_dir)
    params, opt_state = sw.train_model(max_iters=5, restore=False)
    return params, out_dir


def test_solver_train_model_dp_matches_single_device(f32_cfg, tmp_path):
    """End-to-end: ./train.sh's solver loop on the 8-device mesh reproduces
    the single-device solver — sharded batches, donated buffers across bucket
    recompiles, val decode, and snapshots all included."""
    from lstm_ctc_ocr_tpu.config import cfg
    cfg.CHARSET = '0123456789'
    cfg.NCLASSES = 12
    cfg.MIN_LEN = 4
    cfg.MAX_LEN = 4
    cfg.MAX_CHAR_LEN = 4
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.NUM_WORKERS = 0
    cfg.TRAIN.DISPLAY = 2
    cfg.TRAIN.SNAPSHOT_ITERS = 4       # exercise the snapshot path
    cfg.VAL.BATCH_SIZE = 8
    cfg.VAL.VAL_STEP = 2               # exercise the sharded val decode
    cfg.DATA_BACKEND = 'synth'

    p_single, _ = _solver_run(tmp_path, 'single', 'off')
    p_dp, out_dp = _solver_run(tmp_path, 'dp', 'auto')

    # the DP run must actually have sharded over the mesh
    leaf = jax.tree.leaves(p_dp)[0]
    assert len(leaf.sharding.device_set) == 8, leaf.sharding
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # snapshot cadence fired from the DP loop
    assert any(f.endswith('.ckpt.npz') for f in os.listdir(out_dp))


def test_init_distributed_single_process_noop(monkeypatch):
    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    assert pmesh.init_distributed() == 1


def test_shard_host_batch_single_process(f32_cfg):
    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh
    m = pmesh.make_mesh(8)
    rng = np.random.RandomState(1)
    image, label, label_len, time_step = _batch(16, 64, rng)
    g_img, g_lab = pmesh.shard_host_batch(m, image, label)
    assert g_img.shape == image.shape
    np.testing.assert_array_equal(np.asarray(g_img), image)
    assert g_lab.sharding.spec == jax.sharding.PartitionSpec('data')


def test_eval_driver_dp_matches_single_device(f32_cfg, tmp_path):
    """End-to-end: ./test.sh's batched eval on the 8-device mesh restores a
    checkpoint and reproduces the single-device accuracy on a small labeled
    directory (engine/test.py mesh path)."""
    from PIL import Image as PILImage

    from lstm_ctc_ocr_tpu.config import AttrDict, cfg
    from lstm_ctc_ocr_tpu.data.gen import generate_img
    from lstm_ctc_ocr_tpu.engine import checkpoint
    from lstm_ctc_ocr_tpu.engine.test import SolverWrapper as EvalSolver
    from lstm_ctc_ocr_tpu.models.factory import get_network

    cfg.TEST.BATCH_SIZE = 8
    cfg.DECODER = 'greedy'

    # a small labeled eval dir ({idx}_{label}.png, reference test.py:82)
    import random
    val_dir = tmp_path / 'val'
    val_dir.mkdir()
    rng = random.Random(0)
    for i in range(10):
        img, label = generate_img(rng)
        PILImage.fromarray(img).save(
            str(val_dir / '{:08d}_{}.png'.format(i, label)))
    # stray non-dataset entries must be skipped, not abort the eval
    (val_dir / 'labels.txt').write_text('not an image')
    (val_dir / 'subdir').mkdir()

    # a checkpoint to restore (random init is fine: parity, not accuracy)
    out_dir = tmp_path / 'out'
    out_dir.mkdir()
    net = get_network('LSTM_test')
    params = net.init_params(
        jax.random.PRNGKey(3),
        {'data': (1, int(cfg.BUCKETS[0]), cfg.NUM_FEATURES),
         'time_step_len': (1,)})
    checkpoint.save({'params': params}, str(out_dir), step=7)

    results = {}
    for tag, parallel in (('single', 'off'), ('dp', 'auto')):
        cfg.PARALLEL = parallel
        sw = EvalSolver(net, AttrDict({'name': 'test'}), str(out_dir),
                        str(tmp_path / ('log_' + tag)))
        results[tag] = sw.test_model(testDir=str(val_dir), restore=True)

    assert results['dp'][0] == results['single'][0]
