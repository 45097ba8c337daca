"""True multi-PROCESS data parallelism: two jax.distributed processes (4
virtual CPU devices each) form the 8-device mesh and run one sharded train
step whose gradient psum crosses the process boundary. This validates the
multi-host product path (init_distributed + shard_host_batch +
make_parallel_train_step) beyond the single-process mesh tests."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow   # multi-minute: see pytest.ini

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', 'multihost_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_dp_step_matches_single_process():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop('XLA_FLAGS', None)            # worker sets its own (4 devices)
        env.update({
            'JAX_COORDINATOR_ADDRESS': '127.0.0.1:{}'.format(port),
            'JAX_NUM_PROCESSES': '2',
            'JAX_PROCESS_ID': str(pid),
            'TF_CPP_MIN_LOG_LEVEL': '3',
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, 'worker failed:\n{}\n{}'.format(out, err)
        outs.append(json.loads(out.strip().splitlines()[-1]))

    losses = sorted((o['process'], o['loss']) for o in outs)
    assert [pid for pid, _ in losses] == [0, 1]
    # both processes see the identical replicated loss
    assert losses[0][1] == losses[1][1]

    # and it matches the same step run single-process on this suite's own
    # 8-device mesh with the same global batch
    import jax
    from lstm_ctc_ocr_tpu.config import cfg
    old = {k: cfg[k] for k in ('TRAIN',)}
    import copy
    old_train = copy.deepcopy(dict(cfg.TRAIN))
    try:
        cfg.TRAIN.DTYPE = 'float32'
        cfg.TRAIN.SOLVER = 'Momentum'
        cfg.TRAIN.LEARNING_RATE = 0.001
        from lstm_ctc_ocr_tpu.engine.train import make_optimizer
        from lstm_ctc_ocr_tpu.models.factory import get_network
        from lstm_ctc_ocr_tpu.parallel import mesh as pmesh

        n, w = 16, 64
        net = get_network('LSTM_train')
        params = net.init_params(
            jax.random.PRNGKey(0),
            {'data': (n, w, 32), 'time_step_len': (n,)})
        tx = make_optimizer()
        opt_state = tx.init(params)
        m = pmesh.make_mesh(8)
        step = pmesh.make_parallel_train_step(net, tx, None, m)
        rng = np.random.RandomState(0)
        image = rng.rand(n, w, 32).astype(np.float32)
        label = rng.randint(1, 20, size=(n, 6)).astype(np.int32)
        label_len = rng.randint(4, 7, size=(n,)).astype(np.int32)
        time_step = np.full((n,), w // 4 - 1, np.int32)
        sharded = pmesh.shard_batch(m, image, label, label_len, time_step)
        bn_state = jax.device_put(net.init_bn_state(), pmesh.replicated(m))
        _, _, _, total, _ = step(params, opt_state, bn_state, *sharded, 0)
        np.testing.assert_allclose(losses[0][1], float(total),
                                   rtol=1e-5, atol=1e-6)

        # global val accuracy: both processes must report the union number
        # (host 0: 4/4, host 1: 2/4 -> 0.75), == the single-process value
        for o in outs:
            assert abs(o['global_val_acc'] - 0.75) < 1e-6, o

        # sharded device store: the 2-process per-host-partition run must
        # match the identical store rebuilt single-process on this suite's
        # own 8-device mesh (blocks are seeded by GLOBAL device id)
        from lstm_ctc_ocr_tpu.data.device_store import ShardedDeviceStore
        assert outs[0]['sharded_losses'] == outs[1]['sharded_losses']
        chars = list('abc049')
        images, labels = [], []
        for g in range(8):
            r = np.random.RandomState(1000 + g)
            images.append([r.randint(0, 256, (32, 80), np.uint8)
                           for _ in range(6)])
            labels.append([''.join(r.choice(chars, 4)) for _ in range(6)])
        store = ShardedDeviceStore(images, labels, 'uniform', seed=5,
                                   mesh=m, verbose=False)
        params2 = net.init_params(
            jax.random.PRNGKey(0),
            {'data': (n, store.w_bucket, 32), 'time_step_len': (n,)})
        opt2 = jax.device_put(tx.init(params2), pmesh.replicated(m))
        params2 = jax.device_put(params2, pmesh.replicated(m))
        bn2 = jax.device_put(net.init_bn_state(), pmesh.replicated(m))
        gstep = pmesh.make_parallel_train_step_gather_sharded(net, tx, None,
                                                              m)
        ref_losses = []
        for i in range(2):
            params2, opt2, bn2, t2, _ = gstep(
                params2, opt2, bn2, *store.arrays, store.step_indices(n), i)
            ref_losses.append(float(t2))
        np.testing.assert_allclose(outs[0]['sharded_losses'], ref_losses,
                                   rtol=1e-5, atol=1e-6)
    finally:
        cfg.TRAIN.clear()
        for k, v in old_train.items():
            cfg.TRAIN[k] = v
