"""One simulated host of a 2-process jax.distributed CPU run.

Spawned by tests/test_multihost.py (not collected by pytest). Each process
owns 4 virtual CPU devices; together they form the 8-device global mesh.
Exercises the REAL multi-host product path: ``init_distributed`` (env-var
driven, as lstm/train_net.py calls it), a global mesh larger than the
local device set, ``shard_host_batch`` turning each host's local batch
slice into the global sharded array, and the sharded train step whose
gradient psum now crosses process boundaries.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from lstm_ctc_ocr_tpu.parallel import mesh as pmesh
    nproc = pmesh.init_distributed()          # JAX_COORDINATOR_ADDRESS etc.
    assert nproc == 2, nproc
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np
    from lstm_ctc_ocr_tpu.config import cfg
    from lstm_ctc_ocr_tpu.engine.train import make_optimizer
    from lstm_ctc_ocr_tpu.models.factory import get_network

    cfg.TRAIN.DTYPE = 'float32'
    cfg.TRAIN.SOLVER = 'Momentum'
    cfg.TRAIN.LEARNING_RATE = 0.001

    n, w = 16, 64
    net = get_network('LSTM_train')
    params = net.init_params(
        jax.random.PRNGKey(0), {'data': (n, w, 32), 'time_step_len': (n,)})
    tx = make_optimizer()
    opt_state = tx.init(params)

    m = pmesh.make_mesh()                     # all 8 GLOBAL devices
    repl = pmesh.replicated(m)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    bn_state = jax.device_put(net.init_bn_state(), repl)
    step = pmesh.make_parallel_train_step(net, tx, None, m)

    rng = np.random.RandomState(0)            # same global batch both hosts
    image = rng.rand(n, w, 32).astype(np.float32)
    label = rng.randint(1, 20, size=(n, 6)).astype(np.int32)
    label_len = rng.randint(4, 7, size=(n,)).astype(np.int32)
    time_step = np.full((n,), w // 4 - 1, np.int32)

    pid = jax.process_index()
    lo, hi = pid * n // 2, (pid + 1) * n // 2  # this host's local slice
    sharded = pmesh.shard_host_batch(m, image[lo:hi], label[lo:hi],
                                     label_len[lo:hi], time_step[lo:hi])
    params, opt_state, bn_state, total, ctc = step(
        params, opt_state, bn_state, *sharded, 0)

    # ---- sharded device store: per-host partitions, block-index gather ----
    # Blocks are seeded by GLOBAL device id, so the single-process harness
    # (test_multihost.py) rebuilds the identical global store on its own
    # 8-device mesh and must reproduce these losses.
    from lstm_ctc_ocr_tpu.data.device_store import ShardedDeviceStore
    d_local, rows = 4, 6
    first = pid * d_local
    chars = list('abc049')
    images, labels = [], []
    for i in range(d_local):
        r = np.random.RandomState(1000 + first + i)
        images.append([r.randint(0, 256, (32, 80), np.uint8)
                       for _ in range(rows)])
        labels.append([''.join(r.choice(chars, 4)) for _ in range(rows)])
    store = ShardedDeviceStore(images, labels, 'uniform', seed=5, mesh=m,
                               verbose=False)
    params2 = net.init_params(
        jax.random.PRNGKey(0),
        {'data': (n, store.w_bucket, 32), 'time_step_len': (n,)})
    opt2 = jax.device_put(tx.init(params2), repl)
    params2 = jax.device_put(params2, repl)
    bn2 = jax.device_put(net.init_bn_state(), repl)
    gstep = pmesh.make_parallel_train_step_gather_sharded(net, tx, None, m)
    sharded_losses = []
    for i in range(2):
        params2, opt2, bn2, t2, _ = gstep(
            params2, opt2, bn2, *store.arrays, store.step_indices(n), i)
        sharded_losses.append(float(t2))

    # ---- global val-accuracy reduction (engine.train.run_val path) ----
    # host 0 scores 4/4 locally, host 1 scores 2/4 -> the reported global
    # number must be 6/8 = 0.75 on BOTH hosts (the single-process value
    # for the union of the two shards)
    from lstm_ctc_ocr_tpu.engine.train import global_accuracy
    gacc = global_accuracy(1.0 if pid == 0 else 0.5, 4)

    print(json.dumps({'process': pid, 'loss': float(total),
                      'ctc': float(ctc),
                      'sharded_losses': sharded_losses,
                      'global_val_acc': gacc}), flush=True)


if __name__ == '__main__':
    main()
