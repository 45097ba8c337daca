#!/usr/bin/env python
"""Estimate moving BN statistics for a checkpoint that predates BN_EVAL.

    python tools/calibrate_bn.py --cfg lstm/lstm.yml [--release] \
        [--batches 32] [--batch 64] [--seed 11]

BN_EVAL='moving' eval needs per-layer moving mean/variance. New training
runs accumulate them in the train step (engine/train.py); checkpoints and
releases written before that (or any params-only artifact) have none. This
tool estimates them post-hoc — the classic BN calibration pass: stream K
batches from the synth training distribution through the restored network,
pool the per-batch statistics exactly (E[x], E[x^2] accumulation, not an
EMA), and write the result INTO the checkpoint file as ``bn_state/...``
keys. The file is rewritten atomically; params are untouched.

Reference context: the reference's tf.contrib.layers.batch_norm registers
the same moving-average update ops but never runs them
(/root/reference/lib/networks/network.py:176-178 + lib/lstm/train.py's bare
sess.run), so its checkpoints carry init-valued moving stats — there is
nothing to import, only to estimate.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if os.environ.get('JAX_PLATFORMS'):
    # axon ignores the env var; route through the config API so calibration
    # can run on CPU while training holds the chip
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def parse_args():
    p = argparse.ArgumentParser(description='Estimate moving BN statistics')
    p.add_argument('--cfg', required=True, help='experiment yml')
    p.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                   default=None, help='config overrides')
    p.add_argument('--ckpt', default=None,
                   help='checkpoint file (default: what eval would restore '
                        '— newest output/ snapshot, else the release)')
    p.add_argument('--release', action='store_true',
                   help='target the tracked release in checkpoints/<EXP_DIR> '
                        'even when output/ has snapshots')
    p.add_argument('--batches', type=int, default=32,
                   help='calibration batches (default 32)')
    p.add_argument('--batch', type=int, default=64,
                   help='calibration batch size (default 64)')
    p.add_argument('--seed', type=int, default=11,
                   help='synth stream seed (disjoint from training/val)')
    return p.parse_args()


def main():
    args = parse_args()
    from lstm_ctc_ocr_tpu.config import (AttrDict, cfg, cfg_from_file,
                                         cfg_from_list, get_output_dir)
    cfg_from_file(args.cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from lstm_ctc_ocr_tpu.data.gen import get_batch
    from lstm_ctc_ocr_tpu.engine import checkpoint
    from lstm_ctc_ocr_tpu.engine.train import compute_dtype
    from lstm_ctc_ocr_tpu.models.factory import get_network

    out_dir = get_output_dir(AttrDict({'name': cfg.EXP_DIR}), None)
    if args.ckpt:
        path = args.ckpt
    else:
        found = (checkpoint.latest_checkpoint(checkpoint.release_dir(out_dir))
                 if args.release
                 else checkpoint.latest_eval_checkpoint(out_dir))
        if found is None:
            raise SystemExit('no checkpoint for {} (looked in {}{})'.format(
                cfg.EXP_DIR, out_dir,
                '' if args.release else ' and its release dir'))
        path = found[0]
    print('calibrating BN statistics for {}'.format(path))

    net = get_network('LSTM_test')
    n, w0 = args.batch, int(cfg.BUCKETS[0])
    params = net.init_params(
        jax.random.PRNGKey(cfg.RNG_SEED),
        {'data': (n, w0, cfg.NUM_FEATURES), 'time_step_len': (n,)})
    if not net.init_bn_state():
        raise SystemExit('network has no bn=True conv layers — nothing to do')
    params = checkpoint.restore({'params': params}, path)['params']
    params = jax.device_put(params)
    dtype = compute_dtype()

    @jax.jit
    def batch_stats(params, image, time_step):
        coll = {}
        net.apply(params, {'data': image, 'time_step_len': time_step},
                  train=False, dtype=dtype, bn_collect=coll)
        return coll

    # exact pooled statistics over all calibration batches: accumulate
    # E[x] and E[x^2] per layer (every batch is the same size, equal weight)
    sum_mean = None
    sum_sq = None
    stream = get_batch(num_workers=0, seed=args.seed, batch_size=args.batch,
                       bucketed=True)
    try:
        for i in range(args.batches):
            b = next(stream)
            coll = jax.tree.map(np.asarray, batch_stats(
                params, jnp.asarray(b.image), jnp.asarray(b.time_step)))
            mean = {k: v['mean'] for k, v in coll.items()}
            sq = {k: v['var'] + v['mean'] ** 2 for k, v in coll.items()}
            if sum_mean is None:
                sum_mean, sum_sq = mean, sq
            else:
                sum_mean = {k: sum_mean[k] + mean[k] for k in mean}
                sum_sq = {k: sum_sq[k] + sq[k] for k in sq}
    finally:
        stream.close()

    k = float(args.batches)
    bn_state = {}
    for name in sorted(sum_mean):
        m = (sum_mean[name] / k).astype(np.float32)
        v = (sum_sq[name] / k - m ** 2).astype(np.float32)
        v = np.maximum(v, 0.0)          # numerical floor
        bn_state[name] = {'mean': m, 'var': v}
        print('  {:12s} mean [{:+.3f}..{:+.3f}] var [{:.4f}..{:.3f}]'.format(
            name, m.min(), m.max(), v.min(), v.max()))

    # rewrite the file with bn_state keys added (atomic tmp+rename);
    # releases are compressed, training snapshots are not — preserve that
    with np.load(path) as data:
        out = {kk: data[kk] for kk in data.files
               if not kk.startswith('bn_state/')}
    out.update(checkpoint.flatten_state({'bn_state': bn_state}))
    tmp = path + '.tmp'
    compressed = os.sep + 'checkpoints' + os.sep in os.path.abspath(path)
    with open(tmp, 'wb') as f:
        (np.savez_compressed if compressed else np.savez)(f, **out)
    os.replace(tmp, path)
    print('wrote {} bn_state layer(s) into {} ({} batches of {}, seed {})'
          .format(len(bn_state), path, args.batches, args.batch, args.seed))


if __name__ == '__main__':
    main()
