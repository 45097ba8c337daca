#!/usr/bin/env python
"""Promote the newest training snapshot to a tracked release checkpoint.

    python tools/release_ckpt.py --cfg lstm/lstm.yml [--step N] [--f32] \
        [--verify-dir ./data/val --batch 64]

Training snapshots (output/<EXP_DIR>/, .gitignored, params + optimizer
state) do not survive an environment wipe; releases
(checkpoints/<EXP_DIR>/, tracked in git) do, and are what ./test.sh falls
back to on a fresh clone. The release stores the params only, float leaves
in f16 (~quarter of the full snapshot; --f32 keeps f32). With
--verify-dir the tool re-evaluates the RELEASED file against that labeled
directory and prints the accuracy, so the number recorded for the release
is measured on exactly the artifact that ships.

Reference role: the shipped "trained model" the reference README points
users at (it published a Dropbox checkpoint; README.md:35-38) — here the
weights live in-tree.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if os.environ.get('JAX_PLATFORMS'):
    # The axon TPU plugin ignores the env var; route through the config
    # API so JAX_PLATFORMS=cpu verifies a release while training holds
    # the chip (same handling as lstm/test_net.py).
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def parse_args():
    p = argparse.ArgumentParser(description='Release a trained checkpoint')
    p.add_argument('--cfg', required=True, help='experiment yml')
    p.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                   default=None, help='config overrides')
    p.add_argument('--step', type=int, default=None,
                   help='snapshot step (default: newest)')
    p.add_argument('--f32', action='store_true',
                   help='keep float32 leaves (default: store f16)')
    p.add_argument('--verify-dir', default=None,
                   help='labeled image dir; re-evaluate the released file')
    p.add_argument('--batch', type=int, default=64,
                   help='eval batch size for --verify-dir')
    return p.parse_args()


def main():
    args = parse_args()
    from lstm_ctc_ocr_tpu.config import (AttrDict, cfg, cfg_from_file,
                                         cfg_from_list, get_output_dir)
    cfg_from_file(args.cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    from lstm_ctc_ocr_tpu.engine import checkpoint

    out_dir = get_output_dir(AttrDict({'name': cfg.EXP_DIR}), None)
    ckpts = checkpoint.list_checkpoints(out_dir)
    if not ckpts:
        raise SystemExit('no snapshots in {}'.format(out_dir))
    if args.step is not None:
        match = [c for c in ckpts if c[1] == args.step]
        if not match:
            raise SystemExit('no snapshot at step {} (have {})'.format(
                args.step, sorted(s for _, s in ckpts)))
        path, step = match[0]
    else:
        path, step = max(ckpts, key=lambda x: x[1])

    import numpy as np

    def nest(flat, prefix):
        """flat '<prefix>/<a>/<b>' keys -> nested dict pytree."""
        tree = {}
        for k, v in flat.items():
            parts = k.split('/')[1:]
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return tree

    with np.load(path) as data:
        flat = {k: data[k] for k in data.files if k.startswith('params/')}
        bn_flat = {k: data[k] for k in data.files
                   if k.startswith('bn_state/')}
    if not flat:
        raise SystemExit('snapshot {} has no params/ leaves'.format(path))
    tree = nest(flat, 'params')
    # moving BN statistics (BN_EVAL-era snapshots) ship inside the release
    # so BN_EVAL=moving eval works from a fresh clone
    bn_tree = nest(bn_flat, 'bn_state') if bn_flat else None

    rel = checkpoint.save_release(tree, out_dir, step,
                                  dtype=None if args.f32 else 'float16',
                                  bn_state=bn_tree)
    if bn_tree:
        print('release carries moving BN statistics (BN_EVAL=moving ready)')
    size_mb = os.path.getsize(rel) / 1e6
    print('released {} ({} MB, step {})'.format(rel, round(size_mb, 1), step))

    if args.verify_dir:
        # evaluate the released artifact itself: hand the eval driver the
        # RELEASE dir as its checkpoint dir, so the f16 file that ships is
        # exactly what gets restored (not the f32 training snapshot)
        rel_dir = checkpoint.release_dir(out_dir)
        newest = checkpoint.latest_checkpoint(rel_dir)
        if newest is None or os.path.abspath(newest[0]) != os.path.abspath(rel):
            raise SystemExit(
                'release dir {} would restore {} instead of the file just '
                'released ({}); remove stale higher-step releases before '
                'verifying'.format(rel_dir, newest and newest[0], rel))
        from lstm_ctc_ocr_tpu.engine.test import test_net
        from lstm_ctc_ocr_tpu.models.factory import get_network
        net = get_network('LSTM_test')
        cfg.TEST.BATCH_SIZE = args.batch
        acc, p50 = test_net(net, AttrDict({'name': cfg.EXP_DIR}),
                            args.verify_dir, rel_dir,
                            None)
        print('released-weights accuracy: {:.4f} (p50 decode {:.4f}s)'
              .format(acc, p50))


if __name__ == '__main__':
    main()
