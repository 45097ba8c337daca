#!/usr/bin/env python
"""Export a trained checkpoint as standalone serving artifacts (StableHLO).

Freezes the latest checkpoint's params into one ahead-of-time-lowered
decode program per width bucket (see lstm_ctc_ocr_tpu/engine/serve.py), so
a serving host runs inference without this framework, the checkpoint, or a
recompile per shape — only jax + the artifact directory.

    python tools/export_model.py --cfg lstm/lstm.yml \
        [--out output/lstm_ctc/export] [--buckets 96,128] [--batch 64] \
        [--platform cpu] [--check]

``--check`` round-trips each artifact through deserialize and pins its
output to the live decode path on random inputs.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='lstm/lstm.yml')
    ap.add_argument('--network', default='LSTM_test')
    ap.add_argument('--out', default=None,
                    help='artifact dir (default output/<EXP_DIR>/export)')
    ap.add_argument('--buckets', default=None,
                    help='comma-separated widths (default cfg.BUCKETS)')
    ap.add_argument('--batch', type=int, default=None,
                    help='serving batch per program (default TEST.BATCH_SIZE)')
    ap.add_argument('--platform', default='cpu,tpu',
                    help='comma-separated lowering targets')
    ap.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                    default=None)
    ap.add_argument('--check', action='store_true')
    args = ap.parse_args()

    import jax
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

    from lstm_ctc_ocr_tpu.config import (cfg, cfg_from_file, cfg_from_list,
                                         get_output_dir)
    from lstm_ctc_ocr_tpu.engine import checkpoint
    from lstm_ctc_ocr_tpu.engine.serve import ExportedDecoder, export_decoder
    from lstm_ctc_ocr_tpu.models.factory import get_network

    if args.cfg:
        cfg_from_file(args.cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    from lstm_ctc_ocr_tpu.config import AttrDict
    out_dir = get_output_dir(AttrDict({'name': cfg.EXP_DIR}), None)
    export_dir = args.out or os.path.join(out_dir, 'export')
    buckets = ([int(b) for b in args.buckets.split(',')]
               if args.buckets else None)

    net = get_network(args.network)
    n, w0 = 1, int(cfg.BUCKETS[0])
    params = net.init_params(
        jax.random.PRNGKey(cfg.RNG_SEED),
        {'data': (n, w0, cfg.NUM_FEATURES), 'time_step_len': (n,)})
    found = checkpoint.latest_eval_checkpoint(out_dir)
    if found is None:
        raise SystemExit('no checkpoint in {} (nor a release in {})'.format(
            out_dir, checkpoint.release_dir(out_dir)))
    path, step = found
    bn_state = net.init_bn_state()
    if str(cfg.BN_EVAL) == 'moving' and bn_state:
        if not checkpoint.has_keys_under(path, 'bn_state'):
            raise SystemExit(
                'BN_EVAL=moving but {} has no bn_state — run '
                'tools/calibrate_bn.py first'.format(path))
        state = checkpoint.restore({'params': params, 'bn_state': bn_state},
                                   path)
        params, bn_state = state['params'], state['bn_state']
    else:
        params = checkpoint.restore({'params': params}, path)['params']
        bn_state = {}
    print('freezing {} (step {})'.format(path, step))

    manifest = export_decoder(net, params, export_dir, buckets=buckets,
                              batch=args.batch,
                              platforms=tuple(args.platform.split(',')),
                              bn_state=bn_state)
    sizes = {f: os.path.getsize(os.path.join(export_dir, f)) // 1024
             for f in sorted(os.listdir(export_dir))}
    print(json.dumps({'export_dir': export_dir, 'kib': sizes,
                      'buckets': manifest['buckets'],
                      'batch': manifest['batch']}))

    if args.check:
        from lstm_ctc_ocr_tpu.engine.train import (compute_dtype,
                                                   make_decode_step)
        old = str(cfg.LSTM_IMPL)
        cfg.LSTM_IMPL = 'jax'      # match what the artifact contains
        try:
            live = make_decode_step(net, compute_dtype())
            dec = ExportedDecoder(export_dir)
            rng = np.random.RandomState(0)
            import jax.numpy as jnp
            for w in manifest['buckets']:
                img = rng.rand(manifest['batch'], w,
                               cfg.NUM_FEATURES).astype(np.float32)
                ts = np.full((manifest['batch'],), w // 4 - 1, np.int32)
                got = np.asarray(dec._programs[w].call(jnp.asarray(img),
                                                       jnp.asarray(ts)))
                want = np.asarray(live(params, bn_state, jnp.asarray(img),
                                       jnp.asarray(ts)))
                assert (got == want).all(), 'mismatch at bucket {}'.format(w)
                print('bucket {}: artifact == live decode'.format(w))
        finally:
            cfg.LSTM_IMPL = old


if __name__ == '__main__':
    main()
