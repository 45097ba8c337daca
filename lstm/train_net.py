#!/usr/bin/env python
"""Training CLI — flag surface mirrors /root/reference/lstm/train_net.py:17-48
(--gpu --iters --cfg --pre_train --rand --network --set --restore) so
``./train.sh`` works unchanged on the TPU-native engine underneath.

Beyond the reference (which pins one GPU via CUDA_VISIBLE_DEVICES,
train_net.py:59), this entry initialises the multi-host JAX runtime when
coordinator env vars are present and lets the solver build a DP mesh over
every visible chip (cfg.PARALLEL)."""

import argparse
import os.path
import pprint
import sys

this_dir = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(this_dir, '..'))

import numpy as np

if os.environ.get('JAX_PLATFORMS'):
    # the axon TPU tunnel ignores the env var; apply it through the config
    # API so JAX_PLATFORMS=cpu smoke runs work while the chip is busy
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

from lstm_ctc_ocr_tpu.config import (AttrDict, cfg, cfg_from_file,
                                     cfg_from_list, get_log_dir,
                                     get_output_dir)
from lstm_ctc_ocr_tpu.engine.train import train_net
from lstm_ctc_ocr_tpu.models.factory import get_network
from lstm_ctc_ocr_tpu.parallel.mesh import init_distributed


def parse_args():
    parser = argparse.ArgumentParser(
        description='Train the CRNN+CTC OCR model')
    parser.add_argument('--gpu', dest='gpu_id',
                        help='accepted for reference-CLI compatibility; '
                             'JAX owns device placement on TPU',
                        default=0, type=int)
    parser.add_argument('--iters', dest='max_iters',
                        help='training iteration budget',
                        default=1000000, type=int)
    parser.add_argument('--cfg', dest='cfg_file',
                        help='YAML experiment config merged over the defaults',
                        default=None, type=str)
    parser.add_argument('--pre_train', dest='pre_train',
                        help='checkpoint or .npy weight dict to initialise from',
                        default=None, type=str)
    parser.add_argument('--rand', dest='randomize',
                        help='skip the fixed RNG seed (non-reproducible run)',
                        action='store_true')
    parser.add_argument('--network', dest='network_name',
                        help='model name to build (LSTM_train)',
                        default=None, type=str)
    parser.add_argument('--set', dest='set_cfgs',
                        help='dotted-path config overrides: KEY VALUE ...',
                        default=None, nargs=argparse.REMAINDER)
    parser.add_argument('--restore', dest='restore',
                        help='1: resume from the latest checkpoint in the '
                             'output dir', default=0, type=int)
    if len(sys.argv) == 1:
        parser.print_help()
    return parser.parse_args()


if __name__ == '__main__':
    args = parse_args()
    print('CLI arguments:')
    print(args)
    if args.cfg_file is not None:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs)

    print('Effective config:')
    pprint.pprint(cfg)

    if not args.randomize:
        np.random.seed(cfg.RNG_SEED)

    # multi-host runtime (no-op unless JAX_COORDINATOR_ADDRESS etc. are set);
    # must run before the solver enumerates jax.devices()
    n_proc = init_distributed()
    if n_proc > 1:
        print('distributed runtime: {} host processes'.format(n_proc))

    net_tag = args.network_name.split('_')[-1]
    imgdb = AttrDict({'path': str(cfg.RECORDS_PATH),
                      'name': 'lstm_' + net_tag,
                      'val_path': './data/val.records'})

    output_dir = get_output_dir(imgdb, None)
    log_dir = get_log_dir(imgdb)
    print('checkpoints -> {:s}'.format(output_dir))
    print('tensorboard events -> {:s}'.format(log_dir))

    network = get_network(args.network_name)
    print('training model: {:s}'.format(args.network_name))

    train_net(network, imgdb,
              pre_train=args.pre_train,
              output_dir=output_dir,
              log_dir=log_dir,
              max_iters=args.max_iters,
              restore=bool(int(args.restore)))
