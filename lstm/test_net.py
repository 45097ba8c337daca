#!/usr/bin/env python
"""Evaluation CLI — flag surface mirrors /root/reference/lstm/test_net.py:19-38,
plus ``--set`` overrides and ``--test_dir`` (the reference hardcodes
``./data/val/``, test_net.py:66)."""

import argparse
import os.path
import pprint
import sys

this_dir = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(this_dir, '..'))

import numpy as np

if os.environ.get('JAX_PLATFORMS'):
    # the axon TPU tunnel ignores the env var; apply it through the config
    # API so JAX_PLATFORMS=cpu drives work while training holds the chip
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

from lstm_ctc_ocr_tpu.config import (AttrDict, cfg, cfg_from_file,
                                     cfg_from_list, get_log_dir,
                                     get_output_dir)
from lstm_ctc_ocr_tpu.engine.test import test_net
from lstm_ctc_ocr_tpu.models.factory import get_network


def parse_args():
    parser = argparse.ArgumentParser(
        description='Evaluate a trained CRNN+CTC OCR checkpoint')
    parser.add_argument('--gpu', dest='gpu_id',
                        help='accepted for reference-CLI compatibility; '
                             'JAX owns device placement on TPU',
                        default=0, type=int)
    parser.add_argument('--cfg', dest='cfg_file',
                        help='YAML experiment config merged over the defaults',
                        default=None, type=str)
    parser.add_argument('--network', dest='network_name',
                        help='model name to build (LSTM_test)',
                        default=None, type=str)
    parser.add_argument('--set', dest='set_cfgs',
                        help='dotted-path config overrides: KEY VALUE ...',
                        default=None, nargs=argparse.REMAINDER)
    parser.add_argument('--restore', dest='restore',
                        help='1: load the latest checkpoint from the output dir',
                        default=1, type=int)
    parser.add_argument('--test_dir', dest='test_dir',
                        help='directory of {idx}_{label}.png test images',
                        default='./data/val/', type=str)
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

    np.random.seed(cfg.RNG_SEED)

    net_tag = args.network_name.split('_')[-1]
    imgdb = AttrDict({'name': 'lstm_' + net_tag})

    output_dir = get_output_dir(imgdb, None)
    log_dir = get_log_dir(imgdb)

    network = get_network(args.network_name)
    print('evaluating model: {:s}'.format(args.network_name))

    test_net(network, imgdb,
             testDir=args.test_dir,
             output_dir=output_dir,
             log_dir=log_dir,
             restore=bool(int(args.restore)))
