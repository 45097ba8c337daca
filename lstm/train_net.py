#!/usr/bin/env python
"""Training CLI — flag surface mirrors /root/reference/lstm/train_net.py:17-48
(--gpu --iters --cfg --pre_train --rand --network --set --restore) so
``./train.sh`` works unchanged on the TPU-native engine underneath."""

import argparse
import os.path
import pprint
import sys

this_dir = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(this_dir, '..'))

import numpy as np

from lstm_ctc_ocr_tpu.config import (AttrDict, cfg, cfg_from_file,
                                     cfg_from_list, get_log_dir,
                                     get_output_dir)
from lstm_ctc_ocr_tpu.engine.train import train_net
from lstm_ctc_ocr_tpu.models.factory import get_network


def parse_args():
    parser = argparse.ArgumentParser(description='Train a lstm network')
    parser.add_argument('--gpu', dest='gpu_id',
                        help='device id to use [0] (accepted for reference '
                             'compat; JAX owns device placement)',
                        default=0, type=int)
    parser.add_argument('--iters', dest='max_iters',
                        help='number of iterations to train',
                        default=1000000, type=int)
    parser.add_argument('--cfg', dest='cfg_file',
                        help='optional config file', default=None, type=str)
    parser.add_argument('--pre_train', dest='pre_train',
                        help='pre trained model', default=None, type=str)
    parser.add_argument('--rand', dest='randomize',
                        help='randomize (do not use a fixed seed)',
                        action='store_true')
    parser.add_argument('--network', dest='network_name',
                        help='name of the network', default=None, type=str)
    parser.add_argument('--set', dest='set_cfgs',
                        help='set config keys', default=None,
                        nargs=argparse.REMAINDER)
    parser.add_argument('--restore', dest='restore',
                        help='restore or not', default=0, type=int)
    if len(sys.argv) == 1:
        parser.print_help()
    return parser.parse_args()


if __name__ == '__main__':
    args = parse_args()
    print('Called with args:')
    print(args)
    if args.cfg_file is not None:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs)

    print('Using config:')
    pprint.pprint(cfg)

    if not args.randomize:
        np.random.seed(cfg.RNG_SEED)

    output_network_name = args.network_name.split('_')[-1]
    imgdb = AttrDict({'path': './data/train_4_6.records',
                      'name': 'lstm_' + output_network_name,
                      'val_path': './data/val.records'})

    output_dir = get_output_dir(imgdb, None)
    log_dir = get_log_dir(imgdb)
    print('Output will be saved to `{:s}`'.format(output_dir))
    print('Logs will be saved to `{:s}`'.format(log_dir))

    network = get_network(args.network_name)
    print('Use network `{:s}` in training'.format(args.network_name))

    train_net(network, imgdb,
              pre_train=args.pre_train,
              output_dir=output_dir,
              log_dir=log_dir,
              max_iters=args.max_iters,
              restore=bool(int(args.restore)))
