#!/usr/bin/env python
"""Convert a reference TF1 checkpoint to a ``--pre_train``-loadable .npy dict.

The reference's own converter (/root/reference/lib/utils/convert_ckpt2npy.py:16-49)
was meant to do this but ships broken (imports a nonexistent module, hardcodes
VGG/FCN variable names). This tool reads any TF checkpoint of the reference
CRNN graph (LSTM_train/LSTM_test) and writes the ``{layer: {param: ndarray}}``
dict that ``engine/checkpoint.py:load_npy_pretrained`` consumes, so reference
users migrate trained weights via ``--pre_train model.npy``.

Name mapping (reference TF1 graph -> this framework's params pytree):

    {conv}/weights                                   -> {conv}/kernel   [kh,kw,ci,co], same HWIO layout
    {conv}/biases                                    -> {conv}/biases
    {conv}/{conv}/gamma|beta                         -> {conv}/bn_gamma|bn_beta
                                                        (contrib batch_norm(scope=name) nested inside
                                                        variable_scope(name), network.py:167,176-178 —
                                                        the scope name appears TWICE; a {conv}/BatchNorm/...
                                                        spelling, contrib's scope=None default, is also
                                                        accepted)
    .../moving_mean|moving_variance                  -> skipped: the reference runs batch_norm with
                                                        is_training=True even at eval (network.py:177-178),
                                                        so moving stats never enter its forward pass either
    {scope}/bidirectional_rnn/fw|bw/lstm_cell/kernel -> {scope}/cells/fw|bw/kernel  [d+h, 4h], gate order
                                                        (i,j,f,o) identical (ops/rnn.py cell contract)
    {scope}/bidirectional_rnn/fw|bw/lstm_cell/bias   -> {scope}/cells/fw|bw/bias    (forget_bias is added at
                                                        compute time in both, never stored)
    {scope}/weights  (rank 2)                        -> {scope}/weights  projection [num_hids, NCLASSES]
    {scope}/biases                                   -> {scope}/biases

Optimizer slots (Adam/Momentum/RMSProp moments, beta powers, global_step, lr)
are dropped; anything else unrecognized is reported and skipped.

Usage:
    python tools/import_tf_checkpoint.py output/lstm_ctc/lstm_ctc_iter_100000.ckpt --out pretrain.npy
    ./train.sh --pre_train pretrain.npy
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OPT_SLOT_MARKERS = ('/Adam', '/Momentum', '/RMSProp', 'beta1_power',
                     'beta2_power', 'global_step', 'learning_rate', '/lr')


def map_variable(name, shape):
    """TF1 variable name -> path tuple into the npy dict, or None to skip.

    Returns (path, reason); path None means skipped, with reason for report.
    """
    if any(m in name for m in _OPT_SLOT_MARKERS):
        return None, 'optimizer slot'
    parts = name.split('/')
    # contrib batch_norm(scope=name) inside variable_scope(name) doubles the
    # scope: conv4_1/conv4_1/gamma (the reference's actual spelling); also
    # accept the BatchNorm default-scope spelling for robustness
    is_bn = ('BatchNorm' in parts) or (
        len(parts) == 3 and parts[0] == parts[1]
        and parts[-1] in ('gamma', 'beta', 'moving_mean', 'moving_variance'))
    if is_bn:
        scope = parts[parts.index('BatchNorm') - 1] if 'BatchNorm' in parts \
            else parts[0]
        leaf = parts[-1]
        if leaf == 'gamma':
            return (scope, 'bn_gamma'), None
        if leaf == 'beta':
            return (scope, 'bn_beta'), None
        if leaf in ('moving_mean', 'moving_variance'):
            return None, 'moving stat (unused: reference BN is is_training=True)'
        return None, 'unrecognized BatchNorm variable'
    if 'bidirectional_rnn' in parts:
        scope = parts[parts.index('bidirectional_rnn') - 1]
        try:
            direction = parts[parts.index('bidirectional_rnn') + 1]  # fw / bw
        except IndexError:
            return None, 'malformed bidirectional_rnn name'
        leaf = parts[-1]
        if direction in ('fw', 'bw') and leaf in ('kernel', 'bias'):
            return (scope, 'cells', direction, leaf), None
        return None, 'unrecognized rnn variable'
    if len(parts) == 2 and parts[1] == 'weights':
        if len(shape) == 4:                      # conv kernel, HWIO both sides
            return (parts[0], 'kernel'), None
        if len(shape) == 2:                      # dense projection
            return (parts[0], 'weights'), None
        return None, 'weights of unsupported rank {}'.format(len(shape))
    if len(parts) == 2 and parts[1] == 'biases':
        return (parts[0], 'biases'), None
    return None, 'unrecognized variable'


def convert_tf_checkpoint(ckpt_path: str, out_path: str) -> dict:
    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    import tensorflow as tf
    reader = tf.train.load_checkpoint(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()
    tree = {}
    n_mapped = 0
    for name in sorted(shape_map):
        path, reason = map_variable(name, shape_map[name])
        if path is None:
            if reason != 'optimizer slot':
                print('skipping {}: {}'.format(name, reason))
            continue
        d = tree
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = np.asarray(reader.get_tensor(name))
        n_mapped += 1
    if out_path:
        np.save(out_path, tree, allow_pickle=True)
    print('mapped {} of {} checkpoint variables'.format(
        n_mapped, len(shape_map)))
    return tree


if __name__ == '__main__':
    ap = argparse.ArgumentParser(
        description='Convert a reference TF1 checkpoint to a --pre_train .npy')
    ap.add_argument('ckpt', help='TF checkpoint prefix (no .index/.data suffix)')
    ap.add_argument('--out', default=None,
                    help='output .npy path (default: <ckpt>.npy)')
    args = ap.parse_args()
    out = args.out or (args.ckpt + '.npy')
    convert_tf_checkpoint(args.ckpt, out)
    print('wrote {}'.format(out))
