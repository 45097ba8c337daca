#!/usr/bin/env python
"""Dump model weights from a checkpoint to a plain .npy dict.

Working counterpart of the reference's (broken in-tree) converter
(/root/reference/lib/utils/convert_ckpt2npy.py): loads a snapshot written
by engine/checkpoint.py and saves ``{layer: {param: ndarray}}`` as .npy,
loadable with ``np.load(path, allow_pickle=True).item()``.
"""

import argparse
import os

import numpy as np



def convert(ckpt_path: str, out_path: str) -> dict:
    with np.load(ckpt_path) as data:
        flat = {k: data[k] for k in data.files if k.startswith('params/')}
    tree = {}
    for key, arr in flat.items():
        parts = key.split('/')[1:]   # drop 'params'
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = arr
    np.save(out_path, tree, allow_pickle=True)
    return tree


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('ckpt', help='path to *_iter_N.ckpt.npz')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    out = args.out or (os.path.splitext(args.ckpt)[0] + '.npy')
    tree = convert(args.ckpt, out)
    print('wrote {} ({} layers)'.format(out, len(tree)))
