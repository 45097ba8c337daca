"""Evaluation metrics.

``accuracy_calculation`` mirrors the reference's exact-match sequence
accuracy (lib/lstm/utils/training.py:26-37): both the reference and decoded
id sequences are stripped of ``ignore_value`` (blank/pad 0) before comparing,
and the first ``cfg.VAL.PRINT_NUM`` pairs are printed for eyeballing.
"""

from __future__ import annotations

import numpy as np

from ..config import cfg


def _strip(seq, ignore_value):
    return [int(i) for i in seq if int(i) != ignore_value]


def accuracy_calculation(original_seq, decoded_seq, ignore_value=0,
                         verbose=True):
    if len(original_seq) != len(decoded_seq):
        print('accuracy_calculation: got {} reference sequences but {} '
              'decoded ones — batch mismatch, returning 0'
              .format(len(original_seq), len(decoded_seq)))
        return 0
    count = 0
    for i, origin_label in enumerate(original_seq):
        decoded_label = _strip(decoded_seq[i], ignore_value)
        origin_label = _strip(origin_label, ignore_value)
        if verbose and i < cfg.VAL.PRINT_NUM:
            print('seq {:>4}: origin: {} decoded: {}'.format(
                i, origin_label, decoded_label))
        if origin_label == decoded_label:
            count += 1
    return count * 1.0 / len(original_seq)


def restore_labels(label_vec, label_len):
    """Unflatten a warp-ctc style flat label vector into per-example lists
    (reference: lib/lstm/train.py:49-54)."""
    labels = []
    vec = list(np.asarray(label_vec).tolist())
    for l_len in np.asarray(label_len).tolist():
        labels.append(vec[:int(l_len)])
        vec = vec[int(l_len):]
    return labels


def merge_labels(labels, ignore=0):
    """Flatten per-example label lists, stripping trailing ``ignore`` padding
    (reference: lib/lstm/train.py:56-61)."""
    label_lst = []
    for l in labels:
        l = list(l)
        while l and l[-1] == ignore:
            l = l[:-1]
        label_lst.extend(l)
    return np.array(label_lst)
