#!/usr/bin/env python
"""Import reference-format TFRecord files into the native records format.

The reference's dev branch serializes its dataset as TFRecord
SequenceExamples (/root/reference/lib/lstm/utils/tf_records.py:36-90):
context features ``height``/``width``/``time_step``/``label_len`` (int64)
and ``image_raw`` (raw uint8 pixel bytes), plus a ``label`` int64
feature-list padded with 0 to MAX_CHAR_LEN. A user migrating from the
reference may hold such files; this tool converts them to this framework's
mmap records container (lstm_ctc_ocr_tpu/data/records.py) so they train
with ``DATA_BACKEND records`` unchanged.

Records are decoded with the TensorFlow protobuf classes only (no graph,
no session — the reference needed queue runners, tf_records.py:211-241);
label ids are mapped back to characters through the charset codec, and RGB
images are converted to the grayscale the pipelines expect.

Usage:
    python tools/import_tfrecords.py train.tfrecords --out data/train.records
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iter_sequence_examples(path):
    """Yield tf.train.SequenceExample from a TFRecord file."""
    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    import tensorflow as tf
    for raw in tf.data.TFRecordDataset(path).as_numpy_iterator():
        yield tf.train.SequenceExample.FromString(raw)


def decode_example(ex, decode_maps):
    """SequenceExample -> (label string, grayscale uint8 image)."""
    ctx = ex.context.feature
    h = int(ctx['height'].int64_list.value[0])
    w = int(ctx['width'].int64_list.value[0])
    label_len = int(ctx['label_len'].int64_list.value[0])
    raw = ctx['image_raw'].bytes_list.value[0]
    c = len(raw) // (h * w)
    img = np.frombuffer(raw, np.uint8).reshape(
        (h, w) if c == 1 else (h, w, c))
    if img.ndim == 3:       # reference stores RGB (tf_records.py:53,69)
        if img.shape[2] == 2:          # grayscale+alpha (LA png): luma channel
            img = np.ascontiguousarray(img[..., 0])
        else:                          # RGB / RGBA (alpha ignored)
            img = np.round(
                0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2]).astype(np.uint8)
    ids = [int(v) for f in ex.feature_lists.feature_list['label'].feature
           for v in f.int64_list.value]
    label = ''.join(decode_maps[i] for i in ids[:label_len])
    return label, img


def import_tfrecords(tfrecord_path: str, out_path: str) -> int:
    from lstm_ctc_ocr_tpu.config import get_encode_decode_dict
    from lstm_ctc_ocr_tpu.data.gen import max_label_len
    from lstm_ctc_ocr_tpu.data.records import RecordsWriter
    _, decode_maps = get_encode_decode_dict()
    l_max = max_label_len()
    n = i = skipped = 0
    with RecordsWriter(out_path) as w:
        for i, ex in enumerate(iter_sequence_examples(tfrecord_path), 1):
            # validate NOW, not deep inside a training run hours later: the
            # reference writer happily emits labels longer than maxLen
            # unpadded (tf_records.py:56-57) and any filename characters
            try:
                label, img = decode_example(ex, decode_maps)
            except KeyError as e:
                skipped += 1
                print('skipping record {}: label id {} not in charset'
                      .format(i, e))
                continue
            if not label or len(label) > l_max:
                skipped += 1
                print('skipping record {}: {}-char label {!r} outside '
                      '(1..MAX_CHAR_LEN={})'.format(i, len(label), label,
                                                    l_max))
                continue
            w.add(label, img)
            n += 1
    if skipped:
        print('skipped {} of {} records'.format(skipped, i))
    return n


if __name__ == '__main__':
    ap = argparse.ArgumentParser(
        description='Convert reference-format TFRecords to native records')
    ap.add_argument('tfrecords', help='input .tfrecords file (reference dev-branch format)')
    ap.add_argument('--out', required=True, help='output .records path')
    args = ap.parse_args()
    n = import_tfrecords(args.tfrecords, args.out)
    print('imported {} records from {} -> {}'.format(n, args.tfrecords, args.out))
