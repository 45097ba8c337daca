#!/usr/bin/env python
"""Export a dataset to reference-format TFRecord SequenceExamples.

The migration mirror of tools/import_tfrecords.py: a user leaving for (or
sharing data with) the reference implementation gets files its dev-branch
reader consumes. Schema parity with the reference writer
(/root/reference/lib/lstm/utils/tf_records.py:36-90):

* context int64 features ``height``/``width``/``time_step``/``label_len``
  plus ``image_raw`` (raw uint8 pixel bytes),
* a ``label`` int64 FeatureList, ids padded with 0 up to MAX_CHAR_LEN,
* ``time_step`` recorded as ``cfg.IMG_SHAPE[0]`` (the reference writes this
  constant regardless of image size — a schema quirk we reproduce),
* pixels stored as RGB: the reference's reader hard-reshapes to
  ``[h, w, 3]`` (tf_records.py:189), so grayscale sources are replicated
  across channels. The luma conversion on re-import (0.299/0.587/0.114 sums
  to 1) restores the original gray values exactly, making
  export -> import_tfrecords a lossless round trip.

Sources: a native .records container (data/records.py) or a directory of
``{idx}_{label}.png`` images.

Usage:
    python tools/export_tfrecords.py data/train.records --out train.tfrecords
    python tools/export_tfrecords.py ./data/val/ --out val.tfrecords
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iter_dataset(src):
    """Yield (label str, grayscale-or-RGB uint8 image) from a records file
    or an image directory."""
    from lstm_ctc_ocr_tpu.data.records import (
        RecordsDataset, iter_labeled_images)
    if os.path.isdir(src):
        # shared walk with the records writer (data/records.py) so
        # directory decode semantics cannot drift between the two paths
        for pair in iter_labeled_images(src):
            yield pair
    else:
        ds = RecordsDataset(src)
        for i in range(len(ds)):
            yield ds.get(i)


def make_sequence_example(label: str, image: np.ndarray, encode_maps,
                          max_char_len: int, time_step: int):
    """Build one reference-schema SequenceExample proto."""
    import tensorflow as tf
    if image.ndim == 2:                       # reference reader wants [h,w,3]
        image = np.repeat(image[:, :, None], 3, axis=2)
    ids = [encode_maps[c] for c in label]
    padded = ids + [0] * (max_char_len - len(ids))

    def i64(v):
        return tf.train.Feature(int64_list=tf.train.Int64List(value=[v]))

    context = tf.train.Features(feature={
        'height': i64(image.shape[0]),
        'width': i64(image.shape[1]),
        'time_step': i64(time_step),
        'label_len': i64(len(ids)),
        'image_raw': tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[image.tobytes()])),
    })
    labels = tf.train.FeatureList(feature=[i64(v) for v in padded])
    return tf.train.SequenceExample(
        context=context,
        feature_lists=tf.train.FeatureLists(feature_list={'label': labels}))


def export_tfrecords(src: str, out_path: str) -> int:
    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    import tensorflow as tf
    from lstm_ctc_ocr_tpu.config import cfg, get_encode_decode_dict
    encode_maps, _ = get_encode_decode_dict()
    n = 0
    with tf.io.TFRecordWriter(out_path) as w:
        for label, img in iter_dataset(src):
            if len(label) > cfg.MAX_CHAR_LEN:
                print('skipping {}-char label {!r}: exceeds MAX_CHAR_LEN={}'
                      .format(len(label), label, cfg.MAX_CHAR_LEN))
                continue
            bad = [c for c in label if c not in encode_maps]
            if bad:
                print('skipping label {!r}: chars {} not in CHARSET'
                      .format(label, bad))
                continue
            ex = make_sequence_example(label, img, encode_maps,
                                       cfg.MAX_CHAR_LEN, cfg.IMG_SHAPE[0])
            w.write(ex.SerializeToString())
            n += 1
    return n


if __name__ == '__main__':
    ap = argparse.ArgumentParser(
        description='Export a records file or image dir to reference-format '
                    'TFRecords')
    ap.add_argument('src', help='.records file or image directory')
    ap.add_argument('--out', required=True, help='output .tfrecords path')
    args = ap.parse_args()
    n = export_tfrecords(args.src, args.out)
    print('exported {} records from {} -> {}'.format(n, args.src, args.out))
