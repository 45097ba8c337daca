"""TFRecord migration importer (tools/import_tfrecords.py) vs the reference
dev-branch SequenceExample schema (tf_records.py:36-90): write a file with
the reference's exact proto layout, import, and round-trip through the
records backend.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

tf = pytest.importorskip('tensorflow')

from lstm_ctc_ocr_tpu.config import cfg, get_encode_decode_dict  # noqa: E402
from lstm_ctc_ocr_tpu.data.records import RecordsDataset  # noqa: E402
from import_tfrecords import import_tfrecords  # noqa: E402


def _reference_style_tfrecord(path, examples):
    """Serialize (label, rgb image) pairs exactly as the reference writer
    does (tf_records.py:47-86): int64 context scalars, raw uint8 bytes,
    one int64 Feature per padded label id."""
    encode_maps, _ = get_encode_decode_dict()

    def i64(v):
        return tf.train.Feature(int64_list=tf.train.Int64List(value=[v]))

    with tf.io.TFRecordWriter(path) as w:
        for label, img in examples:
            code = [encode_maps[c] for c in label]
            aligned = code + [0] * (cfg.MAX_CHAR_LEN - len(code))
            ex = tf.train.SequenceExample(
                context=tf.train.Features(feature={
                    'height': i64(img.shape[0]),
                    'width': i64(img.shape[1]),
                    'time_step': i64(int(cfg.IMG_SHAPE[0])),
                    'label_len': i64(len(code)),
                    'image_raw': tf.train.Feature(
                        bytes_list=tf.train.BytesList(
                            value=[img.tobytes()])),
                }),
                feature_lists=tf.train.FeatureLists(feature_list={
                    'label': tf.train.FeatureList(
                        feature=[i64(v) for v in aligned]),
                }))
            w.write(ex.SerializeToString())


def test_import_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    examples = []
    for label in ['aB3x', 'Zz90qQ', '7H1']:
        img = rng.randint(0, 256, size=(60, 160, 3), dtype=np.uint8)
        examples.append((label, img))
    tfr = str(tmp_path / 'ref.tfrecords')
    out = str(tmp_path / 'native.records')
    _reference_style_tfrecord(tfr, examples)

    n = import_tfrecords(tfr, out)
    assert n == 3

    ds = RecordsDataset(out)
    assert len(ds) == 3
    for i, (label, img) in enumerate(examples):
        got_label, got_img = ds.get(i)
        assert got_label == label
        assert got_img.shape == (60, 160)
        # grayscale via the standard luma weights
        want = np.round(0.299 * img[..., 0] + 0.587 * img[..., 1]
                        + 0.114 * img[..., 2]).astype(np.uint8)
        np.testing.assert_array_equal(got_img, want)


def test_import_grayscale_passthrough(tmp_path):
    """Single-channel image_raw payloads import without conversion."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(32, 80), dtype=np.uint8)
    tfr = str(tmp_path / 'gray.tfrecords')
    _reference_style_tfrecord(tfr, [('abc', img)])
    out = str(tmp_path / 'gray.records')
    assert import_tfrecords(tfr, out) == 1
    got_label, got_img = RecordsDataset(out).get(0)
    assert got_label == 'abc'
    np.testing.assert_array_equal(got_img, img)
