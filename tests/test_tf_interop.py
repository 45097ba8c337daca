"""TF-interop round trip: TFRecord export (tools/export_tfrecords.py) and
TF1-checkpoint weight import (tools/import_tf_checkpoint.py).

Export parity target: the reference dev-branch SequenceExample schema
(/root/reference/lib/lstm/utils/tf_records.py:36-90). Weight-import parity
target: the reference's TF1 CRNN variable names (network.py conv/bi_lstm
scopes) -> this framework's params pytree via --pre_train
(engine/checkpoint.py:load_npy_pretrained).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

tf = pytest.importorskip('tensorflow')

from lstm_ctc_ocr_tpu.config import cfg, get_encode_decode_dict  # noqa: E402
from lstm_ctc_ocr_tpu.data.records import (  # noqa: E402
    RecordsDataset, RecordsWriter)
from export_tfrecords import export_tfrecords  # noqa: E402
from import_tfrecords import import_tfrecords  # noqa: E402
from import_tf_checkpoint import convert_tf_checkpoint, map_variable  # noqa: E402


# --- TFRecord export ---------------------------------------------------------

def _sample_examples(seed=0, n=3):
    rng = np.random.RandomState(seed)
    labels = ['aB3x', 'Zz90qQ', '7H1', 'mN5', 'q2']
    return [(labels[i % len(labels)],
             rng.randint(0, 256, size=(32, 60 + 20 * i), dtype=np.uint8))
            for i in range(n)]


def test_export_schema_matches_reference(tmp_path):
    """Exported protos carry the exact context keys / FeatureList layout the
    reference's reader parses (tf_records.py:166-178)."""
    examples = _sample_examples()
    rec = str(tmp_path / 'src.records')
    with RecordsWriter(rec) as w:
        for label, img in examples:
            w.add(label, img)
    tfr = str(tmp_path / 'out.tfrecords')
    assert export_tfrecords(rec, tfr) == len(examples)

    encode_maps, _ = get_encode_decode_dict()
    raws = list(tf.data.TFRecordDataset(tfr).as_numpy_iterator())
    assert len(raws) == len(examples)
    for raw, (label, img) in zip(raws, examples):
        ex = tf.train.SequenceExample.FromString(raw)
        ctx = ex.context.feature
        assert sorted(ctx.keys()) == ['height', 'image_raw', 'label_len',
                                      'time_step', 'width']
        h = ctx['height'].int64_list.value[0]
        w_ = ctx['width'].int64_list.value[0]
        assert (h, w_) == img.shape
        assert ctx['time_step'].int64_list.value[0] == cfg.IMG_SHAPE[0]
        assert ctx['label_len'].int64_list.value[0] == len(label)
        # RGB bytes, reshapable the way the reference reader does (:189)
        rgb = np.frombuffer(ctx['image_raw'].bytes_list.value[0],
                            np.uint8).reshape(h, w_, 3)
        for c in range(3):
            np.testing.assert_array_equal(rgb[..., c], img)
        ids = [f.int64_list.value[0]
               for f in ex.feature_lists.feature_list['label'].feature]
        assert len(ids) == cfg.MAX_CHAR_LEN
        assert ids[:len(label)] == [encode_maps[c] for c in label]
        assert all(v == 0 for v in ids[len(label):])


def test_export_import_roundtrip_lossless(tmp_path):
    """records -> export -> import -> records is byte-identical."""
    examples = _sample_examples(seed=7, n=4)
    rec = str(tmp_path / 'src.records')
    with RecordsWriter(rec) as w:
        for label, img in examples:
            w.add(label, img)
    tfr = str(tmp_path / 'mid.tfrecords')
    back = str(tmp_path / 'back.records')
    export_tfrecords(rec, tfr)
    assert import_tfrecords(tfr, back) == len(examples)
    ds = RecordsDataset(back)
    for i, (label, img) in enumerate(examples):
        got_label, got_img = ds.get(i)
        assert got_label == label
        np.testing.assert_array_equal(got_img, img)


def test_export_from_image_dir(tmp_path):
    from PIL import Image
    d = tmp_path / 'imgs'
    d.mkdir()
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(32, 80), dtype=np.uint8)
    Image.fromarray(img).save(str(d / '00000000_ab12.png'))
    (d / 'notes.txt').write_text('ignored: no label pattern')
    tfr = str(tmp_path / 'dir.tfrecords')
    assert export_tfrecords(str(d), tfr) == 1
    back = str(tmp_path / 'dir.records')
    import_tfrecords(tfr, back)
    got_label, got_img = RecordsDataset(back).get(0)
    assert got_label == 'ab12'
    np.testing.assert_array_equal(got_img, img)


# --- TF1 checkpoint import ---------------------------------------------------

def _reference_style_checkpoint(path):
    """Create a TF1-style checkpoint with the reference CRNN's variable
    names (conv scopes network.py:167-170, BatchNorm :176-178 — contrib
    batch_norm(scope=name) nested in variable_scope(name), so the scope
    appears TWICE: conv4_1/conv4_1/gamma — bidirectional_rnn cells
    :104-107, projection :123-125) + Adam slots, random values. conv4_2
    carries the BatchNorm default-scope spelling to cover the fallback."""
    rng = np.random.RandomState(42)
    shapes = {
        'conv1/weights': (3, 3, 1, 8),
        'conv1/biases': (8,),
        'conv4_1/weights': (3, 3, 8, 16),
        'conv4_1/biases': (16,),
        'conv4_1/conv4_1/gamma': (16,),
        'conv4_1/conv4_1/beta': (16,),
        'conv4_1/conv4_1/moving_mean': (16,),
        'conv4_1/conv4_1/moving_variance': (16,),
        'conv4_2/weights': (3, 3, 16, 16),
        'conv4_2/BatchNorm/gamma': (16,),
        'conv4_2/BatchNorm/beta': (16,),
        'logits/bidirectional_rnn/fw/lstm_cell/kernel': (24, 32),
        'logits/bidirectional_rnn/fw/lstm_cell/bias': (32,),
        'logits/bidirectional_rnn/bw/lstm_cell/kernel': (24, 32),
        'logits/bidirectional_rnn/bw/lstm_cell/bias': (32,),
        'logits/weights': (16, 64),
        'logits/biases': (64,),
        'conv1/weights/Adam': (3, 3, 1, 8),
        'conv1/weights/Adam_1': (3, 3, 1, 8),
        'beta1_power': (),
        'beta2_power': (),
    }
    values = {n: rng.standard_normal(s).astype(np.float32)
              for n, s in shapes.items()}
    g = tf.Graph()
    with g.as_default():
        tfvars = {n: tf.compat.v1.get_variable(n, initializer=v)
                  for n, v in values.items()}
        saver = tf.compat.v1.train.Saver(var_list=tfvars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, path)
    return values


def test_ckpt_import_maps_reference_names(tmp_path):
    ckpt = str(tmp_path / 'ref_model.ckpt')
    values = _reference_style_checkpoint(ckpt)
    out = str(tmp_path / 'pretrain.npy')
    tree = convert_tf_checkpoint(ckpt, out)

    np.testing.assert_array_equal(tree['conv1']['kernel'],
                                  values['conv1/weights'])
    np.testing.assert_array_equal(tree['conv1']['biases'],
                                  values['conv1/biases'])
    np.testing.assert_array_equal(tree['conv4_1']['bn_gamma'],
                                  values['conv4_1/conv4_1/gamma'])
    np.testing.assert_array_equal(tree['conv4_1']['bn_beta'],
                                  values['conv4_1/conv4_1/beta'])
    # default-scope spelling (scope=None contrib graphs) still maps
    np.testing.assert_array_equal(tree['conv4_2']['bn_gamma'],
                                  values['conv4_2/BatchNorm/gamma'])
    for d in ('fw', 'bw'):
        np.testing.assert_array_equal(
            tree['logits']['cells'][d]['kernel'],
            values['logits/bidirectional_rnn/{}/lstm_cell/kernel'.format(d)])
        np.testing.assert_array_equal(
            tree['logits']['cells'][d]['bias'],
            values['logits/bidirectional_rnn/{}/lstm_cell/bias'.format(d)])
    np.testing.assert_array_equal(tree['logits']['weights'],
                                  values['logits/weights'])
    # moving stats + optimizer slots must NOT leak into the dict
    assert 'bn_moving_mean' not in tree['conv4_1']
    assert not any('Adam' in k for k in tree.get('conv1', {}))
    # and the .npy on disk loads back identically
    loaded = np.load(out, allow_pickle=True).item()
    np.testing.assert_array_equal(loaded['logits']['biases'],
                                  values['logits/biases'])


def test_ckpt_import_feeds_pre_train(tmp_path):
    """End to end: TF1 ckpt -> .npy -> load_npy_pretrained into the real
    LSTM_train params tree (the --pre_train path, train.py contract)."""
    import jax
    from lstm_ctc_ocr_tpu.engine.checkpoint import load_npy_pretrained
    from lstm_ctc_ocr_tpu.models.factory import get_network

    net = get_network('LSTM_train')
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (2, 96, 32), 'time_step_len': (2,)})

    rng = np.random.RandomState(11)
    names = {
        'conv1/weights': np.shape(params['conv1']['kernel']),
        'conv1/biases': np.shape(params['conv1']['biases']),
        'conv4_1/conv4_1/gamma': np.shape(params['conv4_1']['bn_gamma']),
        'logits/bidirectional_rnn/fw/lstm_cell/kernel':
            np.shape(params['logits']['cells']['fw']['kernel']),
        'logits/weights': np.shape(params['logits']['weights']),
        # a head with the wrong NCLASSES: skipped under ignore_missing,
        # matching reference Network.load semantics (network.py:57-63)
        'logits/biases': (np.shape(params['logits']['biases'])[0] + 7,),
    }
    values = {n: rng.randn(*s).astype(np.float32) for n, s in names.items()}
    g = tf.Graph()
    with g.as_default():
        tfvars = {n: tf.compat.v1.get_variable(n, initializer=v)
                  for n, v in values.items()}
        saver = tf.compat.v1.train.Saver(var_list=tfvars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, str(tmp_path / 'partial.ckpt'))

    out = str(tmp_path / 'partial.npy')
    convert_tf_checkpoint(str(tmp_path / 'partial.ckpt'), out)
    loaded = load_npy_pretrained(params, out, ignore_missing=True)

    np.testing.assert_array_equal(np.asarray(loaded['conv1']['kernel']),
                                  values['conv1/weights'])
    np.testing.assert_array_equal(
        np.asarray(loaded['logits']['cells']['fw']['kernel']),
        values['logits/bidirectional_rnn/fw/lstm_cell/kernel'])
    np.testing.assert_array_equal(np.asarray(loaded['logits']['weights']),
                                  values['logits/weights'])
    # untouched layer keeps its init; mismatched head was skipped
    np.testing.assert_array_equal(np.asarray(loaded['conv2']['kernel']),
                                  np.asarray(params['conv2']['kernel']))
    np.testing.assert_array_equal(np.asarray(loaded['logits']['biases']),
                                  np.asarray(params['logits']['biases']))


def test_map_variable_rejects_unknown():
    path, reason = map_variable('totally/unknown/thing', (3,))
    assert path is None and reason
    path, reason = map_variable('conv1/weights/Adam', (3, 3, 1, 8))
    assert path is None and reason == 'optimizer slot'
