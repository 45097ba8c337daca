"""One-program-per-bucket invariant: no silent recompiles after warmup.

The whole TPU performance story rests on width buckets (cfg.BUCKETS,
data/gen.py bucket_batch): every host batch is padded to a bucket width so
XLA compiles exactly one train-step executable per bucket and never again
(engine/train.py module docstring; SURVEY.md §5 long-context rebuild). A
stray non-bucket width — a future data-pipeline edit, a missed pad — would
recompile every few steps and only surface as mysterious slowness over the
TPU tunnel. These tests make that a CI failure instead:

* the real batchers (synth stream and records path) must emit ONLY widths
  in cfg.BUCKETS;
* driving the real jitted train step across several buckets must leave the
  jit cache with exactly one entry per distinct bucket touched.
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg


@pytest.fixture
def small_cfg():
    old = copy.deepcopy(dict(cfg))
    cfg.TRAIN.DTYPE = 'float32'
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.NUM_WORKERS = 0
    cfg.PARALLEL = 'off'
    yield
    cfg.clear()
    for k, v in old.items():
        cfg[k] = v


def test_synth_stream_emits_only_bucket_widths(small_cfg):
    from lstm_ctc_ocr_tpu.data.gen import get_batch
    stream = get_batch(num_workers=0, seed=0, batch_size=4, bucketed=True)
    try:
        widths = {next(stream).image.shape[1] for _ in range(40)}
    finally:
        stream.close()
    assert widths <= set(int(b) for b in cfg.BUCKETS), \
        'batcher leaked non-bucket widths: {}'.format(
            sorted(widths - set(cfg.BUCKETS)))
    # the default 4-6 char config genuinely hops buckets — otherwise the
    # cache assertion below would pass vacuously
    assert len(widths) >= 2, widths


def test_train_step_compiles_once_per_bucket(small_cfg):
    """Drive the REAL donated train step across >=3 buckets, revisiting each
    several times; the jit cache must hold exactly one executable per
    distinct (bucketed) input shape."""
    from lstm_ctc_ocr_tpu.engine.train import make_optimizer, make_train_step
    from lstm_ctc_ocr_tpu.models.factory import get_network

    n = 4
    buckets = [int(b) for b in cfg.BUCKETS[:3]]
    net = get_network('LSTM_train')
    params = net.init_params(
        jax.random.PRNGKey(0),
        {'data': (n, buckets[0], 32), 'time_step_len': (n,)})
    tx = make_optimizer()
    opt_state = tx.init(params)
    bn_state = net.init_bn_state()
    step = make_train_step(net, tx, None)

    rng = np.random.RandomState(0)

    def batch(w):
        image = rng.rand(n, w, 32).astype(np.float32)
        label = rng.randint(1, 20, size=(n, 6)).astype(np.int32)
        label_len = rng.randint(4, 7, size=(n,)).astype(np.int32)
        time_step = np.full((n,), w // 4 - 1, np.int32)
        return tuple(jnp.asarray(a) for a in
                     (image, label, label_len, time_step))

    # 4 passes over the bucket set, interleaved like real training
    it = 0
    for _ in range(4):
        for w in buckets:
            params, opt_state, bn_state, total, _ = step(
                params, opt_state, bn_state, *batch(w), it)
            it += 1
    assert np.isfinite(float(total))
    assert step._cache_size() == len(buckets), \
        'expected one compiled program per bucket ({}), jit cache holds ' \
        '{} — something retraces after warmup'.format(
            len(buckets), step._cache_size())


def test_records_iterator_emits_only_bucket_widths(small_cfg, tmp_path):
    from lstm_ctc_ocr_tpu.data.gen import generate_img
    from lstm_ctc_ocr_tpu.data.records import RecordsDataset, RecordsWriter

    import random
    rnd = random.Random(1)
    path = str(tmp_path / 't.records')
    with RecordsWriter(path) as w:
        for _ in range(24):
            img, label = generate_img(rnd)
            w.add(label, img)
    ds = RecordsDataset(path)
    it = ds.batch_iterator(4, shuffle=True, seed=0)
    widths = set()
    for _ in range(12):
        b = next(it)
        widths.add(b.image.shape[1])
    assert widths <= set(int(b) for b in cfg.BUCKETS), widths
