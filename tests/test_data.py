"""Data pipeline: captcha renderer, reference batcher semantics, bucketing."""

import os
import random

import numpy as np
import pytest

from lstm_ctc_ocr_tpu.config import cfg, get_encode_decode_dict
from lstm_ctc_ocr_tpu.data.captcha import ImageCaptcha
from lstm_ctc_ocr_tpu.data import gen


def _rng():
    return random.Random(1234)


def test_captcha_renders_rgb_and_scales_width():
    cap = ImageCaptcha(fonts=[cfg.FONT])
    im = cap.generate_image('aZ3x', rng=_rng())
    assert im.mode == 'RGB'
    assert im.size == (160, 60)  # default canvas, like the captcha lib
    long_im = cap.generate_image('a' * 24, rng=_rng())
    assert long_im.size[0] > 400  # canvas widens for long-line configs


def test_captcha_has_ink():
    cap = ImageCaptcha(fonts=[cfg.FONT])
    arr = np.asarray(cap.generate_image('test99', rng=_rng()).convert('L'))
    # light background, dark glyphs: expect a real spread of intensities
    assert arr.max() > 200 and arr.min() < 120
    assert (arr < 140).mean() > 0.02  # at least 2% dark pixels


def test_gen_rand_length_and_charset():
    r = _rng()
    for _ in range(50):
        s = gen.gen_rand(r)
        assert cfg.MIN_LEN <= len(s) <= cfg.MAX_LEN
        assert all(c in cfg.CHARSET for c in s)


def test_group_batch_reference_semantics():
    """Golden checks of gen.py:41-67: resize, pad-to-x4, /255, transpose, flat labels."""
    enc, _ = get_encode_decode_dict()
    # two synthetic grayscale "images" of known sizes
    img1 = np.full((60, 160), 255, np.uint8)   # -> resized W = int(32/60*160)=85
    img2 = np.full((60, 100), 128, np.uint8)   # -> resized W = int(32/60*100)=53
    batch, label_vec, label_len, time_steps = gen.group_batch(
        [img1, img2], ['ab', 'c0z'])
    # resized widths 85, 53 -> max 85 -> padded to ceil(85/4)*4 = 88
    assert all(b.shape == (88, 32) for b in batch)
    # time_step = nw//4 - 1 on the *unpadded* width (gen.py:54)
    assert time_steps == [85 // 4 - 1, 53 // 4 - 1]
    assert label_len == [2, 3]
    assert label_vec == [enc['a'], enc['b'], enc['c'], enc['0'], enc['z']]
    # normalisation and zero right-pad
    assert batch[0].max() <= 1.0
    assert np.allclose(batch[1][53:, :], 0.0)   # padded region is black
    assert batch[0].dtype == np.float32


def test_pick_bucket():
    assert gen.pick_bucket(60, [64, 128]) == 64
    assert gen.pick_bucket(64, [64, 128]) == 64
    assert gen.pick_bucket(65, [64, 128]) == 128
    assert gen.pick_bucket(300, [64, 128]) == 512  # doubles past the largest


def test_bucket_batch_shapes_and_labels():
    enc, _ = get_encode_decode_dict()
    img1 = np.full((60, 160), 200, np.uint8)
    img2 = np.full((60, 100), 200, np.uint8)
    b = gen.bucket_batch([img1, img2], ['ab', 'c0z'], buckets=[96, 128])
    assert b.image.shape == (2, 96, 32)     # 85 fits in bucket 96
    assert b.label.shape[0] == 2
    assert b.label_len.tolist() == [2, 3]
    assert b.time_step.tolist() == [85 // 4 - 1, 53 // 4 - 1]
    assert b.label[0, :2].tolist() == [enc['a'], enc['b']]
    assert b.label[0, 2:].tolist() == [0] * (b.label.shape[1] - 2)
    assert b.flat_labels.tolist() == [enc['a'], enc['b'], enc['c'], enc['0'], enc['z']]


def test_generator_inline_stream():
    g = gen.get_batch(num_workers=0, batch_size=4, rng=_rng())
    b1 = next(g)
    b2 = next(g)
    assert b1.image.shape[0] == 4
    assert b1.image.shape[2] == 32
    assert b1.image.shape[1] in gen.pick_bucket(b1.image.shape[1]) * np.array([1])
    assert (b1.label_len >= cfg.MIN_LEN).all() and (b1.label_len <= cfg.MAX_LEN).all()
    assert not np.array_equal(b1.image, b2.image)
    g.close()


def test_inline_stream_is_seeded():
    """get_batch(num_workers=0, seed=S) is deterministic per stream — the
    documented contract the cached val batch relies on (engine/train.py)."""
    a = next(gen.get_batch(num_workers=0, seed=5, batch_size=4))
    b = next(gen.get_batch(num_workers=0, seed=5, batch_size=4))
    c = next(gen.get_batch(num_workers=0, seed=6, batch_size=4))
    np.testing.assert_array_equal(a.label, b.label)
    np.testing.assert_array_equal(a.image, b.image)
    assert not np.array_equal(a.label, c.label)


def test_bucket_batch_multichannel():
    """NCHANNELS=3 flattens channels into the NUM_FEATURES axis (reference
    config.py:27-28 layout), matching the eval loader."""
    old = dict(cfg)
    try:
        cfg.NCHANNELS = 3
        cfg.NUM_FEATURES = cfg.IMG_HEIGHT * 3
        rng = np.random.RandomState(0)
        imgs = [rng.randint(0, 256, (32, w, 3), np.uint8) for w in (40, 50)]
        batch = gen.bucket_batch(imgs, ['ab', 'cde'])
        assert batch.image.shape[2] == cfg.IMG_HEIGHT * 3
        # values survive the flatten round-trip (uint8 wire format: raw
        # pixels; the /255 normalization runs on device, network.py:apply)
        w = 40
        got = batch.image[0, :w].reshape(w, 32, 3)
        np.testing.assert_array_equal(got, imgs[0].swapaxes(0, 1))
    finally:
        cfg.clear()
        for k, v in old.items():
            cfg[k] = v


def test_records_filename_regex_case_insensitive():
    from lstm_ctc_ocr_tpu.data.records import parse_label_from_filename
    assert parse_label_from_filename('00000001_aB3.PNG') == 'aB3'
    assert parse_label_from_filename('00000001_aB3.png') == 'aB3'
    assert parse_label_from_filename('readme.txt') is None


def test_metrics_accuracy_and_label_helpers():
    from lstm_ctc_ocr_tpu.utils.metrics import (accuracy_calculation,
                                                merge_labels, restore_labels)
    org = [[1, 2, 3], [4, 5]]
    dec = [[1, 2, 3, 0, 0], [4, 0, 5]]  # 0s are stripped before compare
    assert accuracy_calculation(org, dec, ignore_value=0, verbose=False) == 1.0
    dec_bad = [[1, 2], [4, 5]]
    assert accuracy_calculation(org, dec_bad, ignore_value=0, verbose=False) == 0.5
    flat = [1, 2, 3, 4, 5]
    assert restore_labels(flat, [3, 2]) == [[1, 2, 3], [4, 5]]
    assert merge_labels([[1, 2, 0, 0], [3, 0]]).tolist() == [1, 2, 3]


def test_enqueuer_multiprocess_workers():
    """Real fork workers: decorrelated streams, clean stop (data_util.py:49-113)."""
    from lstm_ctc_ocr_tpu.data.enqueuer import GeneratorEnqueuer

    def factory():
        import random as _r
        while True:
            yield _r.random()

    enq = GeneratorEnqueuer(factory, seed=3)
    enq.start(workers=2, max_queue_size=4)
    try:
        vals = [enq.get(timeout=30.0) for _ in range(6)]
        assert len(set(vals)) > 1          # per-worker seeding decorrelates
        assert enq.is_running()
    finally:
        enq.stop()
    assert not enq.is_running()


def test_enqueuer_worker_failure_detected():
    """A crashing worker sets the stop event; the consumer raises instead of
    hanging (reference failure-detection contract, data_util.py:57-59)."""
    import pytest as _pytest
    from lstm_ctc_ocr_tpu.data.enqueuer import GeneratorEnqueuer

    def bad_factory():
        raise RuntimeError('boom')
        yield  # pragma: no cover

    enq = GeneratorEnqueuer(bad_factory, seed=0)
    enq.start(workers=1, max_queue_size=2)
    try:
        with _pytest.raises((RuntimeError, TimeoutError)):
            enq.get(timeout=20.0)
    finally:
        enq.stop()


def test_enqueuer_spawn_workers_product_stream():
    """'spawn' start method (safe under multi-threaded parents; future
    CPython default): the product factory must be picklable and a spawn
    worker must deliver real bucketed batches."""
    from lstm_ctc_ocr_tpu.data.gen import DeviceBatch, get_batch

    old = cfg.MP_START
    cfg.MP_START = 'spawn'
    try:
        stream = get_batch(num_workers=1, seed=5, batch_size=4,
                           bucketed=True)
        try:
            b = next(stream)
            assert isinstance(b, DeviceBatch)
            assert b.image.shape[0] == 4
            assert b.image.shape[1] in tuple(cfg.BUCKETS)
        finally:
            stream.close()
    finally:
        cfg.MP_START = old


def test_pool_cache_roundtrip(tmp_path, monkeypatch):
    """The pool's initial fill caches to disk and a second sampler loads it
    (same images/labels); a distribution change misses the cache."""
    monkeypatch.chdir(tmp_path)
    from lstm_ctc_ocr_tpu.config import cfg
    from lstm_ctc_ocr_tpu.data import pool as pool_mod
    old = (cfg.CHARSET, cfg.MIN_LEN, cfg.MAX_LEN)
    try:
        cfg.CHARSET, cfg.MIN_LEN, cfg.MAX_LEN = '0123456789', 2, 3
        a = pool_mod.PoolSampler(6, seed=3, verbose=False)
        assert os.path.exists(pool_mod._cache_path(6, 3))
        b = pool_mod.PoolSampler(6, seed=3, verbose=False)
        assert a.labels == b.labels
        for x, y in zip(a.images, b.images):
            np.testing.assert_array_equal(x, y)
        cfg.MAX_LEN = 4   # different distribution -> different cache key
        assert not os.path.exists(pool_mod._cache_path(6, 3))
    finally:
        cfg.CHARSET, cfg.MIN_LEN, cfg.MAX_LEN = old


def test_vis_batch_contact_sheet(tmp_path):
    """tools/vis_batch.py (the reference gen.py vis-hook equivalent): a
    synth host batch renders to a labeled contact-sheet PNG."""
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / 'sheet.png')
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    r = subprocess.run(
        [sys.executable, os.path.join(repo, 'tools', 'vis_batch.py'),
         '--n', '4', '--cols', '2', '--out', out,
         '--set', 'MIN_LEN', '2', 'MAX_LEN', '3'],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    from PIL import Image
    with Image.open(out) as im:
        assert im.size[0] > 50 and im.size[1] > 50
