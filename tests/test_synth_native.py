"""Native C++ captcha renderer (native/synth.cpp): contract tests.

Covers the ctypes surface (shapes, determinism, width reporting), the
``cfg.RENDERER='native'`` dispatch through data/gen.py (generate_img and
bucket_batch integration), and distribution sanity vs the PIL renderer
(light background, dark ink, comparable ink fraction). The PIL renderer
(data/captcha.py) remains the parity default; this backend replaces the
per-image host hot loop of reference gen.py:31-37.
"""

import os

import numpy as np
import pytest

from lstm_ctc_ocr_tpu.config import cfg, resolve_font
from lstm_ctc_ocr_tpu.native import synth


@pytest.fixture(scope='module')
def atlas():
    return synth.get_atlas(str(cfg.CHARSET), resolve_font())


def test_render_batch_shapes_and_widths(atlas):
    labels = ['abc123', 'XYZ9', 'q']
    imgs, widths = synth.render_batch(labels, atlas, seed=1, out_h=32)
    assert imgs.shape == (3, 32, 1024) and imgs.dtype == np.uint8
    assert widths.shape == (3,)
    # wider strings render wider; every width within the buffer
    assert widths[0] > widths[2]
    assert (widths > 0).all() and (widths <= 1024).all()
    for i, w in enumerate(widths):
        # rows past the reported width stay zero (bucket pad contract)
        assert imgs[i, :, w:].max() == 0
        # inside the width: light background present
        assert imgs[i, :, :w].max() > 180


def test_render_batch_deterministic_in_seed(atlas):
    labels = ['abc123', 'XYZ9']
    a = synth.render_batch(labels, atlas, seed=99)
    b = synth.render_batch(labels, atlas, seed=99)
    c = synth.render_batch(labels, atlas, seed=100)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    assert not np.array_equal(a[0], c[0])


def test_render_has_ink_per_character(atlas):
    """Each glyph must leave dark ink: a long string produces a larger
    dark-pixel count than a short one under the same seed."""
    (long_img,), (lw,) = synth.render_batch(['abcdefgh'], atlas, seed=5)
    (short_img,), (sw,) = synth.render_batch(['ab'], atlas, seed=5)
    dark_long = int((long_img[:, :lw] < 100).sum())
    dark_short = int((short_img[:, :sw] < 100).sum())
    assert dark_long > dark_short > 20


def test_generate_img_native_dispatch():
    """RENDERER='native' flows through data/gen.py: grayscale array at
    model height, no PIL conversion needed."""
    import random
    from lstm_ctc_ocr_tpu.data import gen
    old = cfg.RENDERER
    try:
        cfg.RENDERER = 'native'
        img, label = gen.generate_img(random.Random(3))
        assert img.ndim == 2 and img.shape[0] == int(cfg.IMG_HEIGHT)
        assert img.dtype == np.uint8
        assert int(cfg.MIN_LEN) <= len(label) <= int(cfg.MAX_LEN)
    finally:
        cfg.RENDERER = old


def test_native_bucket_batch_contract():
    """End to end through bucket_batch: static bucket width, dense labels,
    reference time_step arithmetic (W/4-1)."""
    import random
    from lstm_ctc_ocr_tpu.data import gen
    old = cfg.RENDERER
    try:
        cfg.RENDERER = 'native'
        rng = random.Random(0)
        pairs = [gen.generate_img(rng) for _ in range(8)]
        batch = gen.bucket_batch([p[0] for p in pairs], [p[1] for p in pairs])
        n, w, f = batch.image.shape
        assert n == 8 and f == int(cfg.NUM_FEATURES)
        # default transfer contract: raw uint8 pixels, /255 happens on device
        assert batch.image.dtype == np.uint8
        # time_step is per-image (true width), not the bucket width
        want = [p[0].shape[1] // int(cfg.POOL_SCALE) + int(cfg.OFFSET_TIME_STEP)
                for p in pairs]
        assert (batch.time_step == want).all()
        assert (batch.label_len == [len(p[1]) for p in pairs]).all()
    finally:
        cfg.RENDERER = old


def test_native_distribution_close_to_pil(atlas):
    """Same gross statistics as the PIL renderer at model height: light
    mean, nontrivial ink fraction in the same ballpark."""
    import random
    from lstm_ctc_ocr_tpu.data import captcha, gen
    labels = ['abc123', 'XYZ9wq', 'Hello4', '0Oo1lI'] * 4
    imgs, widths = synth.render_batch(labels, atlas, seed=11)
    nat = np.concatenate([imgs[i, :, :widths[i]].reshape(-1)
                          for i in range(len(labels))])
    r = random.Random(11)
    pil_r = captcha.ImageCaptcha(fonts=[resolve_font()])
    pil_pixels = []
    for lab in labels:
        arr = np.asarray(pil_r.generate_image(lab, rng=r).convert('L'))
        pil_pixels.append(gen._resize_keep_aspect(arr, 32).reshape(-1))
    pil = np.concatenate(pil_pixels)
    ink_nat = float((nat < 128).mean())
    ink_pil = float((pil < 128).mean())
    assert abs(float(nat.mean()) - float(pil.mean())) < 25
    assert 0.3 < ink_nat / max(ink_pil, 1e-6) < 3.0


@pytest.mark.skipif(os.environ.get('RUN_PERF_TESTS') != '1',
                    reason='wall-clock ratio assert; flaky under full-suite '
                           'load on a 1-core host. The speed claim is '
                           'measured by tools/bench_data.py; set '
                           'RUN_PERF_TESTS=1 to run it here on an idle host')
def test_native_faster_than_pil(atlas):
    """The point of the backend: at least 4x the PIL path per image on
    this host (measured ~12x; generous bar for CI noise)."""
    import random
    import time
    from lstm_ctc_ocr_tpu.data import captcha, gen
    labels = ['abc123'] * 30
    synth.render_batch(labels, atlas, seed=0)        # warm build/load
    native_dt = float('inf')
    for rep in range(3):                             # best-of-3: 1-core host
        t0 = time.perf_counter()
        synth.render_batch(labels, atlas, seed=1 + rep)
        native_dt = min(native_dt, time.perf_counter() - t0)

    r = random.Random(1)
    pil_r = captcha.ImageCaptcha(fonts=[resolve_font()])
    pil_r.generate_image('abc123', rng=r)            # warm font cache
    pil_dt = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for lab in labels:
            arr = np.asarray(pil_r.generate_image(lab, rng=r).convert('L'))
            gen._resize_keep_aspect(arr, 32)
        pil_dt = min(pil_dt, time.perf_counter() - t0)
    assert native_dt * 4 < pil_dt, (native_dt, pil_dt)
