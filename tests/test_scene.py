"""Scene-text renderer (BASELINE config #5): photo-like lines flow through
the standard generator/bucketer pipeline with readable contrast."""

import copy
import random

import numpy as np
import pytest

from lstm_ctc_ocr_tpu.config import cfg
from lstm_ctc_ocr_tpu.data.scene import SceneTextRenderer


@pytest.fixture(autouse=True)
def _restore_cfg():
    snapshot = copy.deepcopy(dict(cfg))
    yield
    cfg.clear()
    for k, v in snapshot.items():
        cfg[k] = v


def test_renders_deterministic_shape_and_contrast():
    r = SceneTextRenderer()
    rng = random.Random(3)
    img = np.asarray(r.generate_image('He1lo42', rng=rng).convert('L'))
    assert img.shape[0] == 60
    assert img.shape[1] > 60                 # auto-width for the string
    # text must be separable from background: meaningful dynamic range
    assert int(img.max()) - int(img.min()) > 60


def test_generate_img_dispatch_and_bucketing():
    from lstm_ctc_ocr_tpu.data import gen
    cfg.RENDERER = 'scene'
    rng = random.Random(7)
    imgs, labels = [], []
    for _ in range(4):
        im, lab = gen.generate_img(rng)
        assert im.ndim == 2                  # grayscale
        imgs.append(im)
        labels.append(lab)
    b = gen.bucket_batch(imgs, labels)
    assert b.image.shape[0] == 4 and b.image.shape[2] == cfg.NUM_FEATURES
    assert b.image.shape[1] in cfg.BUCKETS or b.image.shape[1] >= cfg.BUCKETS[-1]
    assert (b.time_step > 0).all()
    assert (b.label > 0).sum() == b.label_len.sum()


def test_write_roundtrip(tmp_path):
    p = str(tmp_path / '00000001_aB3.png')
    SceneTextRenderer().write('aB3', p, rng=random.Random(0))
    from lstm_ctc_ocr_tpu.data.records import parse_label_from_filename
    assert parse_label_from_filename(p.split('/')[-1]) == 'aB3'
    import PIL.Image
    assert PIL.Image.open(p).size[1] == 60
