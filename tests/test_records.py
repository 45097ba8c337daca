"""Records dataset: write/read roundtrip, filename label parsing, batching,
pool sampler (dev-branch path parity, SURVEY.md section 2)."""

import numpy as np
import pytest

from lstm_ctc_ocr_tpu.config import cfg
from lstm_ctc_ocr_tpu.data.records import (RecordsDataset, RecordsWriter,
                                           parse_label_from_filename,
                                           write_image_annotation_pairs_to_records)


def test_parse_label_from_filename():
    assert parse_label_from_filename('00000012_aB3x.png') == 'aB3x'
    assert parse_label_from_filename('7_z9.jpg') == 'z9'
    assert parse_label_from_filename('noidx.png') is None
    assert parse_label_from_filename('1_bad-label.png') is None


def test_records_roundtrip(tmp_path):
    path = str(tmp_path / 't.records')
    rng = np.random.RandomState(0)
    items = [('ab12', rng.randint(0, 255, (60, 160), dtype=np.uint8)),
             ('Zz9', rng.randint(0, 255, (60, 100), dtype=np.uint8)),
             ('q0Xy7L', rng.randint(0, 255, (60, 220), dtype=np.uint8))]
    with RecordsWriter(path) as w:
        for lab, img in items:
            w.add(lab, img)
    ds = RecordsDataset(path)
    assert len(ds) == 3
    for i, (lab, img) in enumerate(items):
        l2, i2 = ds.get(i)
        assert l2 == lab
        np.testing.assert_array_equal(i2, img)
    ds.close()


def test_records_batch_iterator(tmp_path):
    path = str(tmp_path / 't.records')
    rng = np.random.RandomState(1)
    with RecordsWriter(path) as w:
        for i in range(10):
            w.add('abcd', rng.randint(0, 255, (60, 160), dtype=np.uint8))
    ds = RecordsDataset(path)
    it = ds.batch_iterator(batch_size=4, shuffle=True, seed=0, epochs=2)
    batches = list(it)
    assert len(batches) == 4          # floor(10/4) per epoch x 2
    b = batches[0]
    assert b.image.shape[0] == 4 and b.image.shape[2] == 32
    assert (b.label_len == 4).all()
    # time_step from actual width (no stale cfg.TIME_STEP crash: fixed quirk)
    assert (b.time_step == int(32 / 60 * 160) // 4 - 1).all()
    ds.close()


def test_write_from_image_dir(tmp_path):
    import cv2
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    rng = np.random.RandomState(2)
    for i, lab in enumerate(['ab', 'xyz9']):
        cv2.imwrite(str(img_dir / '{:08d}_{}.png'.format(i, lab)),
                    rng.randint(0, 255, (60, 160), dtype=np.uint8))
    (img_dir / 'ignore_me.txt').write_text('x')
    out = str(tmp_path / 'd.records')
    n = write_image_annotation_pairs_to_records(str(img_dir), out)
    assert n == 2
    ds = RecordsDataset(out)
    assert ds.get(0)[0] == 'ab'
    assert ds.get(1)[0] == 'xyz9'
    ds.close()


def test_pool_sampler():
    from lstm_ctc_ocr_tpu.data.pool import PoolSampler
    pool = PoolSampler(size=12, seed=0, verbose=False)
    b = pool.sample_batch(4)
    assert b.image.shape[0] == 4
    assert (b.label_len >= cfg.MIN_LEN).all()
    before = [img.tobytes() for img in pool.images]
    pool.refresh(3)
    after = [img.tobytes() for img in pool.images]
    assert sum(a != b for a, b in zip(before, after)) >= 1
