"""Serialized record dataset: the dev-branch TFRecord path, TPU-native.

Role-equivalent of the reference's TFRecord writer/reader
(/root/reference/lib/lstm/utils/tf_records.py): the writer walks an image
directory, parses the label from the ``{idx}_{label}.png`` filename
(tf_records.py:54), and serializes (label, grayscale image) pairs; the
reader streams shuffled, width-bucketed device batches.

The container is a from-scratch binary format rather than TFRecord —
simple length-prefixed records over mmap with a trailing index, no TF
dependency, O(1) random access (the property ``shuffle_batch`` needed a
9600-element queue to fake, train.py:42-46):

    [magic 'LCOR'][u32 version]
    per record: [u32 payload_len][payload]
    payload: [u16 label_len][label ascii][u16 h][u16 w][h*w uint8 pixels]
    trailer:  [u64 offsets[n]][u64 n][magic 'XIDX']

Images are stored at their native rendered size; height-32 resize and
bucket padding happen at batch time (same code path as the synth backend,
so train-time semantics are identical between backends).

Consciously fixed reference quirk: the dev-path reader crashes on a stale
``cfg.TIME_STEP`` (tf_records.py:192, commented out of config) — our
reader derives time steps from image widths like the live path.
"""

from __future__ import annotations

import mmap
import os
import re
import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..config import cfg
from .gen import DeviceBatch, bucket_batch

MAGIC = b'LCOR'
IDX_MAGIC = b'XIDX'
VERSION = 1

_LABEL_RE = re.compile(r'^\d+_([0-9a-zA-Z]+)\.(png|jpg|jpeg|bmp)$',
                       re.IGNORECASE)


def parse_label_from_filename(fname: str) -> Optional[str]:
    """``{idx}_{label}.png`` -> label (reference tf_records.py:54, test.py:82)."""
    m = _LABEL_RE.match(os.path.basename(fname))
    return m.group(1) if m else None


class RecordsWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, 'wb')
        self._f.write(MAGIC)
        self._f.write(struct.pack('<I', VERSION))
        self._offsets: List[int] = []

    def add(self, label: str, image: np.ndarray) -> None:
        assert image.dtype == np.uint8 and image.ndim == 2, \
            'records store grayscale uint8 images'
        lab = label.encode('ascii')
        h, w = image.shape
        payload = struct.pack('<H', len(lab)) + lab + \
            struct.pack('<HH', h, w) + image.tobytes()
        self._offsets.append(self._f.tell())
        self._f.write(struct.pack('<I', len(payload)))
        self._f.write(payload)

    def close(self) -> None:
        for off in self._offsets:
            self._f.write(struct.pack('<Q', off))
        self._f.write(struct.pack('<Q', len(self._offsets)))
        self._f.write(IDX_MAGIC)
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def iter_labeled_images(img_dir: str):
    """Yield (label, grayscale uint8 image) for every ``{idx}_{label}.png``
    in ``img_dir`` — the ONE directory-walk used by the records writer and
    the TFRecord exporter, so their decode semantics cannot drift."""
    import cv2
    for fname in sorted(os.listdir(img_dir)):
        label = parse_label_from_filename(fname)
        if label is None:
            continue
        img = cv2.imread(os.path.join(img_dir, fname), 0)
        if img is None:
            continue
        yield label, img.astype(np.uint8)


def write_image_annotation_pairs_to_records(img_dir: str, out_path: str) -> int:
    """Walk ``img_dir``, parse filename labels, write a records file.

    Reference parity: write_image_annotation_pairs_to_tfrecord
    (tf_records.py:36-90). Returns the number of records written.
    """
    n = 0
    with RecordsWriter(out_path) as w:
        for label, img in iter_labeled_images(img_dir):
            w.add(label, img)
            n += 1
    return n


class RecordsDataset:
    """mmap-backed random-access reader.

    ``cache_resized`` keeps each image's height-32 resize from its first
    use (the per-batch cv2 resize is the hot host op on 1-core hosts —
    same trick as the pool backend). Memory: ~IMG_HEIGHT * mean_width
    bytes per example (~0.3 GB for a 100k-example captcha set); disable
    for huge datasets.
    """

    def __init__(self, path: str, cache_resized: bool = True):
        self.path = path
        self._resized = {} if cache_resized else None
        self._file = open(path, 'rb')
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        assert self._mm[:4] == MAGIC, 'not a records file: {}'.format(path)
        (version,) = struct.unpack_from('<I', self._mm, 4)
        assert version == VERSION, 'records version {} unsupported'.format(version)
        assert self._mm[-4:] == IDX_MAGIC, 'records file missing index trailer'
        (n,) = struct.unpack_from('<Q', self._mm, len(self._mm) - 12)
        idx_start = len(self._mm) - 12 - 8 * n
        # copy out of the mmap so no exported buffers pin it open
        self._offsets = np.array(np.frombuffer(self._mm, np.uint64, count=n,
                                               offset=idx_start))

    def __len__(self) -> int:
        return len(self._offsets)

    def get(self, i: int) -> Tuple[str, np.ndarray]:
        off = int(self._offsets[i])
        (plen,) = struct.unpack_from('<I', self._mm, off)
        p = off + 4
        (lab_len,) = struct.unpack_from('<H', self._mm, p)
        p += 2
        label = self._mm[p:p + lab_len].decode('ascii')
        p += lab_len
        h, w = struct.unpack_from('<HH', self._mm, p)
        p += 4
        img = np.array(np.frombuffer(self._mm, np.uint8, count=h * w,
                                     offset=p)).reshape(h, w)
        return label, img

    def get_at_model_height(self, i: int) -> Tuple[str, np.ndarray]:
        """(label, image resized to cfg.IMG_HEIGHT), cached when enabled."""
        from .gen import _resize_keep_aspect
        if self._resized is not None and i in self._resized:
            return self._resized[i]
        label, img = self.get(i)
        if img.shape[0] != int(cfg.IMG_HEIGHT):
            img = _resize_keep_aspect(img, int(cfg.IMG_HEIGHT))
        if self._resized is not None:
            self._resized[i] = (label, img)
        return label, img

    def batch_iterator(self, batch_size: int, shuffle: bool = True,
                       seed: int = 0, epochs: Optional[int] = None
                       ) -> Iterator[DeviceBatch]:
        """Shuffled width-bucketed DeviceBatch stream (shuffle_batch parity,
        train.py:40-47, minus the queue machinery)."""
        rng = np.random.RandomState(seed)
        n = len(self)
        assert n >= batch_size, 'dataset smaller than one batch'
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(n) if shuffle else np.arange(n)
            for start in range(0, n - batch_size + 1, batch_size):
                idx = order[start:start + batch_size]
                pairs = [self.get_at_model_height(int(i)) for i in idx]
                yield bucket_batch([im for _, im in pairs],
                                   [lab for lab, _ in pairs])
            epoch += 1

    def close(self):
        self._mm.close()
        self._file.close()
