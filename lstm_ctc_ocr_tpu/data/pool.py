"""Pooled synthetic sampler: amortize captcha rendering on weak hosts.

The reference renders every training image fresh in 12 worker processes
(gen.py:112-116) — with one host core that caps end-to-end training at
~70 images/sec while the TPU step sustains ~15k images/sec (audited,
PERF.md). The pool
sampler pre-renders ``POOL_SIZE`` images once, then serves batches by
sampling the pool, refreshing ``POOL_REFRESH`` images per batch so the
pool slowly drifts toward fresh data. Statistically this sits between the
beta branch (infinite fresh stream) and the dev branch (fixed dataset),
and converges to the same accuracy with a large enough pool.

Selected with ``cfg.DATA_BACKEND = 'pool'``.
"""

from __future__ import annotations

import os
import random
from typing import Iterator, List, Optional

import numpy as np

from ..config import cfg
from .gen import DeviceBatch, _resize_keep_aspect, bucket_batch, generate_img


def _render_resized(rng):
    """Render one example already resized to IMG_HEIGHT, so sampling a pool
    image costs zero cv2 work per batch (resize is deterministic — same
    pixels bucket_batch would produce)."""
    im, lab = generate_img(rng)
    if im.shape[0] != int(cfg.IMG_HEIGHT):   # native renderer: already there
        im = _resize_keep_aspect(im, cfg.IMG_HEIGHT)
    return im, lab


def _cache_path(size: int, seed: int) -> str:
    """Deterministic on-disk cache file for the initial pool fill. The key
    covers everything the rendered distribution depends on; a config change
    silently misses the cache and re-renders."""
    import hashlib

    from ..config import resolve_font
    try:
        # key on the font file actually used, not the configured name: the
        # renderer goes through resolve_font()'s fallback chain, so a missing
        # configured font must not serve a cache rendered with a different one
        font_used = resolve_font()
    except FileNotFoundError:
        font_used = cfg.FONT
    key = '|'.join(str(v) for v in (
        cfg.RENDERER, font_used, cfg.CHARSET, cfg.MIN_LEN, cfg.MAX_LEN,
        cfg.IMG_HEIGHT, size, seed))
    h = hashlib.sha1(key.encode()).hexdigest()[:12]
    return os.path.join('data', 'pool_cache', 'pool_{}.npz'.format(h))


def _cache_load(path: str):
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as d:
            strip = np.ascontiguousarray(d['strip'])
            widths, labels = d['widths'], d['labels']
    except Exception as e:                       # corrupt/partial cache
        print('pool cache unreadable ({}); re-rendering'.format(e))
        return None
    images, off = [], 0
    for w in widths:
        images.append(strip[:, off:off + int(w)].copy())
        off += int(w)
    return images, [str(s) for s in labels]


def _cache_save(path: str, images, labels) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    strip = np.concatenate(images, axis=1)       # equal heights (IMG_HEIGHT)
    widths = np.asarray([im.shape[1] for im in images], np.int32)
    tmp = '{}.tmp.{}'.format(path, os.getpid())
    with open(tmp, 'wb') as f:
        np.savez(f, strip=strip, widths=widths,
                 labels=np.asarray(labels, dtype=str))
    os.replace(tmp, path)                        # atomic vs concurrent fills


class PoolSampler:
    def __init__(self, size: int, seed: int = 0, verbose: bool = True):
        self._rng = random.Random(seed)
        self._np_rng = np.random.RandomState(seed)
        self.images: List[np.ndarray] = []
        self.labels: List[str] = []
        # the initial fill is deterministic in (cfg, size, seed) — cache it
        # on disk so restarts (lr step-downs, resumes) skip the multi-minute
        # re-render on 1-core hosts
        cache = _cache_path(size, seed)
        loaded = _cache_load(cache)
        if loaded is not None:
            self.images, self.labels = loaded
            # the fill that would have consumed the rng streams was skipped:
            # reseed both so refresh() renders fresh images instead of
            # replaying the exact pool contents for the first POOL_SIZE draws
            import hashlib
            digest = hashlib.sha1(
                'cache-resume|{}'.format(seed).encode()).digest()
            resume_seed = int.from_bytes(digest[:4], 'little') & 0x7FFFFFFF
            self._rng = random.Random(resume_seed)
            self._np_rng = np.random.RandomState(resume_seed ^ 0x5DEECE66)
            if verbose:
                print('pool: loaded {} cached images ({})'.format(
                    len(self.images), cache), flush=True)
            return
        if verbose:
            print('rendering {} pool images...'.format(size), flush=True)
        for i in range(size):
            im, lab = _render_resized(self._rng)
            self.images.append(im)
            self.labels.append(lab)
            if verbose and (i + 1) % 5000 == 0:
                print('  pool: {}/{}'.format(i + 1, size), flush=True)
        _cache_save(cache, self.images, self.labels)

    def refresh(self, k: int) -> None:
        for _ in range(k):
            j = self._np_rng.randint(len(self.images))
            im, lab = _render_resized(self._rng)
            self.images[j] = im
            self.labels[j] = lab

    def sample_batch(self, batch_size: int) -> DeviceBatch:
        idx = self._np_rng.choice(len(self.images), size=batch_size,
                                  replace=False)
        return bucket_batch([self.images[i] for i in idx],
                            [self.labels[i] for i in idx])

    def batch_iterator(self, batch_size: int,
                       refresh_per_batch: Optional[int] = None
                       ) -> Iterator[DeviceBatch]:
        if refresh_per_batch is None:
            refresh_per_batch = int(cfg.POOL_REFRESH)
        while True:
            yield self.sample_batch(batch_size)
            if refresh_per_batch:
                self.refresh(refresh_per_batch)
