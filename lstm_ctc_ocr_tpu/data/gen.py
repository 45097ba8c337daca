"""On-the-fly synthetic captcha batching (the reference's "beta" data path).

Reproduces the semantics of /root/reference/lib/lstm/utils/gen.py:
``gen_rand`` (random 4..6 chars from the 62-char set, gen.py:24-29),
``generate_img`` (captcha render + grayscale, gen.py:31-37,77-78), and
``group_batch`` (gen.py:41-67): aspect-preserving resize to height 32,
``time_step = W//POOL_SCALE + OFFSET_TIME_STEP`` per example, labels
flattened warp-ctc style across the batch, per-batch right-padding of the
width to a multiple of POOL_SCALE, /255 normalisation, and the width-major
``[W, 32]`` transpose.

TPU-first addition: ``bucket_batch`` pads every batch to a *fixed* width
bucket (``cfg.BUCKETS``) and emits stacked, dense-label device arrays, so
XLA compiles one program per bucket instead of one per distinct batch width
(dynamic shapes would force a recompile nearly every step).
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..config import cfg, get_encode_decode_dict
from .captcha import ImageCaptcha
from .enqueuer import GeneratorEnqueuer


def gen_rand(rng=None) -> str:
    """Random label: MIN_LEN..MAX_LEN chars drawn from cfg.CHARSET (gen.py:24-29)."""
    rng = rng or random
    n = rng.randint(cfg.MIN_LEN, cfg.MAX_LEN)
    return ''.join(rng.choice(cfg.CHARSET) for _ in range(n))


_renderer_cache = {}


def _renderer():
    """Renderer per ``cfg.RENDERER``: 'captcha' (reference parity),
    'scene' (photo-like text lines, BASELINE config #5), or 'native'
    (the C++ hot loop, native/synth.cpp — ~20x the PIL rate on the
    render-bound host path). Cached per (renderer, font): renderers parse
    the TrueType font at several sizes on construction, which would
    otherwise repeat for every image."""
    from ..config import resolve_font
    font = resolve_font()                 # bundled-fonts fallback chain
    key = (str(cfg.RENDERER), font)
    r = _renderer_cache.get(key)
    if r is None:
        if key[0] == 'scene':
            from .scene import SceneTextRenderer
            r = SceneTextRenderer(fonts=[font])
        elif key[0] == 'native':
            from ..native.synth import NativeCaptcha
            r = NativeCaptcha(str(cfg.CHARSET), font, int(cfg.IMG_HEIGHT))
        else:
            r = ImageCaptcha(fonts=[font])
        _renderer_cache[key] = r
    return r


def generate_img(rng=None) -> Tuple[np.ndarray, str]:
    """Render one text line -> (grayscale uint8 [H, W] array, label string)."""
    chars = gen_rand(rng)
    img = _renderer().generate_image(chars, rng=rng)
    if isinstance(img, np.ndarray):       # native renderer: already gray,
        return img, chars                 # already at model height
    if cfg.NCHANNELS == 1:
        img = img.convert('L')
    return np.asarray(img), chars


def _resize_keep_aspect(img: np.ndarray, nh: int) -> np.ndarray:
    """Resize to height ``nh`` preserving aspect ratio (gen.py:51-53)."""
    import cv2
    h, w = img.shape[:2]
    nw = int(nh / h * w)
    return cv2.resize(img, (nw, nh))


def group_batch(imgs: List[np.ndarray], labels: List[str]):
    """Reference-compatible batcher (gen.py:41-67).

    Returns ``(img_batch, label_vec, label_len, time_steps)`` where
    ``img_batch`` is a list of ``[W_pad, 32]`` float32 arrays (width-major),
    ``label_vec`` is the batch-flattened label id vector (warp-ctc layout),
    and ``time_steps[i] = resized_width_i // POOL_SCALE - 1``.
    """
    import cv2
    encode_maps, _ = get_encode_decode_dict()
    nh = cfg.IMG_HEIGHT
    max_w = 0
    time_steps, label_len, label_vec = [], [], []
    resized = []
    for img, label in zip(imgs, labels):
        img = _resize_keep_aspect(img, nh)
        nw = img.shape[1]
        max_w = max(max_w, nw)
        resized.append(img)
        time_steps.append(nw // cfg.POOL_SCALE + cfg.OFFSET_TIME_STEP)
        code = [encode_maps[c] for c in label]
        label_vec.extend(code)
        label_len.append(len(label))
    max_w = math.ceil(max_w / cfg.POOL_SCALE) * cfg.POOL_SCALE
    img_batch = []
    for img in resized:
        w = img.shape[1]
        img = cv2.copyMakeBorder(img, 0, 0, 0, max_w - w, cv2.BORDER_CONSTANT,
                                 value=0).astype(np.float32) / 255.0
        img = img.swapaxes(0, 1)                      # [W_pad, 32] width-major
        img = np.reshape(img, [-1, cfg.NUM_FEATURES])
        img_batch.append(img)
    return img_batch, label_vec, label_len, time_steps


@dataclass
class DeviceBatch:
    """A fixed-shape batch ready for host->device transfer.

    image:      [N, W_bucket, 32] width-major, zero right-pad. Dtype is the
                transfer contract (cfg.TRANSFER_DTYPE): uint8 raw pixels
                (default — the graph normalizes /255 on device,
                models/network.py:apply) or float32 already /255
                (the reference's host-side layout, gen.py:63).
    label:      int32   [N, L_max]          dense labels, 0-padded
    label_len:  int32   [N]
    time_step:  int32   [N]                 valid frames = resized W//4 - 1
    """
    image: np.ndarray
    label: np.ndarray
    label_len: np.ndarray
    time_step: np.ndarray

    @property
    def flat_labels(self) -> np.ndarray:
        """warp-ctc style flat label vector (reference parity helper)."""
        return np.concatenate([self.label[i, :n]
                               for i, n in enumerate(self.label_len)]) \
            if len(self.label_len) else np.zeros((0,), np.int32)


def pick_bucket(width: int, buckets: Sequence[int] | None = None) -> int:
    """Smallest configured bucket >= width; doubles past the largest bucket."""
    buckets = list(buckets if buckets is not None else cfg.BUCKETS)
    for b in buckets:
        if b >= width:
            return b
    b = buckets[-1]
    while b < width:
        b *= 2
    return b


def max_label_len() -> int:
    return max(int(cfg.MAX_LEN), int(cfg.MAX_CHAR_LEN))


def bucket_batch(imgs: List[np.ndarray], labels: List[str],
                 buckets: Sequence[int] | None = None) -> DeviceBatch:
    """Batch with static bucketed width + dense labels (TPU path)."""
    import cv2
    encode_maps, _ = get_encode_decode_dict()
    nh = cfg.IMG_HEIGHT
    # images already at target height (e.g. the pool caches resized ones)
    # skip the per-batch cv2 resize — the hot host op on 1-core hosts
    resized = [img if img.shape[0] == nh else _resize_keep_aspect(img, nh)
               for img in imgs]
    widths = [im.shape[1] for im in resized]
    w_bucket = pick_bucket(max(widths), buckets)

    n = len(imgs)
    l_max = max_label_len()
    # uint8 transfer (cfg.TRANSFER_DTYPE, default): ship raw pixels and let
    # the graph normalize on device — 4x less host->device traffic, and the
    # per-image copy below is a memcpy instead of an astype+divide. Falls
    # back to the f32 wire format if any renderer hands back floats.
    u8 = (str(cfg.TRANSFER_DTYPE) == 'uint8'
          and all(im.dtype == np.uint8 for im in resized))
    # feature dim = IMG_HEIGHT * NCHANNELS (reference NUM_FEATURES layout:
    # channels flatten into the per-timestep feature vector, config.py:27-28)
    image = np.zeros((n, w_bucket, int(cfg.NUM_FEATURES)),
                     np.uint8 if u8 else np.float32)
    label = np.zeros((n, l_max), np.int32)
    label_len = np.zeros((n,), np.int32)
    time_step = np.zeros((n,), np.int32)
    for i, (im, lab) in enumerate(zip(resized, labels)):
        w = im.shape[1]
        if u8:
            image[i, :w, :] = im.swapaxes(0, 1).reshape(w, -1)
        else:
            image[i, :w, :] = (im.astype(np.float32) / 255.0) \
                .swapaxes(0, 1).reshape(w, -1)
        code = [encode_maps[c] for c in lab]
        assert len(code) <= l_max, f'label longer than MAX_LEN: {lab}'
        label[i, :len(code)] = code
        label_len[i] = len(code)
        time_step[i] = w // cfg.POOL_SCALE + cfg.OFFSET_TIME_STEP
    return DeviceBatch(image, label, label_len, time_step)


def generator(batch_size: int = 32, bucketed: bool = True, rng=None):
    """Yield batches of freshly rendered captchas (gen.py:69-110 equivalent).

    ``bucketed=True`` yields :class:`DeviceBatch` (TPU path);
    ``bucketed=False`` yields the reference 4-tuple from :func:`group_batch`.
    """
    images: List[np.ndarray] = []
    labels: List[str] = []
    failures = 0
    while True:
        try:
            im, label = generate_img(rng)
            images.append(im)
            labels.append(label)
            if len(images) == batch_size:
                if bucketed:
                    yield bucket_batch(images, labels)
                else:
                    yield group_batch(images, labels)
                images, labels = [], []
            failures = 0
        except Exception as e:  # swallow-and-continue like gen.py:106-110 —
            # but a PERSISTENT error (bad charset, missing font) must fail
            # fast, not spin forever: the reference's swallow ran only in
            # disposable worker processes, this generator also runs inline
            # on the training thread (workers=0)
            failures += 1
            print('generator error ({}/10):'.format(failures), e)
            import traceback
            traceback.print_exc()
            images, labels = [], []
            if failures >= 10:
                raise
            continue


class _GeneratorFactory:
    """Picklable seed-aware generator factory: a module-level class (NOT a
    closure) so worker processes can receive it under the 'spawn' start
    method as well as 'fork'."""

    def __init__(self, kwargs, explicit_rng=None):
        self.kwargs = kwargs
        self.explicit_rng = explicit_rng   # test hook; inline mode only

    def __call__(self, s=None):
        rng = self.explicit_rng if self.explicit_rng is not None \
            else (random.Random(s) if s is not None else None)
        return generator(rng=rng, **self.kwargs)


def get_batch(num_workers: int, seed: int = 0, **kwargs):
    """Prefetching batch stream (gen.py:112-128 equivalent).

    ``num_workers=0`` runs inline (deterministic; right choice on 1-core
    hosts and in tests). Returns a generator; the enqueuer is stopped when
    the generator is closed. Worker start method per ``cfg.MP_START``.
    """
    explicit_rng = kwargs.pop('rng', None)
    enq = GeneratorEnqueuer(_GeneratorFactory(kwargs, explicit_rng),
                            seed=seed)
    enq.start(workers=num_workers, start_method=str(cfg.MP_START))

    def _stream():
        try:
            while True:
                yield enq.get()
        finally:
            enq.stop()
    return _stream()


if __name__ == '__main__':
    gen = get_batch(num_workers=0, batch_size=8)
    for _ in range(3):
        b = next(gen)
        print('image', b.image.shape, 'label', b.label.shape,
              'time_step', b.time_step, 'label_len', b.label_len)
