"""ctypes binding for the native captcha renderer (synth.cpp).

The split of labor: Python rasterizes each charset glyph ONCE per process
(PIL/FreeType, at the same font sizes the PIL renderer uses) into a flat
uint8 alpha atlas; everything per image — rotation, quad warp, overlap
layout, noise, smoothing, the resize to model height — runs in C++
(`synth_render`). Selected with ``cfg.RENDERER = 'native'``; the PIL
renderer (data/captcha.py) stays the parity default.

Same lazy-g++-build + ctypes pattern as native/ctc_ref.py (pybind11 is
not in this image). Reference role: the per-image hot loop of
/root/reference/lib/lstm/utils/gen.py:31-37.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'synth.cpp')
_LIB = os.path.join(_DIR, 'libsynth.so')

_lib = None

CANVAS_H = 60           # the renderer's working canvas height (captcha.py:42)
MIN_CANVAS_W = 160      # stock canvas width, auto-widens past it
FONT_SIZES = (40, 46, 52)
_MARGIN = 4             # baked into the atlas (captcha.py:91 draws at +4)


def _build() -> None:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-o', _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.synth_render.restype = ctypes.c_int
    lib.synth_render.argtypes = [
        u8p, i32p, i32p, i32p, ctypes.c_int32,       # atlas, off, w, h, variants
        i32p, i32p, ctypes.c_int32,                  # codes, code_off, n_images
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # min_w, canvas_h, out_h
        ctypes.c_uint64,                             # seed
        u8p, i32p, ctypes.c_int32,                   # out, out_w, max_w
    ]
    _lib = lib
    return lib


class GlyphAtlas:
    """Per-(char, size) alpha bitmaps rasterized once with PIL."""

    def __init__(self, charset: str, font_path: str,
                 sizes: Sequence[int] = FONT_SIZES):
        from PIL import Image, ImageDraw, ImageFont
        self.charset = charset
        self.variants = len(sizes)
        bitmaps: List[np.ndarray] = []
        for c in charset:
            for s in sizes:
                font = ImageFont.truetype(font_path, s)
                left, top, right, bottom = font.getbbox(c)
                w = max(right - left, 1)
                h = max(bottom - top, 1)
                im = Image.new('L', (w + 2 * _MARGIN, h + 2 * _MARGIN), 0)
                ImageDraw.Draw(im).text((_MARGIN - left, _MARGIN - top), c,
                                        font=font, fill=255)
                bitmaps.append(np.asarray(im, np.uint8))
        self.off = np.zeros((len(bitmaps),), np.int32)
        self.w = np.array([b.shape[1] for b in bitmaps], np.int32)
        self.h = np.array([b.shape[0] for b in bitmaps], np.int32)
        sizes_flat = [b.size for b in bitmaps]
        self.off[1:] = np.cumsum(sizes_flat[:-1], dtype=np.int64)[:len(bitmaps) - 1]
        self.data = np.concatenate([b.reshape(-1) for b in bitmaps])
        self.index = {c: i for i, c in enumerate(charset)}


_atlas_cache = {}


def get_atlas(charset: str, font_path: str) -> GlyphAtlas:
    key = (charset, font_path)
    if key not in _atlas_cache:
        _atlas_cache[key] = GlyphAtlas(charset, font_path)
    return _atlas_cache[key]


def render_batch(labels: Sequence[str], atlas: GlyphAtlas, seed: int,
                 out_h: int = 32, max_w: int = 1024
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Render ``labels`` -> (uint8 [n, out_h, max_w], widths [n]).

    Images come back already at model height (aspect-preserving resize in
    C++), so ``data.gen.bucket_batch`` skips its per-image cv2 resize.
    Deterministic in (labels, seed).
    """
    lib = _load()
    n = len(labels)
    codes = np.array([atlas.index[c] for lab in labels for c in lab], np.int32)
    code_off = np.zeros((n + 1,), np.int32)
    code_off[1:] = np.cumsum([len(lab) for lab in labels])
    out = np.zeros((n, out_h, max_w), np.uint8)
    out_w = np.zeros((n,), np.int32)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    ret = lib.synth_render(
        atlas.data.ctypes.data_as(u8p), atlas.off.ctypes.data_as(i32p),
        atlas.w.ctypes.data_as(i32p), atlas.h.ctypes.data_as(i32p),
        atlas.variants,
        codes.ctypes.data_as(i32p), code_off.ctypes.data_as(i32p), n,
        MIN_CANVAS_W, CANVAS_H, out_h, ctypes.c_uint64(seed & (2**64 - 1)),
        out.ctypes.data_as(u8p), out_w.ctypes.data_as(i32p), max_w)
    if ret != 0:
        raise RuntimeError('synth_render returned {}'.format(ret))
    return out, out_w


class NativeCaptcha:
    """Renderer with the ImageCaptcha call surface, backed by synth.cpp.

    ``generate_image`` returns a grayscale numpy array (height
    ``cfg.IMG_HEIGHT``) rather than a full-size PIL image — the C++ side
    already fused the resize, so data/gen.py's batching skips its resize.
    """

    def __init__(self, charset: str, font_path: str, img_height: int):
        self.atlas = get_atlas(charset, font_path)
        self.img_height = int(img_height)
        self._counter = 0

    def generate_image(self, chars: str, rng=None) -> np.ndarray:
        seed = rng.getrandbits(63) if hasattr(rng, 'getrandbits') \
            else self._counter
        self._counter += 1
        imgs, widths = render_batch([chars], self.atlas, seed,
                                    out_h=self.img_height)
        return imgs[0, :, :int(widths[0])]

    def write(self, chars: str, output: str, rng=None) -> None:
        from PIL import Image
        Image.fromarray(self.generate_image(chars, rng)).save(output)
