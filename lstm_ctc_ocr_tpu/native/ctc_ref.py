"""ctypes binding for the C++ CTC reference (builds the .so on demand).

pybind11 is not available in this image, so the binding is plain ctypes
over an ``extern "C"`` entry point — no Python-version coupling, and the
lazy g++ build keeps the repo dependency-free.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'ctc_ref.cpp')
_LIB = os.path.join(_DIR, 'libctc_ref.so')

_lib = None


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
    lib.ctc_loss_grad.restype = ctypes.c_int
    lib.ctc_loss_grad.argtypes = [
        ctypes.POINTER(ctypes.c_float),    # logits
        ctypes.POINTER(ctypes.c_int32),    # labels
        ctypes.POINTER(ctypes.c_int32),    # label_lens
        ctypes.POINTER(ctypes.c_int32),    # logit_lens
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),    # losses out
        ctypes.POINTER(ctypes.c_float),    # grads out (nullable)
    ]
    _lib = lib
    return lib


def ctc_loss_grad(logits: np.ndarray, labels: np.ndarray,
                  label_lens: np.ndarray, logit_lens: np.ndarray,
                  want_grad: bool = True
                  ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Per-example CTC loss (and gradient wrt logits) via the C++ reference.

    logits [N,T,C] f32, labels [N,L] i32 dense 0-padded, lens [N] i32.
    """
    lib = _load()
    logits = np.ascontiguousarray(logits, np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    label_lens = np.ascontiguousarray(label_lens, np.int32)
    logit_lens = np.ascontiguousarray(logit_lens, np.int32)
    n, t, c = logits.shape
    l = labels.shape[1]
    losses = np.zeros((n,), np.float32)
    grads = np.zeros((n, t, c), np.float32) if want_grad else None

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    ret = lib.ctc_loss_grad(
        logits.ctypes.data_as(fp), labels.ctypes.data_as(ip),
        label_lens.ctypes.data_as(ip), logit_lens.ctypes.data_as(ip),
        n, t, c, l, losses.ctypes.data_as(fp),
        grads.ctypes.data_as(fp) if want_grad else
        ctypes.cast(None, fp))
    assert ret == 0, 'ctc_ref returned {}'.format(ret)
    return losses, grads
