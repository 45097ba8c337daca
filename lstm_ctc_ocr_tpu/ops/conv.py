"""Convolution as a sum of shifted matmuls (``cfg.CONV_IMPL='shifted'``).

Role: an alternative lowering for the CNN stack's convolutions
(reference conv_single, /root/reference/lib/networks/network.py:161-191).
Numerics are identical to ``jax.lax.conv_general_dilated`` — this changes
HOW the FLOPs reach the MXU, not WHAT is computed.

Why: after the height-only pools, the FLOP-dominant convs of this model run
at tiny spatial extents (H' in {8, 4, 2, 1}; see PERF.md) where XLA's native
conv lowering pads against the 8x128 tile grid. Decomposing a KxL conv into
K*L shifted ``dot_general``s

    y = sum_{di,dj}  x_pad[:, di:di+OA, dj:dj+OB, :] @ W[di, dj]

turns every term into an [N*OA*OB, Ci] @ [Ci, Co] matmul — M is batched over
batch AND space, so the MXU sees large dense contractions regardless of the
spatial shape. Autodiff of this expression is also matmul-only:
dW[di,dj] = x_slice^T @ dy (an [Ci, M] @ [M, Co] contraction) and
dx accumulates dy @ W[di,dj]^T into the shifted windows (XLA fuses the
pad/slice adds), replacing the conv-backward-filter op — the least
MXU-friendly conv XLA emits at these shapes.

The decomposition only pays when the contraction is MXU-sized: with Ci=1
(the model's first conv) each term is a rank-1 matmul, so callers gate on
``min_k`` (default: use XLA below k_h*k_w*Ci of 256).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_amount(in_size: int, k: int, s: int, padding: str):
    if padding == 'VALID':
        return 0, 0, (in_size - k) // s + 1
    # SAME, XLA convention
    out = -(-in_size // s)
    total = max((out - 1) * s + k - in_size, 0)
    lo = total // 2
    return lo, total - lo, out


def conv2d_shifted(x, kernel, window_strides=(1, 1), padding='SAME'):
    """NHWC / HWIO / NHWC conv via k_h*k_w shifted matmuls.

    Drop-in for ``jax.lax.conv_general_dilated(x, kernel, window_strides,
    padding, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))`` for string
    paddings, stride >= 1, no dilation.
    """
    assert padding in ('SAME', 'VALID'), \
        'conv2d_shifted supports string paddings only, got {!r}'.format(padding)
    n, a, b, ci = x.shape
    kh, kw, kci, co = kernel.shape
    assert ci == kci, (x.shape, kernel.shape)
    sa, sb = window_strides
    lo_a, hi_a, oa = _pad_amount(a, kh, sa, padding)
    lo_b, hi_b, ob = _pad_amount(b, kw, sb, padding)
    if lo_a or hi_a or lo_b or hi_b:
        x = jnp.pad(x, ((0, 0), (lo_a, hi_a), (lo_b, hi_b), (0, 0)))

    # accumulate the tap sum in f32 (preferred_element_type) and round ONCE
    # at the end — matches lax.conv's single f32-accumulated rounding in
    # bf16 instead of k*k-1 intermediate bf16 roundings
    y = None
    for di in range(kh):
        for dj in range(kw):
            sl = jax.lax.slice(
                x, (0, di, dj, 0),
                (n, di + (oa - 1) * sa + 1, dj + (ob - 1) * sb + 1, ci),
                (1, sa, sb, 1))                       # [N, OA, OB, Ci]
            term = jax.lax.dot_general(
                sl, kernel[di, dj],
                ((((3,), (0,))), ((), ())),           # [N, OA, OB, Co]
                preferred_element_type=jnp.float32)
            y = term if y is None else y + term
    return y.astype(x.dtype)
