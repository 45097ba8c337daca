"""Fused conv3x3 + bias + training-mode BatchNorm + ReLU forward kernel.

Prototype for the PERF.md "MFU ceiling" question (VERDICT r2 item 5): the
late conv stack (conv4_1/conv4_2, reference LSTM_train.py:31-33 — 3x3
convs with BN at H in {4, 2}) is where the step's FLOPs concentrate, and
the XLA lowering runs it as ~four passes over the [N, W/4, H, C]
activations: conv write, stats read (mean/var), normalize+relu read+write.
This kernel fuses everything into ONE launch whose HBM traffic is the
theoretical minimum — x read once, normalized result written once:

  phase 0 (per batch tile): 3x3 conv as 9 shifted [rows, Ci] @ [Ci, Co]
      MXU matmuls (the ops/conv.py decomposition, here with the x tile
      VMEM-resident so all 9 taps cost one HBM read of x), + bias; the
      tile's activations stay in a VMEM scratch that persists across the
      grid (25 MB at batch 256 / Co=512 — the v5e VMEM holds it), while
      per-channel sum / sum-of-squares accumulate in f32 scratch.
  phase 1 (per batch tile): stats are final -> normalize, gamma/beta,
      relu, write the output block. The TPU grid is sequential, so the
      phase barrier costs nothing.

Numerics vs the unfused path (models/layers.py:conv_single_apply): conv
accumulates f32 and rounds once to the compute dtype (same as lax.conv in
bf16); stats are computed from the ROUNDED activations exactly like the
baseline's ``y.astype(f32)``; variance uses the E[x^2]-E[x]^2 form (one
pass) rather than jnp.var's two-pass form — equal in exact arithmetic,
f32 accumulation keeps the difference ~1e-6 relative at these sizes
(pinned by tests/test_conv_bn_pallas.py).

Forward-only by design: the prototype exists to measure whether a hand
kernel beats XLA's conv+BN at these shapes before investing in the custom
VJP. PERF.md records the verdict either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import interpret_off_tpu as _interpret

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _pick_tile(n: int, limit: int = 64) -> int:
    for t in range(min(n, limit), 0, -1):
        if n % t == 0:
            return t
    return n


def _kernel(x_ref, k_ref, b_ref, g_ref, beta_ref, o_ref, y_ref, stat_ref,
            *, bt: int, w: int, h: int, eps: float, count: float):
    phase = pl.program_id(0)
    tile = pl.program_id(1)
    co = o_ref.shape[-1]

    @pl.when(jnp.logical_and(phase == 0, tile == 0))
    def _init():
        stat_ref[...] = jnp.zeros_like(stat_ref)

    @pl.when(phase == 0)
    def _conv():
        x = x_ref[...]                                    # [BT, W, H, Ci]
        ci = x.shape[3]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((bt * w * h, co), jnp.float32)
        for di in range(3):
            for dj in range(3):
                sl = xp[:, di:di + w, dj:dj + h, :].reshape(bt * w * h, ci)
                acc += jax.lax.dot_general(
                    sl, k_ref[di, dj], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc += b_ref[...].astype(jnp.float32)
        y = acc.astype(o_ref.dtype)                       # single rounding
        y_ref[pl.ds(tile * bt, bt)] = y.reshape(bt, w, h, co)
        y32 = y.astype(jnp.float32)
        stat_ref[0, :] += jnp.sum(y32, axis=0)
        stat_ref[1, :] += jnp.sum(y32 * y32, axis=0)

    @pl.when(phase == 1)
    def _normalize():
        mean = stat_ref[0, :] * (1.0 / count)
        var = jnp.maximum(stat_ref[1, :] * (1.0 / count) - mean * mean, 0.0)
        scale = g_ref[...].astype(jnp.float32) * jax.lax.rsqrt(var + eps)
        shift = beta_ref[...].astype(jnp.float32) - mean * scale
        y = y_ref[pl.ds(tile * bt, bt)].astype(jnp.float32) * scale + shift
        o_ref[...] = jnp.maximum(y, 0.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('eps',))
def conv3x3_bn_relu(x, kernel, bias, gamma, beta, eps: float = 1e-3):
    """x [N, W, H, Ci] (compute dtype), kernel [3, 3, Ci, Co] — returns
    relu(batchnorm(conv_same(x, kernel) + bias)) in x.dtype, one launch."""
    n, w, h, ci = x.shape
    co = kernel.shape[-1]
    bt = _pick_tile(n)
    grid = (2, n // bt)
    dt = x.dtype
    kernel = kernel.astype(dt)
    return pl.pallas_call(
        functools.partial(_kernel, bt=bt, w=w, h=h, eps=eps,
                          count=float(n * w * h)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, w, h, ci), lambda p, i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, ci, co), lambda p, i: (0, 0, 0, 0)),
            pl.BlockSpec((co,), lambda p, i: (0,)),
            pl.BlockSpec((co,), lambda p, i: (0,)),
            pl.BlockSpec((co,), lambda p, i: (0,)),
        ],
        out_specs=pl.BlockSpec((bt, w, h, co), lambda p, i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, w, h, co), dt),
        scratch_shapes=[pltpu.VMEM((n, w, h, co), dt),
                        pltpu.VMEM((2, co), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, kernel, bias, gamma, beta)
