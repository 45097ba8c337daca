"""Fused Pallas TPU kernel for the masked LSTM time scan.

The ``cfg.LSTM_IMPL='pallas'`` variant of ``ops/rnn.py``'s ``lstm_scan`` —
the recurrent half of the reference's ``bidirectional_dynamic_rnn``
(/root/reference/lib/networks/network.py:104-109) as a hand-written kernel.

Layout / performance shape:

* the input projection ``x @ W`` stays **outside** the kernel as one large
  ``[T*N, D] @ [D, 4H]`` MXU matmul (XLA), exactly like the scan version;
* the kernel runs a sequential grid over **blocks of T_BLK=8 timesteps**.
  A per-timestep grid leaves the core idle on grid/DMA bookkeeping (the
  per-step recurrent matmul is ~0.2 us of MXU work); blocking amortises
  that overhead 8x while keeping the streamed VMEM working set small.
  Within a block the time loop is fully unrolled;
* the grid's leading dimension tiles the **batch** into chunks of at most
  64 rows (bf16; 32 in f32) so the kernel's VMEM frame is constant in
  batch size — streamed [T_BLK, chunk, 4H] blocks would otherwise scale
  linearly with N and blow the 16 MB scoped-vmem limit past batch 64.
  Chunks run sequentially; the h/c scratch carry resets at each chunk's
  first time block, and the dU/db accumulators run across the whole grid;
* the recurrent weights ``U [H, 4H]`` map to the same VMEM block every
  grid step — fetched from HBM once, resident for the whole scan; the
  hidden/cell state carry lives in f32 VMEM scratch (scratch persists
  across the sequential TPU grid);
* matmuls run in the input dtype (bf16 on the training path) with f32
  accumulation (``preferred_element_type``), gate math in f32 on the VPU;
* the backward pass is a second blocked Pallas kernel scanning time in
  reverse, accumulating ``dU``/``db`` in f32 VMEM scratch across the scan
  and recomputing the cell tanh from saved gate activations.

Residuals (gates i,j,f,o and the h/c state trajectories) are stored in the
input dtype — in bf16 this matches what XLA's AD saves for the lax.scan
version, and the f32 conformance tests run the f32 path end to end.
Conformance vs the lax.scan implementation: tests/test_rnn_pallas.py.
Off-TPU the kernels run in interpreter mode (tests; CPU dry-runs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_BLK = 8      # timesteps per grid step (time axis padded to a multiple)


from .pallas_util import interpret_off_tpu as _interpret  # noqa: E402


# The Mosaic default scoped-vmem limit (16 MB) is sized for small kernels;
# the blocked scans stream a dozen [T_BLK, nb, 4H] buffers double-buffered
# and need ~21 MB at the largest chunk. v5e VMEM is 128 MB — allow 64 MB
# so the scheduler has room, while batch chunking keeps the actual frame
# bounded regardless of batch size.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _chunk_rows(dtype) -> int:
    """Batch rows per grid chunk, sized so the worst kernel frame (the
    BiLSTM backward: 12 streamed [T_BLK, nb, <=4H] blocks + dx outputs +
    f32 accumulators) stays under the 16 MB scoped-vmem limit."""
    return 64 if jnp.dtype(dtype).itemsize <= 2 else 32


def _pad_batch(nb: int, x_proj, lens):
    """Pad the batch axis of [T, N, .] ``x_proj`` (and [N] ``lens``, with
    zeros — padded examples are never live) to a multiple of ``nb``."""
    n = x_proj.shape[1]
    n_pad = -(-n // nb) * nb
    if n_pad != n:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, n_pad - n), (0, 0)))
        lens = jnp.pad(lens, (0, n_pad - n))
    return x_proj, lens


def _dot(a, b, trans_a=False, trans_b=False):
    dims = ((((0,) if trans_a else (1,)), ((1,) if trans_b else (0,))),
            ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


# --- forward kernel -----------------------------------------------------------

def _fwd_kernel(forget_bias, x_ref, u_ref, b_ref, lens_ref,
                out_ref, gates_ref, hstate_ref, cstate_ref, h_scr, c_scr):
    blk = pl.program_id(1)                   # time block within this chunk

    @pl.when(blk == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    u = u_ref[:]
    bias = b_ref[:].astype(jnp.float32)
    lens = lens_ref[:]
    h_dim = h.shape[1]
    cdt = u.dtype                        # compute dtype for the MXU

    for k in range(T_BLK):               # static unroll
        t = blk * T_BLK + k
        gates = (x_ref[k].astype(jnp.float32)
                 + _dot(h.astype(cdt), u) + bias)
        i = jax.nn.sigmoid(gates[:, :h_dim])
        j = jnp.tanh(gates[:, h_dim:2 * h_dim])
        f = jax.nn.sigmoid(gates[:, 2 * h_dim:3 * h_dim] + forget_bias)
        o = jax.nn.sigmoid(gates[:, 3 * h_dim:])
        c_new = f * c + i * j
        h_new = o * jnp.tanh(c_new)

        live = (lens > t).astype(jnp.float32)            # [N, 1]
        h = live * h_new + (1.0 - live) * h
        c = live * c_new + (1.0 - live) * c

        out_ref[k] = (live * h_new).astype(out_ref.dtype)
        gates_ref[k] = jnp.concatenate([i, j, f, o],
                                       axis=1).astype(gates_ref.dtype)
        hstate_ref[k] = h.astype(hstate_ref.dtype)
        cstate_ref[k] = c.astype(cstate_ref.dtype)

    h_scr[:] = h
    c_scr[:] = c


def _fwd_call(x_proj, u, bias, lens, forget_bias):
    t_pad, n, four_h = x_proj.shape
    h_dim = four_h // 4
    n_blk = t_pad // T_BLK
    nb = min(_chunk_rows(x_proj.dtype), n)
    n_chunks = n // nb
    lens2 = lens.astype(jnp.int32).reshape(n, 1)
    bias2 = bias.reshape(1, four_h)
    rdt = x_proj.dtype                   # residual dtype
    row = lambda ci, b: (b, ci, 0)
    const2 = lambda ci, b: (0, 0)
    lens_row = lambda ci, b: (ci, 0)
    out, gates, hstate, cstate = pl.pallas_call(
        functools.partial(_fwd_kernel, float(forget_bias)),
        grid=(n_chunks, n_blk),
        in_specs=[
            pl.BlockSpec((T_BLK, nb, four_h), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lens_row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_BLK, nb, h_dim), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, nb, four_h), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, nb, h_dim), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, nb, h_dim), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, n, h_dim), rdt),
            jax.ShapeDtypeStruct((t_pad, n, four_h), rdt),
            jax.ShapeDtypeStruct((t_pad, n, h_dim), rdt),
            jax.ShapeDtypeStruct((t_pad, n, h_dim), rdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, h_dim), jnp.float32),
            pltpu.VMEM((nb, h_dim), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(x_proj, u, bias2, lens2)
    return out, gates, hstate, cstate


# --- backward kernel ----------------------------------------------------------

def _bwd_kernel(dout_ref, gates_ref, hs_cur_ref, hs_prev_ref,
                cs_cur_ref, cs_prev_ref, u_ref, lens_ref,
                dx_ref, du_ref, db_ref, dh_scr, dc_scr, du_scr, db_scr):
    ci = pl.program_id(0)                    # batch chunk
    rev = pl.program_id(1)                   # reversed time block
    n_blk = pl.num_programs(1)
    t_base = (n_blk - 1 - rev) * T_BLK

    @pl.when(rev == 0)
    def _():                                 # fresh carry for each chunk
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    @pl.when(jnp.logical_and(ci == 0, rev == 0))
    def _():                                 # dU/db accumulate grid-wide
        du_scr[:] = jnp.zeros_like(du_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    u = u_ref[:]
    cdt = u.dtype
    lens = lens_ref[:]
    h_dim = dh_scr.shape[1]
    dh = dh_scr[:]
    dc = dc_scr[:]
    du_acc = jnp.zeros_like(du_scr)
    db_acc = jnp.zeros_like(db_scr)

    for k in reversed(range(T_BLK)):     # static unroll, time backwards
        t = t_base + k
        g = gates_ref[k].astype(jnp.float32)
        i = g[:, :h_dim]
        j = g[:, h_dim:2 * h_dim]
        f = g[:, 2 * h_dim:3 * h_dim]
        o = g[:, 3 * h_dim:]

        if k > 0:
            h_prev_raw = hs_cur_ref[k - 1]
            c_prev_raw = cs_cur_ref[k - 1]
        else:                            # crosses the block boundary: the
            h_prev_raw = hs_prev_ref[0]  # precomputed [1, nb, H] boundary
            c_prev_raw = cs_prev_ref[0]  # row, not a full re-fetched block
        first = (t == 0).astype(jnp.float32)       # zero state before t=0
        h_prev = (1.0 - first) * h_prev_raw.astype(jnp.float32)
        c_prev = (1.0 - first) * c_prev_raw.astype(jnp.float32)

        c_new = f * c_prev + i * j
        tanh_c = jnp.tanh(c_new)

        live = (lens > t).astype(jnp.float32)       # [N, 1]
        g_hnew = live * (dh + dout_ref[k].astype(jnp.float32))
        g_cnew = live * dc

        do_ = g_hnew * tanh_c
        dc_tot = g_cnew + g_hnew * o * (1.0 - tanh_c * tanh_c)
        di = dc_tot * j
        dj = dc_tot * i
        df = dc_tot * c_prev

        di_l = di * i * (1.0 - i)
        dj_l = dj * (1.0 - j * j)
        df_l = df * f * (1.0 - f)
        do_l = do_ * o * (1.0 - o)
        dg = jnp.concatenate([di_l, dj_l, df_l, do_l], axis=1)   # [N, 4H]

        dx_ref[k] = dg.astype(dx_ref.dtype)
        dg_c = dg.astype(cdt)
        dh = _dot(dg_c, u, trans_b=True) + (1.0 - live) * dh
        dc = dc_tot * f + (1.0 - live) * dc
        du_acc = du_acc + _dot(h_prev.astype(cdt), dg_c, trans_a=True)
        db_acc = db_acc + jnp.sum(dg, axis=0, keepdims=True)

    dh_scr[:] = dh
    dc_scr[:] = dc
    du_scr[:] = du_scr[:] + du_acc
    db_scr[:] = db_scr[:] + db_acc

    @pl.when(jnp.logical_and(ci == pl.num_programs(0) - 1, rev == n_blk - 1))
    def _():
        du_ref[:] = du_scr[:]
        db_ref[:] = db_scr[:]


def _bwd_call(dout, gates, hstate, cstate, u, lens):
    t_pad, n, four_h = gates.shape
    h_dim = four_h // 4
    n_blk = t_pad // T_BLK
    nb = min(_chunk_rows(gates.dtype), n)
    n_chunks = n // nb
    lens2 = lens.astype(jnp.int32).reshape(n, 1)
    # block-boundary state rows, precomputed once: [n_blk, N, H] — the
    # kernel's cross-boundary read streams ONE row per grid step instead of
    # re-fetching the whole neighboring [T_BLK, nb, H] block
    h_bound = hstate[T_BLK - 1::T_BLK]
    c_bound = cstate[T_BLK - 1::T_BLK]
    rev_row = lambda ci, r: (n_blk - 1 - r, ci, 0)
    prev_bound = lambda ci, r: (jnp.maximum(n_blk - 2 - r, 0), ci, 0)
    const2 = lambda ci, r: (0, 0)
    lens_row = lambda ci, r: (ci, 0)
    dx, du, db = pl.pallas_call(
        _bwd_kernel,
        grid=(n_chunks, n_blk),
        in_specs=[
            pl.BlockSpec((T_BLK, nb, h_dim), rev_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, nb, four_h), rev_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, nb, h_dim), rev_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, h_dim), prev_bound, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, nb, h_dim), rev_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, h_dim), prev_bound, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lens_row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_BLK, nb, four_h), rev_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_h), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, n, four_h), dout.dtype),
            jax.ShapeDtypeStruct((h_dim, four_h), jnp.float32),
            jax.ShapeDtypeStruct((1, four_h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, h_dim), jnp.float32),
            pltpu.VMEM((nb, h_dim), jnp.float32),
            pltpu.VMEM((h_dim, four_h), jnp.float32),
            pltpu.VMEM((1, four_h), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(dout, gates, hstate, h_bound, cstate, c_bound, u, lens2)
    return dx, du, db


# --- custom-vjp scan core -----------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _scan_core(x_proj, u, bias, lens, forget_bias):
    out, _, _, _ = _fwd_call(x_proj, u, bias, lens, forget_bias)
    return out


def _scan_core_fwd(x_proj, u, bias, lens, forget_bias):
    out, gates, hstate, cstate = _fwd_call(x_proj, u, bias, lens, forget_bias)
    return out, (gates, hstate, cstate, u, lens)


def _scan_core_bwd(forget_bias, res, dout):
    gates, hstate, cstate, u, lens = res
    dx, du, db = _bwd_call(dout.astype(gates.dtype), gates, hstate, cstate,
                           u, lens)
    dlens = np.zeros(lens.shape, jax.dtypes.float0)
    return (dx.astype(gates.dtype), du.astype(u.dtype),
            db.reshape(-1).astype(u.dtype), dlens)


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


# --- public API (drop-in for rnn.lstm_scan) -----------------------------------

def lstm_scan(params, x_tm: jnp.ndarray, lens: jnp.ndarray,
              forget_bias: float = 1.0) -> jnp.ndarray:
    """Masked unidirectional LSTM [T, N, D] -> [T, N, H], Pallas-fused.

    Same contract as ``rnn.lstm_scan`` (TF1 LSTMCell gate math, dynamic_rnn
    length masking); the input projection runs as one XLA MXU matmul and
    the recurrence as the blocked fused kernel above. The time axis is
    zero-padded to a multiple of T_BLK inside (padded steps are masked by
    ``lens`` so state and outputs are unaffected).
    """
    t_len, n, d = x_tm.shape
    four_h = params['kernel'].shape[1]
    w = params['kernel'][:d]
    u = params['kernel'][d:]
    x_proj = (x_tm.reshape(t_len * n, d) @ w).reshape(t_len, n, four_h)
    t_pad = -(-t_len // T_BLK) * T_BLK
    if t_pad != t_len:
        x_proj = jnp.pad(x_proj, ((0, t_pad - t_len), (0, 0), (0, 0)))
    nb = min(_chunk_rows(x_proj.dtype), -(-n // 8) * 8)
    x_proj, lens_p = _pad_batch(nb, x_proj, lens)
    out = _scan_core(x_proj, u, params['bias'], lens_p, float(forget_bias))
    return out[:t_len, :n]


# =============================================================================
# Fused BiLSTM: both directions in ONE sequential grid, no reversal gathers
# =============================================================================
#
# The two-launch formulation (rnn.bilstm) runs fw scan, reverse_sequence,
# bw scan, reverse_sequence — four device ops, two of them [T, N, D]-sized
# gathers. The fusion rests on an identity: a masked scan over the
# *length-reversed* sequence is equivalent to a masked scan over physical
# time DESCENDING in which frames with ``t >= len`` leave the state
# untouched (the state simply hasn't started yet when t >= len, and from
# t = len-1 downward it sees exactly the frames len-1, len-2, ..., t — the
# same order the reversed scan sees). So one kernel walks the grid once:
# grid step b processes forward-direction block b (time ascending) and
# backward-direction block n_blk-1-b (time descending), with both
# directions' recurrent weights resident in VMEM. The reversal gathers
# vanish entirely, the two input projections fuse into a single
# [T*N, D] @ [D, 8H] MXU matmul outside, and the recurrence costs one
# kernel launch and one pass over the time grid instead of two of each.
# The backward pass mirrors this: fw grads walk time descending while bw
# grads walk time ascending in the same reverse grid.


def _bi_cell(x_row, h, c, u, bias, lens, t, forget_bias, h_dim):
    """One masked LSTM step (shared by both directions). f32 gate math."""
    gates = x_row.astype(jnp.float32) + _dot(h.astype(u.dtype), u) + bias
    i = jax.nn.sigmoid(gates[:, :h_dim])
    j = jnp.tanh(gates[:, h_dim:2 * h_dim])
    f = jax.nn.sigmoid(gates[:, 2 * h_dim:3 * h_dim] + forget_bias)
    o = jax.nn.sigmoid(gates[:, 3 * h_dim:])
    c_new = f * c + i * j
    h_new = o * jnp.tanh(c_new)
    live = (lens > t).astype(jnp.float32)            # [N, 1]
    h2 = live * h_new + (1.0 - live) * h
    c2 = live * c_new + (1.0 - live) * c
    return h2, c2, live * h_new, jnp.concatenate([i, j, f, o], axis=1)


def _bi_fwd_kernel(forget_bias, xf_ref, xb_ref, uf_ref, ub_ref,
                   bf_ref, bb_ref, lens_ref,
                   of_ref, gf_ref, hf_ref, cf_ref,
                   ob_ref, gb_ref, hb_ref, cb_ref,
                   hf_scr, cf_scr, hb_scr, cb_scr):
    blk = pl.program_id(1)                   # time block within this chunk
    n_blk = pl.num_programs(1)

    @pl.when(blk == 0)
    def _():                                 # fresh state for each chunk
        for s in (hf_scr, cf_scr, hb_scr, cb_scr):
            s[:] = jnp.zeros_like(s)

    lens = lens_ref[:]
    h_dim = hf_scr.shape[1]

    h, c = hf_scr[:], cf_scr[:]
    uf = uf_ref[:]
    bf = bf_ref[:].astype(jnp.float32)
    for k in range(T_BLK):                   # fw: physical time ascending
        t = blk * T_BLK + k
        h, c, out_row, g_row = _bi_cell(xf_ref[k], h, c, uf, bf, lens, t,
                                        forget_bias, h_dim)
        of_ref[k] = out_row.astype(of_ref.dtype)
        gf_ref[k] = g_row.astype(gf_ref.dtype)
        hf_ref[k] = h.astype(hf_ref.dtype)
        cf_ref[k] = c.astype(cf_ref.dtype)
    hf_scr[:] = h
    cf_scr[:] = c

    h, c = hb_scr[:], cb_scr[:]
    ub = ub_ref[:]
    bb = bb_ref[:].astype(jnp.float32)
    for k in reversed(range(T_BLK)):         # bw: physical time descending
        t = (n_blk - 1 - blk) * T_BLK + k
        h, c, out_row, g_row = _bi_cell(xb_ref[k], h, c, ub, bb, lens, t,
                                        forget_bias, h_dim)
        ob_ref[k] = out_row.astype(ob_ref.dtype)
        gb_ref[k] = g_row.astype(gb_ref.dtype)
        hb_ref[k] = h.astype(hb_ref.dtype)
        cb_ref[k] = c.astype(cb_ref.dtype)
    hb_scr[:] = h
    cb_scr[:] = c


def _bi_fwd_call(xpf, xpb, uf, ub, bf, bb, lens, forget_bias):
    t_pad, n, four_h = xpf.shape
    h_dim = four_h // 4
    n_blk = t_pad // T_BLK
    nb = min(_chunk_rows(xpf.dtype), n)
    n_chunks = n // nb
    lens2 = lens.astype(jnp.int32).reshape(n, 1)
    rdt = xpf.dtype
    asc = lambda ci, b: (b, ci, 0)
    desc = lambda ci, b: (n_blk - 1 - b, ci, 0)
    const2 = lambda ci, b: (0, 0)
    lens_row = lambda ci, b: (ci, 0)
    time_blk = lambda ch: pl.BlockSpec((T_BLK, nb, ch), asc,
                                       memory_space=pltpu.VMEM)
    time_blk_r = lambda ch: pl.BlockSpec((T_BLK, nb, ch), desc,
                                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bi_fwd_kernel, float(forget_bias)),
        grid=(n_chunks, n_blk),
        in_specs=[
            time_blk(four_h), time_blk_r(four_h),
            pl.BlockSpec((h_dim, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lens_row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            time_blk(h_dim), time_blk(four_h), time_blk(h_dim), time_blk(h_dim),
            time_blk_r(h_dim), time_blk_r(four_h), time_blk_r(h_dim),
            time_blk_r(h_dim),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, n, h_dim), rdt),
            jax.ShapeDtypeStruct((t_pad, n, four_h), rdt),
            jax.ShapeDtypeStruct((t_pad, n, h_dim), rdt),
            jax.ShapeDtypeStruct((t_pad, n, h_dim), rdt),
            jax.ShapeDtypeStruct((t_pad, n, h_dim), rdt),
            jax.ShapeDtypeStruct((t_pad, n, four_h), rdt),
            jax.ShapeDtypeStruct((t_pad, n, h_dim), rdt),
            jax.ShapeDtypeStruct((t_pad, n, h_dim), rdt),
        ],
        scratch_shapes=[pltpu.VMEM((nb, h_dim), jnp.float32)] * 4,
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(xpf, xpb, uf, ub, bf.reshape(1, four_h), bb.reshape(1, four_h), lens2)


def _bi_bwd_step(dout_row, g_row, h_prev, c_prev, dh, dc, u, lens, t,
                 forget_bias, h_dim):
    """Backward of one masked step; returns (dg, dh_prev, dc_prev,
    du_increment, db_increment)."""
    g = g_row.astype(jnp.float32)
    i = g[:, :h_dim]
    j = g[:, h_dim:2 * h_dim]
    f = g[:, 2 * h_dim:3 * h_dim]
    o = g[:, 3 * h_dim:]
    c_new = f * c_prev + i * j
    tanh_c = jnp.tanh(c_new)

    live = (lens > t).astype(jnp.float32)
    g_hnew = live * (dh + dout_row.astype(jnp.float32))
    g_cnew = live * dc

    do_ = g_hnew * tanh_c
    dc_tot = g_cnew + g_hnew * o * (1.0 - tanh_c * tanh_c)
    di = dc_tot * j
    dj = dc_tot * i
    df = dc_tot * c_prev
    dg = jnp.concatenate([di * i * (1.0 - i), dj * (1.0 - j * j),
                          df * f * (1.0 - f), do_ * o * (1.0 - o)], axis=1)
    dg_c = dg.astype(u.dtype)
    dh_prev = _dot(dg_c, u, trans_b=True) + (1.0 - live) * dh
    dc_prev = dc_tot * f + (1.0 - live) * dc
    du_inc = _dot(h_prev.astype(u.dtype), dg_c, trans_a=True)
    db_inc = jnp.sum(dg, axis=0, keepdims=True)
    return dg, dh_prev, dc_prev, du_inc, db_inc


def _bi_bwd_kernel(forget_bias,
                   dof_ref, gf_ref, hfc_ref, hfp_ref, cfc_ref, cfp_ref,
                   dob_ref, gb_ref, hbc_ref, hbn_ref, cbc_ref, cbn_ref,
                   uf_ref, ub_ref, lens_ref,
                   dxf_ref, dxb_ref, duf_ref, dbf_ref, dub_ref, dbb_ref,
                   dhf_scr, dcf_scr, dhb_scr, dcb_scr,
                   duf_scr, dbf_scr, dub_scr, dbb_scr):
    ci = pl.program_id(0)                    # batch chunk
    rev = pl.program_id(1)                   # reversed time block
    n_blk = pl.num_programs(1)
    t_pad = n_blk * T_BLK

    @pl.when(rev == 0)
    def _():                                 # fresh carry for each chunk
        for s in (dhf_scr, dcf_scr, dhb_scr, dcb_scr):
            s[:] = jnp.zeros_like(s)

    @pl.when(jnp.logical_and(ci == 0, rev == 0))
    def _():                                 # dU/db accumulate grid-wide
        for s in (duf_scr, dbf_scr, dub_scr, dbb_scr):
            s[:] = jnp.zeros_like(s)

    lens = lens_ref[:]
    h_dim = dhf_scr.shape[1]

    # fw direction: reverse scan order = physical time descending
    t_base = (n_blk - 1 - rev) * T_BLK
    uf = uf_ref[:]
    dh, dc = dhf_scr[:], dcf_scr[:]
    du_acc = jnp.zeros_like(duf_scr)
    db_acc = jnp.zeros_like(dbf_scr)
    for k in reversed(range(T_BLK)):
        t = t_base + k
        if k > 0:
            h_prev_raw, c_prev_raw = hfc_ref[k - 1], cfc_ref[k - 1]
        else:                       # block boundary: precomputed [1, nb, H] row
            h_prev_raw, c_prev_raw = hfp_ref[0], cfp_ref[0]
        first = (t == 0).astype(jnp.float32)     # zero state before t=0
        h_prev = (1.0 - first) * h_prev_raw.astype(jnp.float32)
        c_prev = (1.0 - first) * c_prev_raw.astype(jnp.float32)
        dg, dh, dc, du_inc, db_inc = _bi_bwd_step(
            dof_ref[k], gf_ref[k], h_prev, c_prev, dh, dc, uf, lens, t,
            forget_bias, h_dim)
        dxf_ref[k] = dg.astype(dxf_ref.dtype)
        du_acc = du_acc + du_inc
        db_acc = db_acc + db_inc
    dhf_scr[:] = dh
    dcf_scr[:] = dc
    duf_scr[:] = duf_scr[:] + du_acc
    dbf_scr[:] = dbf_scr[:] + db_acc

    # bw direction: reverse scan order = physical time ASCENDING
    t_base = rev * T_BLK
    ub = ub_ref[:]
    dh, dc = dhb_scr[:], dcb_scr[:]
    du_acc = jnp.zeros_like(dub_scr)
    db_acc = jnp.zeros_like(dbb_scr)
    for k in range(T_BLK):
        t = t_base + k
        if k < T_BLK - 1:
            h_prev_raw, c_prev_raw = hbc_ref[k + 1], cbc_ref[k + 1]
        else:                                    # crosses the block boundary
            h_prev_raw, c_prev_raw = hbn_ref[0], cbn_ref[0]
        first = (t == t_pad - 1).astype(jnp.float32)   # bw starts at the end
        h_prev = (1.0 - first) * h_prev_raw.astype(jnp.float32)
        c_prev = (1.0 - first) * c_prev_raw.astype(jnp.float32)
        dg, dh, dc, du_inc, db_inc = _bi_bwd_step(
            dob_ref[k], gb_ref[k], h_prev, c_prev, dh, dc, ub, lens, t,
            forget_bias, h_dim)
        dxb_ref[k] = dg.astype(dxb_ref.dtype)
        du_acc = du_acc + du_inc
        db_acc = db_acc + db_inc
    dhb_scr[:] = dh
    dcb_scr[:] = dc
    dub_scr[:] = dub_scr[:] + du_acc
    dbb_scr[:] = dbb_scr[:] + db_acc

    @pl.when(jnp.logical_and(ci == pl.num_programs(0) - 1, rev == n_blk - 1))
    def _():
        duf_ref[:] = duf_scr[:]
        dbf_ref[:] = dbf_scr[:]
        dub_ref[:] = dub_scr[:]
        dbb_ref[:] = dbb_scr[:]


def _bi_bwd_call(dof, dob, gf, hf, cf, gb, hb, cb, uf, ub, lens, forget_bias):
    t_pad, n, four_h = gf.shape
    h_dim = four_h // 4
    n_blk = t_pad // T_BLK
    nb = min(_chunk_rows(gf.dtype), n)
    n_chunks = n // nb
    lens2 = lens.astype(jnp.int32).reshape(n, 1)
    # precomputed block-boundary state rows (see _bwd_call): fw needs the
    # LAST row of the previous block, bw the FIRST row of the next block
    hf_bound = hf[T_BLK - 1::T_BLK]
    cf_bound = cf[T_BLK - 1::T_BLK]
    hb_bound = hb[::T_BLK]
    cb_bound = cb[::T_BLK]
    rev_row = lambda ci, r: (n_blk - 1 - r, ci, 0)
    prev_bound = lambda ci, r: (jnp.maximum(n_blk - 2 - r, 0), ci, 0)
    asc_row = lambda ci, r: (r, ci, 0)
    next_bound = lambda ci, r: (jnp.minimum(r + 1, n_blk - 1), ci, 0)
    const2 = lambda ci, r: (0, 0)
    lens_row = lambda ci, r: (ci, 0)
    blk = lambda ch, m: pl.BlockSpec((T_BLK, nb, ch), m,
                                     memory_space=pltpu.VMEM)
    row1 = lambda m: pl.BlockSpec((1, nb, h_dim), m, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bi_bwd_kernel, float(forget_bias)),
        grid=(n_chunks, n_blk),
        in_specs=[
            blk(h_dim, rev_row), blk(four_h, rev_row),
            blk(h_dim, rev_row), row1(prev_bound),
            blk(h_dim, rev_row), row1(prev_bound),
            blk(h_dim, asc_row), blk(four_h, asc_row),
            blk(h_dim, asc_row), row1(next_bound),
            blk(h_dim, asc_row), row1(next_bound),
            pl.BlockSpec((h_dim, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lens_row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            blk(four_h, rev_row), blk(four_h, asc_row),
            pl.BlockSpec((h_dim, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, four_h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_h), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, n, four_h), dof.dtype),
            jax.ShapeDtypeStruct((t_pad, n, four_h), dof.dtype),
            jax.ShapeDtypeStruct((h_dim, four_h), jnp.float32),
            jax.ShapeDtypeStruct((1, four_h), jnp.float32),
            jax.ShapeDtypeStruct((h_dim, four_h), jnp.float32),
            jax.ShapeDtypeStruct((1, four_h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, h_dim), jnp.float32),
            pltpu.VMEM((nb, h_dim), jnp.float32),
            pltpu.VMEM((nb, h_dim), jnp.float32),
            pltpu.VMEM((nb, h_dim), jnp.float32),
            pltpu.VMEM((h_dim, four_h), jnp.float32),
            pltpu.VMEM((1, four_h), jnp.float32),
            pltpu.VMEM((h_dim, four_h), jnp.float32),
            pltpu.VMEM((1, four_h), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(dof, gf, hf, hf_bound, cf, cf_bound, dob, gb, hb, hb_bound,
      cb, cb_bound, uf, ub, lens2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _bi_core(xpf, xpb, uf, ub, bf, bb, lens, forget_bias):
    of, _, _, _, ob, _, _, _ = _bi_fwd_call(xpf, xpb, uf, ub, bf, bb, lens,
                                            forget_bias)
    return of, ob


def _bi_core_fwd(xpf, xpb, uf, ub, bf, bb, lens, forget_bias):
    of, gf, hf, cf, ob, gb, hb, cb = _bi_fwd_call(xpf, xpb, uf, ub, bf, bb,
                                                  lens, forget_bias)
    return (of, ob), (gf, hf, cf, gb, hb, cb, uf, ub, lens)


def _bi_core_bwd(forget_bias, res, cots):
    gf, hf, cf, gb, hb, cb, uf, ub, lens = res
    dof, dob = cots
    dxf, dxb, duf, dbf, dub, dbb = _bi_bwd_call(
        dof.astype(gf.dtype), dob.astype(gb.dtype),
        gf, hf, cf, gb, hb, cb, uf, ub, lens, forget_bias)
    dlens = np.zeros(lens.shape, jax.dtypes.float0)
    return (dxf.astype(gf.dtype), dxb.astype(gb.dtype),
            duf.astype(uf.dtype), dub.astype(ub.dtype),
            dbf.reshape(-1).astype(uf.dtype), dbb.reshape(-1).astype(ub.dtype),
            dlens)


_bi_core.defvjp(_bi_core_fwd, _bi_core_bwd)


def bilstm(params, x: jnp.ndarray, lens: jnp.ndarray,
           forget_bias: float = 1.0) -> jnp.ndarray:
    """Fused bidirectional masked LSTM — drop-in for ``rnn.bilstm``.

    Same contract ([N, T, D] -> [N, T, 2H], fw/bw concat, outputs zero past
    ``lens``), but both directions run in ONE Pallas kernel over a single
    sequential time grid, the per-example reversal is absorbed into the
    masked descending scan (no reverse_sequence gathers), and the two input
    projections fuse into one [T*N, D] @ [D, 8H] MXU matmul.
    """
    x_tm = jnp.swapaxes(x, 0, 1)
    t_len, n, d = x_tm.shape
    kf, kb = params['fw']['kernel'], params['bw']['kernel']
    four_h = kf.shape[1]
    w = jnp.concatenate([kf[:d], kb[:d]], axis=1)       # [D, 8H], one matmul
    xp = (x_tm.reshape(t_len * n, d) @ w).reshape(t_len, n, 2 * four_h)
    t_pad = -(-t_len // T_BLK) * T_BLK
    if t_pad != t_len:
        xp = jnp.pad(xp, ((0, t_pad - t_len), (0, 0), (0, 0)))
    nb = min(_chunk_rows(xp.dtype), -(-n // 8) * 8)
    xp, lens_p = _pad_batch(nb, xp, lens)
    of, ob = _bi_core(xp[:, :, :four_h], xp[:, :, four_h:],
                      kf[d:], kb[d:], params['fw']['bias'],
                      params['bw']['bias'], lens_p, float(forget_bias))
    out = jnp.concatenate([of[:t_len, :n], ob[:t_len, :n]], axis=-1)
    return jnp.swapaxes(out, 0, 1)
