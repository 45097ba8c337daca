"""Pallas TPU kernel for the CTC forward-backward.

The hot recursion of ``ops/ctc.py`` as a hand-written TPU kernel — the
framework's answer to warp-ctc's CUDA kernels (the reference's only native
component: imported at /root/reference/lib/networks/network.py:6, called
at network.py:653-654). Layout maps the problem directly onto the VPU
register file:

* extended-label states S = 2L+1 live on the **lane** axis (padded to 128
  — label lengths up to 63 chars fit one register row);
* a tile of 8 examples lives on the **sublane** axis, so each time step is
  a handful of [8, 128] vector ops (shift, max, exp, log, add);
* the time loop is a ``fori_loop`` *inside* the kernel: alpha stays
  resident in a VMEM scratch register the whole scan — zero HBM traffic
  for the carry, one [8, 128] g-row read and one alpha-row write per step
  (alphas are residuals for the backward kernel);
* the grid is (N/8,) — batch tiles are embarrassingly parallel.

The class->state gather (g) and the state->class scatter (gradient) stay
in XLA outside the kernel where they fuse into one-hot matmuls on the MXU.
Numerics are identical to the scan version: same free-blank length
padding, same clamped log-space ops; conformance to the C++ reference and
tf.nn.ctc_loss is covered by tests/test_ctc_pallas.py.

Off-TPU the kernels run in interpreter mode (tests; CPU dry-runs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import (NEG_INF, _gather_logp, _logsumexp3, _shift_right,
                  _transition_masks, extended_labels)

LANES = 128      # S axis padded to one register row
TILE_N = 8       # examples per program (f32 sublane count)


from .pallas_util import interpret_off_tpu as _interpret  # noqa: E402


# the clamped log-sum-exp / S-axis shift numerics live in ops/ctc.py and are
# rank-generic over the last axis — the [8, 128] kernel tiles reuse them so
# a numerics fix lands in one place
_shift1 = _shift_right
_lse3 = _logsumexp3


# --- forward kernel -----------------------------------------------------------

def _fwd_kernel(g_ref, skip_ref, valid_ref, final_ref,
                logz_ref, alphas_ref, alpha_scr):
    t_len = g_ref.shape[1]
    skip = skip_ref[:]          # [8, 128] additive 0/NEG_INF masks
    valid = valid_ref[:]
    final = final_ref[:]

    # t = 0: alpha on states 0 and 1 only
    g0 = g_ref[:, 0, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, LANES), 1)
    init = jnp.where(lane <= 1, g0, NEG_INF) + valid
    alpha_scr[:] = init
    alphas_ref[:, 0, :] = init

    def step(t, _):
        alpha = alpha_scr[:]
        one = _shift1(alpha)
        two = _shift1(one) + skip
        a_new = g_ref[:, t, :] + _lse3(alpha, one, two) + valid
        a_new = jnp.maximum(a_new, NEG_INF)   # keep finite
        alpha_scr[:] = a_new
        alphas_ref[:, t, :] = a_new
        return 0

    jax.lax.fori_loop(1, t_len, step, 0)

    fin = alpha_scr[:] + final
    m = jnp.max(fin, axis=1, keepdims=True)
    m_safe = jnp.maximum(m, NEG_INF)
    logz = m_safe + jnp.log(jnp.sum(jnp.exp(fin - m_safe), axis=1, keepdims=True))
    logz_ref[:] = jnp.where(m > NEG_INF / 2, logz, NEG_INF)


# --- backward kernel ----------------------------------------------------------

def _bwd_kernel(g_ref, skip_ref, valid_ref, final_ref, alphas_ref, logz_ref,
                lens_ref, grad_ref, beta_scr):
    t_len = g_ref.shape[1]
    skip_in = skip_ref[:]
    valid = valid_ref[:]
    final = final_ref[:]
    logz = logz_ref[:]           # [8, 1]
    lens = lens_ref[:]           # [8, 1] int32 valid-frame counts

    def _shiftl(x):
        return jnp.concatenate(
            [x[:, 1:], jnp.full((x.shape[0], 1), NEG_INF, x.dtype)], axis=1)

    # additive mask at source s for the s->s+2 hop: skip[s+2]
    skip_fwd = _shiftl(_shiftl(skip_in))

    # infeasible alignment: logz is NEG_INF and cancels the NEG_INF in
    # alpha+beta, so per-state guards pass — mask the whole example (zero
    # grads, like the C++ twin, native/ctc_ref.cpp:101 and ops/ctc.py)
    feasible = (logz > NEG_INF / 2).astype(g_ref.dtype)    # [8, 1]

    def emit(t, beta):
        g_t = g_ref[:, t, :]
        lg = alphas_ref[:, t, :] + beta - g_t - logz
        post = jnp.where(lg > NEG_INF / 2, jnp.exp(jnp.minimum(lg, 0.0)), 0.0)
        # time mask derived in-kernel from the [8,1] lengths row — no
        # [N, T, 128] mask cube streamed from HBM
        tm = (t < lens).astype(post.dtype)            # [8, 1] broadcast
        grad_ref[:, t, :] = -post * feasible * tm

    g_last = g_ref[:, t_len - 1, :]
    beta_last = jnp.maximum(g_last + final + valid, NEG_INF)
    beta_scr[:] = beta_last
    emit(t_len - 1, beta_last)

    def step(i, _):
        t = t_len - 2 - i
        beta = beta_scr[:]
        one = _shiftl(beta)
        two = _shiftl(one) + skip_fwd
        b_new = g_ref[:, t, :] + _lse3(beta, one, two) + valid
        b_new = jnp.maximum(b_new, NEG_INF)
        beta_scr[:] = b_new
        emit(t, b_new)
        return 0

    jax.lax.fori_loop(0, t_len - 1, step, 0)


# --- host-side wrappers -------------------------------------------------------

def _as_additive(mask_bool):
    return jnp.where(mask_bool, 0.0, NEG_INF).astype(jnp.float32)


def _pad_args(logp, labels, label_lens, logit_lens):
    """Pad batch to a TILE_N multiple and build lane-padded masks/g."""
    n = logp.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        pad = n_pad - n
        logp = jnp.pad(logp, ((0, pad), (0, 0), (0, 0)))
        labels = jnp.pad(labels, ((0, pad), (0, 0)))
        label_lens = jnp.pad(label_lens, (0, pad), constant_values=1)
        logit_lens = jnp.pad(logit_lens, (0, pad), constant_values=1)
    ext = extended_labels(labels)
    s = ext.shape[1]
    assert s <= LANES, 'label length {} exceeds Pallas lane budget (63 chars)'.format(s)
    skip, final, valid = _transition_masks(ext, label_lens)
    g = _gather_logp(logp, ext, logit_lens)          # [N, T, S]
    pad_s = LANES - s
    g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_s)), constant_values=NEG_INF)
    skip = jnp.pad(skip, ((0, 0), (0, pad_s)))
    final = jnp.pad(final, ((0, 0), (0, pad_s)))
    valid = jnp.pad(valid, ((0, 0), (0, pad_s)))
    return (g.astype(jnp.float32), _as_additive(skip), _as_additive(valid),
            _as_additive(final), ext, n_pad)


def _run_forward(g, skip, valid, final):
    n_pad, t_len, _ = g.shape
    grid = (n_pad // TILE_N,)
    row = lambda i: (i, 0)
    cube = lambda i: (i, 0, 0)
    logz, alphas = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, t_len, LANES), cube, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, LANES), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, t_len, LANES), cube, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, t_len, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((TILE_N, LANES), jnp.float32)],
        interpret=_interpret(),
    )(g, skip, valid, final)
    return logz, alphas


def _run_backward(g, skip, valid, final, alphas, logz, lens2):
    n_pad, t_len, _ = g.shape
    grid = (n_pad // TILE_N,)
    row = lambda i: (i, 0)
    cube = lambda i: (i, 0, 0)
    grad_g = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, t_len, LANES), cube, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, t_len, LANES), cube, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, t_len, LANES), cube,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, t_len, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_N, LANES), jnp.float32)],
        interpret=_interpret(),
    )(g, skip, valid, final, alphas, logz, lens2)
    return grad_g


@jax.custom_vjp
def _ctc_on_logp_pallas(logp, labels, label_lens, logit_lens):
    loss, _ = _fwd_impl(logp, labels, label_lens, logit_lens)
    return loss


def _fwd_impl(logp, labels, label_lens, logit_lens):
    n = logp.shape[0]
    g, skip, valid, final, ext, n_pad = _pad_args(logp, labels, label_lens,
                                                  logit_lens)
    logz, alphas = _run_forward(g, skip, valid, final)
    loss = -logz[:n, 0]
    return loss, (g, skip, valid, final, alphas, logz, ext)


def _vjp_fwd(logp, labels, label_lens, logit_lens):
    loss, res = _fwd_impl(logp, labels, label_lens, logit_lens)
    return loss, (res, logp.shape, logit_lens)


def _vjp_bwd(saved, dloss):
    (g, skip, valid, final, alphas, logz, ext), logp_shape, logit_lens = saved
    n, t_len, c = logp_shape
    n_pad = g.shape[0]
    lens_pad = jnp.pad(logit_lens, (0, n_pad - n), constant_values=1) \
        if n_pad != n else logit_lens
    lens2 = lens_pad.astype(jnp.int32)[:, None]          # [N_pad, 1]
    grad_g = _run_backward(g, skip, valid, final, alphas, logz, lens2)
    grad_g = grad_g[:n, :, :ext.shape[1]]                # strip padding
    onehot = jax.nn.one_hot(ext[:n], c, dtype=grad_g.dtype)   # [N, S, C]
    grad_logp = jnp.einsum('nts,nsc->ntc', grad_g, onehot,
                           precision=jax.lax.Precision.HIGHEST)
    grad_logp = grad_logp * dloss[:, None, None]
    return grad_logp, None, None, None


_ctc_on_logp_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def ctc_loss_pallas(logits, labels, label_lens, logit_lens):
    """Per-example CTC loss via the Pallas TPU kernel (ops/ctc.py signature).

    Labels whose extended length 2L+1 exceeds the lane-axis budget fall back
    to the lax.scan implementation (handles any length) instead of failing —
    select_ctc_loss() also routes such shapes there with a one-time warning.
    """
    if 2 * labels.shape[1] + 1 > LANES:
        from .ctc import ctc_loss as scan_ctc_loss
        return scan_ctc_loss(logits, labels, label_lens, logit_lens)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return _ctc_on_logp_pallas(logp, labels, label_lens, logit_lens)
