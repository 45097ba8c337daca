"""From-scratch CTC loss: log-space forward-backward with an analytic VJP.

This is the TPU-native replacement for the reference's single native
component, the Baidu warp-ctc TF custom op (imported at
/root/reference/lib/networks/network.py:6, called at network.py:653-654).
Same contract: blank index 0, per-example input lengths and label lengths,
per-example negative log-likelihood losses.

Design (pure JAX; the Pallas kernel in ``ctc_pallas.py`` shares the exact
same recursion and residuals):

* Work on the *extended* label sequence ``ext = [b, l1, b, l2, ..., lL, b]``
  of length ``S = 2L+1``. All per-(example,time) state is a length-``S_max``
  vector, so the time recursion is a single ``lax.scan`` over ``T`` with a
  ``[N, S_max]`` carry — static shapes, VPU-friendly.
* Variable input lengths are handled by *padding with free blanks*: for
  ``t >= logit_len`` the emission distribution is replaced by "blank with
  probability 1" (logp 0, others -inf). Padded steps then only extend
  alignments with blanks, which leaves the total label likelihood exactly
  unchanged — no per-example control flow inside the scan.
* The gradient is the classic CTC posterior, computed by a backward (beta)
  scan in the VJP rather than by differentiating through the forward scan:
  ``dL/dlogp[t,c] = -sum_{s: ext[s]=c} exp(alpha[t,s]+beta[t,s]-g[t,s]-logZ)``
  scattered from S-space to class space with a one-hot matmul (MXU).

Verified against ``tf.nn.ctc_loss`` and the in-tree C++ reference
implementation (tests/test_ctc.py) to <=1e-5, per BASELINE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative stand-in for log(0); avoids nan from inf-inf


def _logsumexp3(a, b, c):
    """Numerically stable log(e^a + e^b + e^c) built from max + exp (VPU ops)."""
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)  # keep exp args finite
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe))
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def _shift_right(x, fill=NEG_INF):
    """x[..., s] -> x[..., s-1]; fill at s=0. Last axis is the S axis."""
    return jnp.concatenate([jnp.full(x.shape[:-1] + (1,), fill, x.dtype),
                            x[..., :-1]], axis=-1)


def extended_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """Dense labels [N, L] -> extended [N, 2L+1] with blanks interleaved."""
    n, l = labels.shape
    ext = jnp.zeros((n, 2 * l + 1), labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _transition_masks(ext, label_lens):
    """Per-state masks for the s-2 skip transition and the final states.

    skip[s] is True when a path may hop ``s-2 -> s``: s is a label state and
    its label differs from the previous label (standard CTC constraint).
    """
    n, s_len = ext.shape
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (n, s_len), 1)
    is_label = (s_idx % 2) == 1
    prev2 = jnp.concatenate([jnp.zeros((n, 2), ext.dtype), ext[:, :-2]], axis=1)
    skip = is_label & (ext != prev2)
    # final states: S_eff-1 (trailing blank) and S_eff-2 (last label)
    s_eff = 2 * label_lens + 1
    final = (s_idx == (s_eff - 1)[:, None]) | (s_idx == (s_eff - 2)[:, None])
    # states beyond S_eff never participate
    valid = s_idx < s_eff[:, None]
    return skip, final, valid


def _gather_logp(logp, ext, logit_lens):
    """g[n,t,s] = logp[n,t,ext[s]], with free-blank padding for t >= len."""
    n, t_len, _ = logp.shape
    g = jnp.take_along_axis(logp[:, :, None, :],
                            ext[:, None, :, None].astype(jnp.int32),
                            axis=-1)[..., 0]            # [N, T, S]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (n, t_len), 1)
    in_range = (t_idx < logit_lens[:, None])[:, :, None]  # [N, T, 1]
    is_blank = (ext == 0)[:, None, :]                     # [N, 1, S]
    pad_val = jnp.where(is_blank, 0.0, NEG_INF)
    return jnp.where(in_range, g, pad_val)


def _forward_scan(g, skip, valid):
    """Alpha recursion. g: [N, T, S]. Returns (alphas [T, N, S], logZ-ready last alpha)."""
    n, t_len, s_len = g.shape
    neg = jnp.full((n, s_len), NEG_INF, g.dtype)
    alpha0 = neg.at[:, 0].set(g[:, 0, 0])
    if s_len > 1:
        alpha0 = alpha0.at[:, 1].set(g[:, 0, 1])
    alpha0 = jnp.where(valid, alpha0, NEG_INF)

    def step(alpha, g_t):
        stay = alpha
        one = _shift_right(alpha)
        two = jnp.where(skip, _shift_right(one), NEG_INF)
        alpha_new = g_t + _logsumexp3(stay, one, two)
        alpha_new = jnp.where(valid, alpha_new, NEG_INF)
        return alpha_new, alpha_new

    g_tm = jnp.swapaxes(g, 0, 1)  # [T, N, S]
    last, alphas = jax.lax.scan(step, alpha0, g_tm[1:])
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)
    return alphas, last


def _backward_scan(g, skip, valid, final):
    """Beta recursion (time-reversed). Returns betas [T, N, S]."""
    n, t_len, s_len = g.shape
    beta_last = jnp.where(final, g[:, -1, :], NEG_INF)
    beta_last = jnp.where(valid, beta_last, NEG_INF)

    def _shift_left(x, fill=NEG_INF):
        return jnp.concatenate([x[..., 1:],
                                jnp.full(x.shape[:-1] + (1,), fill, x.dtype)], axis=-1)

    # the s -> s+2 hop mirrors skip: allowed into state s+2 when skip[s+2],
    # so as an additive mask at source position s it is skip shifted left twice
    skip_fwd = _shift_left(_shift_left(jnp.where(skip, 0.0, NEG_INF)))

    def step(beta, g_t):
        stay = beta
        one = _shift_left(beta)
        two = _shift_left(_shift_left(beta)) + skip_fwd
        beta_new = g_t + _logsumexp3(stay, one, two)
        beta_new = jnp.where(valid, beta_new, NEG_INF)
        return beta_new, beta_new

    g_tm = jnp.swapaxes(g, 0, 1)  # [T, N, S]
    _, betas = jax.lax.scan(step, beta_last, g_tm[:-1][::-1])
    betas = jnp.concatenate([betas[::-1], beta_last[None]], axis=0)
    return betas


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _ctc_on_logp(logp, labels, label_lens, logit_lens):
    loss, _ = _ctc_fwd_impl(logp, labels, label_lens, logit_lens)
    return loss


def _ctc_fwd_impl(logp, labels, label_lens, logit_lens):
    ext = extended_labels(labels)
    skip, final, valid = _transition_masks(ext, label_lens)
    g = _gather_logp(logp, ext, logit_lens)
    alphas, last = _forward_scan(g, skip, valid)
    final_scores = jnp.where(final, last, NEG_INF)
    m = jnp.max(final_scores, axis=-1)
    m_safe = jnp.maximum(m, NEG_INF)
    logz = m_safe + jnp.log(jnp.sum(jnp.exp(final_scores - m_safe[:, None]), axis=-1))
    logz = jnp.where(m > NEG_INF / 2, logz, NEG_INF)
    loss = -logz
    return loss, (g, alphas, logz, ext, skip, valid, final)


def _ctc_vjp_fwd(logp, labels, label_lens, logit_lens):
    loss, res = _ctc_fwd_impl(logp, labels, label_lens, logit_lens)
    return loss, (res, logp.shape, logit_lens)


def _ctc_vjp_bwd(saved, dloss):
    (g, alphas, logz, ext, skip, valid, final), logp_shape, logit_lens = saved
    n, t_len, c = logp_shape
    betas = _backward_scan(g, skip, valid, final)          # [T, N, S]
    # posterior over extended states; alpha and beta both include g -> subtract once
    log_gamma = alphas + betas - jnp.swapaxes(g, 0, 1)     # [T, N, S]
    log_post = log_gamma - logz[None, :, None]
    post = jnp.exp(jnp.minimum(log_post, 0.0))
    post = jnp.where(log_post > NEG_INF / 2, post, 0.0)
    # infeasible alignment (logit_len too short for the label): logz is
    # NEG_INF and cancels against the NEG_INF in log_gamma, making log_post
    # look finite — mask the whole example instead. Convention matches the
    # C++ twin (native/ctc_ref.cpp:101): loss stays huge, gradient is 0.
    feasible = (logz > NEG_INF / 2).astype(post.dtype)     # [N]
    post = post * feasible[None, :, None]
    # zero out padded timesteps (their g was a constant, not logp)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (t_len, n), 0)
    post = post * (t_idx < logit_lens[None, :]).astype(post.dtype)[:, :, None]
    # scatter S-space -> class-space with a one-hot matmul (MXU-friendly);
    # HIGHEST precision: the TPU's default f32 matmul path rounds through
    # bf16 passes, which would cost ~1e-3 of gradient conformance
    onehot = jax.nn.one_hot(ext, c, dtype=post.dtype)      # [N, S, C]
    grad_logp = -jnp.einsum('tns,nsc->ntc', post, onehot,
                            precision=jax.lax.Precision.HIGHEST)
    grad_logp = grad_logp * dloss[:, None, None]
    return grad_logp, None, None, None


_ctc_on_logp.defvjp(_ctc_vjp_fwd, _ctc_vjp_bwd)


def select_ctc_loss():
    """The configured CTC loss implementation (cfg.CTC_IMPL): 'pallas' ->
    the TPU forward-backward kernel, anything else -> this module's
    lax.scan version. Single dispatch point for loss construction
    (mirrors rnn.select_scan).

    'pallas' is a TPU fast path only (off-TPU it would interpret — slower
    than the scan), and labels longer than the kernel's lane-axis capacity
    dispatch to the scan implementation, which handles any length."""
    import jax
    from ..config import cfg
    if str(cfg.CTC_IMPL) == 'pallas' and jax.default_backend() == 'tpu':
        from . import ctc_pallas

        def dispatch(logits, labels, label_lens, logit_lens):
            s = 2 * labels.shape[1] + 1
            if s > ctc_pallas.LANES:
                _warn_long_labels_once(labels.shape[1])
                return ctc_loss(logits, labels, label_lens, logit_lens)
            return ctc_pallas.ctc_loss_pallas(
                logits, labels, label_lens, logit_lens)
        return dispatch
    return ctc_loss


_warned_long_labels = False


def _warn_long_labels_once(max_len: int) -> None:
    global _warned_long_labels
    if not _warned_long_labels:
        _warned_long_labels = True
        print('CTC_IMPL=pallas: MAX label length {} exceeds the kernel\'s '
              'lane capacity (2L+1 > 128); using the lax.scan CTC for this '
              'shape'.format(max_len))


def ctc_loss(logits, labels, label_lens, logit_lens):
    """Per-example CTC negative log-likelihood.

    Args:
      logits:     [N, T, C] unnormalised scores (batch-major; class 0 = blank).
      labels:     [N, L] dense int labels, 0-padded.
      label_lens: [N] true label lengths.
      logit_lens: [N] valid frame counts (reference: time_step_len).

    Returns:
      [N] float32 losses (warp-ctc / tf.nn.ctc_loss convention).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return _ctc_on_logp(logp, labels, label_lens, logit_lens)


def ctc_loss_flat(logits_tm, flat_labels, label_lens, logit_lens, max_label_len=None):
    """warp-ctc style wrapper: time-major logits [T, N, C] + flat labels.

    Host-side convenience mirroring ``warpctc_tensorflow.ctc``'s calling
    convention (network.py:653-654). ``flat_labels`` is the batch-flattened
    label vector; it is unflattened to dense [N, L] here.
    """
    import numpy as np
    label_lens = np.asarray(label_lens)
    n = label_lens.shape[0]
    l_max = int(max_label_len if max_label_len is not None
                else max(int(label_lens.max()), 1))
    dense = np.zeros((n, l_max), np.int32)
    off = 0
    flat_labels = np.asarray(flat_labels)
    for i, ln in enumerate(label_lens):
        dense[i, :ln] = flat_labels[off:off + ln]
        off += ln
    logits = jnp.swapaxes(jnp.asarray(logits_tm), 0, 1)
    return ctc_loss(logits, jnp.asarray(dense), jnp.asarray(label_lens),
                    jnp.asarray(logit_lens))
