"""Device-side CTC prefix beam search with static shapes.

Parity target: the role of ``tf.nn.ctc_beam_search_decoder`` in the
reference (network.py:656, test.py:30). The algorithm is standard CTC
prefix beam search (Graves 2012): per prefix, track separate log
probabilities of ending in blank (``p_b``) and non-blank (``p_nb``), with
the blank/repeat/extend transitions merged exactly within a step.

TPU-first shape discipline: the beam state is fully static —
``[K, T]`` dense prefixes, ``[K]`` lengths and scores — one ``lax.scan``
over time, one ``top_k`` over the K*(C+1) candidate scores per step, and a
``vmap`` over the batch. No host-side hypothesis sets.

Documented deviations from TF's C++ decoder:
* blank is class 0 (the training convention of warp-ctc and this
  framework), not TF's last-class;
* duplicate prefixes arising on *different* beams are not re-merged
  (exact within-beam merging only) — the usual static-shape tradeoff;
  with peaked OCR posteriors, beam and greedy agree almost always;
* ``merge_repeated=True``-style post-collapse is NOT applied (TF's own
  docs call that mode "much less likely to be correct"); repeats are
  handled correctly by the CTC transition rules instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _lse(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def _beam_single(logp, length, beam_width, blank):
    """Beam search for one example. logp: [T, C]; returns [T] dense ids."""
    t_len, c = logp.shape
    k = beam_width

    prefixes = jnp.zeros((k, t_len), jnp.int32)
    plens = jnp.zeros((k,), jnp.int32)
    last = jnp.full((k,), -1, jnp.int32)
    p_b = jnp.full((k,), NEG_INF).at[0].set(0.0)   # only beam 0 active
    p_nb = jnp.full((k,), NEG_INF)

    class_ids = jnp.arange(c)

    def step(state, inp):
        prefixes, plens, last, p_b, p_nb = state
        y, t = inp
        total = _lse(p_b, p_nb)

        # stay candidates (same prefix): blank emission + repeat emission
        new_pb_stay = total + y[blank]
        y_last = jnp.where(last >= 0, y[jnp.maximum(last, 0)], NEG_INF)
        new_pnb_stay = p_nb + y_last
        stay_total = _lse(new_pb_stay, new_pnb_stay)

        # extend candidates: [K, C]; c == last uses p_b only (repeat needs
        # an intervening blank), else p_b + p_nb
        base = jnp.where(class_ids[None, :] == last[:, None],
                         p_b[:, None], total[:, None])
        ext = base + y[None, :]
        ext = ext.at[:, blank].set(NEG_INF)        # blank never extends

        all_scores = jnp.concatenate([stay_total, ext.reshape(-1)])
        _, top_idx = jax.lax.top_k(all_scores, k)

        is_stay = top_idx < k
        src = jnp.where(is_stay, top_idx, (top_idx - k) // c)
        ext_char = jnp.where(is_stay, 0, (top_idx - k) % c).astype(jnp.int32)

        new_prefixes = prefixes[src]
        new_plens = plens[src]
        new_last = last[src]
        # append ext_char at position plens[src] for extend candidates
        onehot_pos = (jnp.arange(t_len)[None, :] == new_plens[:, None])
        appended = jnp.where(onehot_pos & ~is_stay[:, None],
                             ext_char[:, None], new_prefixes)
        new_prefixes = appended
        new_plens = jnp.where(is_stay, new_plens, new_plens + 1)
        new_last = jnp.where(is_stay, new_last, ext_char)
        new_pb = jnp.where(is_stay, new_pb_stay[src], NEG_INF)
        new_pnb = jnp.where(is_stay, new_pnb_stay[src],
                            ext.reshape(-1)[jnp.maximum(top_idx - k, 0)])

        # masked frames (t >= length) keep the previous state; the scalar
        # predicate broadcasts over any rank
        live = t < length
        keep = lambda new, old: jnp.where(live, new, old)
        state = (keep(new_prefixes, prefixes),
                 keep(new_plens, plens), keep(new_last, last),
                 keep(new_pb, p_b), keep(new_pnb, p_nb))
        return state, 0

    ts = jnp.arange(t_len)
    (prefixes, plens, last, p_b, p_nb), _ = jax.lax.scan(
        step, (prefixes, plens, last, p_b, p_nb), (logp, ts))

    best = jnp.argmax(_lse(p_b, p_nb))
    out = prefixes[best]
    # zero out beyond the prefix length (dense 0-padded contract)
    return jnp.where(jnp.arange(t_len) < plens[best], out, 0)


@functools.partial(jax.jit, static_argnames=('beam_width', 'blank'))
def beam_decode(logits, logit_lens, beam_width: int = 16, blank: int = 0):
    """Batched CTC beam search.

    Args:
      logits:     [N, T, C] batch-major.
      logit_lens: [N] valid frame counts.
    Returns:
      [N, T] int32 dense decoded ids (top beam), 0-padded.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    fn = functools.partial(_beam_single, beam_width=beam_width, blank=blank)
    return jax.vmap(fn)(logp, logit_lens)
