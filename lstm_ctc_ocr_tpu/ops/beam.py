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

Cross-beam prefix merge: identical prefixes arising on different beams
(a "stay" of one beam colliding with an "extend" of another) are re-merged
every step, EXACTLY and before pruning: every stay-candidate is compared
against every extend-candidate via a static [K, K] prefix-equality match,
colliding masses combined with a masked logsumexp into the stay candidate
and the extend candidate killed, and only then is the merged candidate set
``top_k``-pruned to K. This reproduces the hypothesis-map merging of TF's
C++ decoder with no dynamic shapes.

Documented deviations from TF's C++ decoder:
* blank is class 0 (the training convention of warp-ctc and this
  framework), not TF's last-class;
* ``merge_repeated=True``-style post-collapse is off by default (TF's
  own docs call that mode "much less likely to be correct"; repeats are
  handled correctly by the CTC transition rules) but available for
  behavioural parity via ``cfg.BEAM_MERGE_REPEATED`` /
  ``beam_decode(..., merge_repeated=True)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ctc import NEG_INF    # one shared log-zero sentinel across ops/


def _lse(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def _row_lse(v):
    """Row-wise logsumexp of a [K, K] matrix (NEG_INF-safe)."""
    m = jnp.max(v, axis=1)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(jnp.sum(jnp.exp(v - m_safe[:, None]), axis=1))
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def _beam_single(logp, length, beam_width, blank, merge_repeated):
    """Beam search for one example. logp: [T, C]; returns [T] dense ids."""
    t_len, c = logp.shape
    k = beam_width

    # Beam 0 holds the empty prefix; beams 1..K-1 start dead. Poison the dead
    # beams with unique negative first chars and an impossible length so the
    # merge's "live beams are pairwise distinct keys" invariant holds from
    # t=0 (otherwise K duplicate empty prefixes could later each absorb the
    # same extend mass and double-count it).
    poison = -(jnp.arange(k, dtype=jnp.int32) + 1)
    prefixes = jnp.zeros((k, t_len), jnp.int32).at[1:, 0].set(poison[1:])
    plens = jnp.where(jnp.arange(k) == 0, 0, t_len).astype(jnp.int32)
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

        # --- exact cross-beam prefix merge (TF hash-map semantics) --------
        # The candidate map {prefix -> mass} has keys {P_i} (stays) and
        # {P_j + ch} (extends). Since live beams are pairwise distinct,
        # the ONLY possible key collision is a stay(i) with an ext(j, ch)
        # where P_i == P_j + [ch] — i.e. ch == last_i and P_j is P_i minus
        # its last char. That is a [K, K] match problem, solved exactly:
        # fold each such ext's mass into the stay's non-blank mass and kill
        # the ext candidate. (Positions >= plen are always 0 — invariant of
        # the append-at-plen construction — so masked content equality
        # identifies "P_j == P_i[:-1]" exactly.)
        pos = jnp.arange(t_len)
        content_eq = jnp.all(
            (prefixes[:, None, :] == prefixes[None, :, :]) |
            (pos[None, None, :] >= plens[None, :, None]), axis=-1)
        m_ij = (plens[:, None] == plens[None, :] + 1) & content_eq  # [i, j]

        # mass of ext(j, last_i): gather ext[j, last_i] -> [K_i, K_j]
        ext_at_last = ext[:, jnp.maximum(last, 0)].T        # [i, j]
        extra = jnp.where(m_ij & (last[:, None] >= 0), ext_at_last, NEG_INF)
        new_pnb_stay = _lse(new_pnb_stay, _row_lse(extra))
        stay_total = _lse(new_pb_stay, new_pnb_stay)

        # kill the merged ext candidates so their mass isn't double-counted
        kill = jnp.any(m_ij[:, :, None] &
                       (class_ids[None, None, :] == last[:, None, None]),
                       axis=0)                              # [j, C]
        ext = jnp.where(kill, NEG_INF, ext)

        # the merged map's entries are now pairwise distinct: prune to K
        all_scores = jnp.concatenate([stay_total, ext.reshape(-1)])
        _, top_idx = jax.lax.top_k(all_scores, k)

        is_stay = top_idx < k
        src = jnp.where(is_stay, top_idx, (top_idx - k) // c)
        ext_char = jnp.where(is_stay, 0, (top_idx - k) % c).astype(jnp.int32)

        new_prefixes = prefixes[src]
        new_plens = plens[src]
        new_last = last[src]
        # append ext_char at position plens[src] for extend candidates
        onehot_pos = (pos[None, :] == new_plens[:, None])
        new_prefixes = jnp.where(onehot_pos & ~is_stay[:, None],
                                 ext_char[:, None], new_prefixes)
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
    pos_valid = jnp.arange(t_len) < plens[best]
    if merge_repeated:
        # tf.nn.ctc_beam_search_decoder(merge_repeated=True) parity: collapse
        # adjacent repeated labels in the decoded sequence post hoc
        # (reference network.py:656, test.py:30)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), out[:-1]])
        keep = (out != prev) & pos_valid
        tgt = jnp.where(keep, jnp.cumsum(keep) - 1, t_len)
        return jnp.zeros((t_len,), jnp.int32).at[tgt].set(
            jnp.where(keep, out, 0), mode='drop')
    # zero out beyond the prefix length (dense 0-padded contract)
    return jnp.where(pos_valid, out, 0)


@functools.partial(jax.jit,
                   static_argnames=('beam_width', 'blank', 'merge_repeated'))
def beam_decode(logits, logit_lens, beam_width: int = 16, blank: int = 0,
                merge_repeated: bool = False):
    """Batched CTC beam search.

    Args:
      logits:     [N, T, C] batch-major.
      logit_lens: [N] valid frame counts.
      merge_repeated: collapse adjacent repeats in the decoded output, the
        reference's ``ctc_beam_search_decoder(merge_repeated=True)`` mode
        (network.py:656). Off by default: TF's own docs call this mode
        "much less likely to be correct" (it deletes legitimate double
        letters), but it is available for behavioural parity
        (cfg.BEAM_MERGE_REPEATED).
    Returns:
      [N, T] int32 dense decoded ids (top beam), 0-padded.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    fn = functools.partial(_beam_single, beam_width=beam_width, blank=blank,
                           merge_repeated=merge_repeated)
    return jax.vmap(fn)(logp, logit_lens)
