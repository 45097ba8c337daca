"""Device-side CTC decoders with static shapes.

``greedy_decode`` is the jit-friendly equivalent of
``tf.nn.ctc_greedy_decoder`` (best path: argmax per frame, collapse repeats,
drop blanks) returning a dense 0-padded id matrix like the reference's
``sparse_tensor_to_dense(..., default_value=0)`` (network.py:656-657).

``beam_decode`` (in ``beam.py``) covers the ``ctc_beam_search_decoder``
parity path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_decode(logits: jnp.ndarray, logit_lens: jnp.ndarray,
                  blank: int = 0) -> jnp.ndarray:
    """Best-path CTC decode.

    Args:
      logits:     [N, T, C] (batch-major).
      logit_lens: [N] valid frame counts.
    Returns:
      [N, T] int32 dense decoded ids, 0-padded on the right. (T is a safe
      static upper bound on the decoded length; real decodes are shorter.)
    """
    n, t_len, _ = logits.shape
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)          # [N, T]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (n, t_len), 1)
    in_range = t_idx < logit_lens[:, None]
    ids = jnp.where(in_range, ids, blank)
    prev = jnp.concatenate(
        [jnp.full((n, 1), -1, jnp.int32), ids[:, :-1]], axis=1)
    keep = (ids != blank) & (ids != prev) & in_range             # [N, T]
    # left-pack kept ids into a dense 0-padded matrix with a scatter;
    # dropped frames target column t_len, which is out of bounds for the
    # [N, t_len] output so mode='drop' discards them
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1         # target slot
    pos = jnp.where(keep, pos, t_len)
    out = jnp.zeros((n, t_len), jnp.int32)
    batch_idx = jax.lax.broadcasted_iota(jnp.int32, (n, t_len), 0)
    return out.at[batch_idx, pos].set(ids, mode='drop')
