"""FCN segmentation label helpers, rebuilt TPU-native.

Counterpart of the reference's Fast-R-CNN/FCN-heritage utilities in
/root/reference/lib/lstm/utils/training.py:39-224: one-hot label derivation
with a mask-out class (:39-116), valid-entry selection (:118-160), the
500-FG/1000-total pixel subsampler (:163-181, a numpy ``tf.py_func``), and
the valid-logits/labels pairing feeding softmax cross-entropy (:183-224).
Dead code on the reference's OCR path, but part of its public utility
surface.

TPU-native redesign: the reference's ``tf.where`` + ``gather_nd`` produce
*dynamic* shapes — poison for XLA. Here selection is expressed as masking:
``valid_softmax_cross_entropy`` computes the identical scalar loss (sum of
per-valid-pixel cross entropies / count) with static shapes, fully
jit/grad-compatible. ``valid_entries_indices`` is kept for parity with a
static ``size`` bound (``jnp.where`` three-arg form), and the FG/BG
subsampler is a pure-JAX ranked-priority draw (same distribution as the
reference's ``np.random.choice(..., replace=False)``) instead of a host
callback.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def labels_from_annotation(annotation: jnp.ndarray,
                           class_labels: Sequence[int]) -> jnp.ndarray:
    """[..., H, W] int annotation -> [..., H, W, num_classes] float one-hot.

    The last entry of ``class_labels`` is the mask-out value and gets no
    channel (training.py:39-84). Works on single images and batches alike
    (the reference needs a separate ``map_fn`` batch variant, :86-116;
    broadcasting makes that free here).
    """
    valid = jnp.asarray(class_labels[:-1])
    return (annotation[..., None] == valid).astype(jnp.float32)


# alias mirroring the reference's batch entry point (training.py:86-116)
labels_from_annotation_batch = labels_from_annotation


def valid_mask(annotation: jnp.ndarray,
               class_labels: Sequence[int]) -> jnp.ndarray:
    """Boolean mask of entries not equal to the mask-out class
    (training.py:149-156)."""
    return annotation != class_labels[-1]


def valid_entries_indices(annotation: jnp.ndarray,
                          class_labels: Sequence[int],
                          size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape analogue of training.py:118-160.

    Returns ``(indices [size, ndim], count)``: the coordinates of valid
    entries padded with zeros past ``count``. ``size`` is the static upper
    bound (e.g. batch*H*W) required for XLA; callers that want the exact
    dynamic behaviour slice ``indices[:count]`` on the host.
    """
    mask = valid_mask(annotation, class_labels)
    idx = jnp.where(mask, size=size, fill_value=0)
    count = jnp.sum(mask.astype(jnp.int32))
    return jnp.stack(idx, axis=-1).astype(jnp.int32), count


def subsample_fg_bg(rng: jax.Array, annotation: jnp.ndarray,
                    num_fg: int = 500, num_total: int = 1000,
                    disabled_value: int = 255) -> jnp.ndarray:
    """Cap foreground (==1) pixels at ``num_fg`` and background (==0) at
    ``num_total - kept_fg``, marking the surplus ``disabled_value``
    (training.py:163-181).

    The reference disables a uniform random subset via
    ``np.random.choice(replace=False)`` in a ``tf.py_func``; the JAX version
    ranks each class's pixels by an i.i.d. uniform key — the kept set is an
    identically distributed uniform sample, with static shapes end to end.
    """
    flat = annotation.reshape(-1)
    k_fg, k_bg = jax.random.split(rng)

    def ranked_keep(is_class, key, cap):
        # rank = position of each class pixel in a random permutation of
        # its class; pixels with rank >= cap are disabled
        pri = jax.random.uniform(key, flat.shape)
        pri = jnp.where(is_class, pri, jnp.inf)      # non-class sorts last
        order = jnp.argsort(pri)
        # rank must be a wide int regardless of the annotation dtype —
        # a uint8 annotation would wrap ranks mod 256 and break the caps
        rank = jnp.zeros(flat.shape, jnp.int32).at[order].set(
            jnp.arange(flat.shape[0], dtype=jnp.int32))
        return is_class & (rank < cap)

    is_fg = flat == 1
    keep_fg = ranked_keep(is_fg, k_fg, num_fg)
    n_fg_kept = jnp.minimum(jnp.sum(is_fg.astype(jnp.int32)), num_fg)
    is_bg = flat == 0
    keep_bg = ranked_keep(is_bg, k_bg, num_total - n_fg_kept)

    disabled = (is_fg & ~keep_fg) | (is_bg & ~keep_bg)
    out = jnp.where(disabled, disabled_value, flat)
    return out.reshape(annotation.shape)


def valid_softmax_cross_entropy(annotation: jnp.ndarray,
                                logits: jnp.ndarray,
                                class_labels: Sequence[int],
                                reduce: str = 'mean') -> jnp.ndarray:
    """Masked softmax cross entropy over valid pixels — the static-shape
    equivalent of gather_nd(valid) + softmax_cross_entropy_with_logits
    (training.py:183-224 feeding the FCN loss).

    ``annotation``: [..., H, W] ints; ``logits``: [..., H, W, num_classes]
    with num_classes == len(class_labels) - 1.
    """
    labels = labels_from_annotation(annotation, class_labels)
    mask = valid_mask(annotation, class_labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_pixel = -jnp.sum(labels * logp, axis=-1)
    per_pixel = jnp.where(mask, per_pixel, 0.0)
    if reduce == 'sum':
        return jnp.sum(per_pixel)
    count = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.sum(per_pixel) / count


def get_valid_logits_and_labels(rng: jax.Array,
                                annotation: jnp.ndarray,
                                logits: jnp.ndarray,
                                class_labels: Sequence[int]):
    """Parity wrapper for training.py:183-224: subsample FG/BG, then return
    (labels, logits, mask) ready for a masked cross entropy. The mask
    replaces the reference's dynamic gather — multiply/select with it
    instead of indexing."""
    sampled = subsample_fg_bg(rng, annotation)
    labels = labels_from_annotation(sampled, class_labels)
    mask = valid_mask(sampled, class_labels)
    return labels, logits, mask
