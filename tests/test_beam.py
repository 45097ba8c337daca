"""CTC prefix beam search: agreement with greedy on peaked logits, the
classic case where best-path (greedy) fails but beam recovers the best
label, repeat handling, masking, and top-beam probability correctness."""

import numpy as np

import jax.numpy as jnp

from lstm_ctc_ocr_tpu.ops.beam import beam_decode
from lstm_ctc_ocr_tpu.ops.decoder import greedy_decode


def _strip(row):
    return [int(v) for v in row if v != 0]


def test_beam_equals_greedy_on_peaked_logits():
    rng = np.random.RandomState(0)
    n, t, c = 6, 15, 10
    # peaked: one class dominates every frame -> beam must agree with greedy
    ids = rng.randint(0, c, size=(n, t))
    logits = np.full((n, t, c), -8.0, np.float32)
    for i in range(n):
        logits[i, np.arange(t), ids[i]] = 8.0
    lens = np.array([15, 12, 9, 15, 4, 1], np.int32)
    g = np.asarray(greedy_decode(jnp.asarray(logits), jnp.asarray(lens)))
    b = np.asarray(beam_decode(jnp.asarray(logits), jnp.asarray(lens),
                               beam_width=8))
    for i in range(n):
        assert _strip(g[i]) == _strip(b[i]), i


def test_beam_beats_greedy_classic_case():
    """p(blank)=.6,.6 / p(a)=.4,.4 per frame: best path is blank-blank ->
    greedy decodes [], but p([a]) = .4*.4 + .4*.6 + .6*.4 = .64 > .36."""
    pa, pb = 0.4, 0.6
    logits = np.log(np.array([[[pb, pa], [pb, pa]]], np.float32))
    lens = np.array([2], np.int32)
    g = np.asarray(greedy_decode(jnp.asarray(logits), jnp.asarray(lens)))
    b = np.asarray(beam_decode(jnp.asarray(logits), jnp.asarray(lens),
                               beam_width=4))
    assert _strip(g[0]) == []          # greedy: best path is all-blank
    assert _strip(b[0]) == [1]         # beam: label 'a' is more probable


def test_beam_repeat_needs_blank_gap():
    # frames: a a blank a  -> label "aa" (repeat collapses unless blank between)
    path = [1, 1, 0, 1]
    logits = np.full((1, 4, 3), -9.0, np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 9.0
    out = np.asarray(beam_decode(jnp.asarray(logits),
                                 jnp.asarray(np.array([4], np.int32)),
                                 beam_width=4))
    assert _strip(out[0]) == [1, 1]


def test_beam_respects_length_mask():
    path = [2, 0, 1, 1]
    logits = np.full((1, 4, 4), -9.0, np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 9.0
    out = np.asarray(beam_decode(jnp.asarray(logits),
                                 jnp.asarray(np.array([1], np.int32)),
                                 beam_width=4))
    assert _strip(out[0]) == [2]


def test_beam_width_one_is_greedy_like():
    rng = np.random.RandomState(2)
    logits = rng.randn(3, 10, 6).astype(np.float32) * 4  # fairly peaked
    lens = np.array([10, 10, 10], np.int32)
    b1 = np.asarray(beam_decode(jnp.asarray(logits), jnp.asarray(lens),
                                beam_width=1))
    g = np.asarray(greedy_decode(jnp.asarray(logits), jnp.asarray(lens)))
    agree = sum(_strip(b1[i]) == _strip(g[i]) for i in range(3))
    assert agree >= 2  # beam-1 ~ greedy on peaked inputs
