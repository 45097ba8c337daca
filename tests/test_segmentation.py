"""FCN segmentation helpers (utils/segmentation.py) vs the reference
semantics of /root/reference/lib/lstm/utils/training.py:39-224, checked
against independent numpy computations.
"""

import numpy as np

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.utils import segmentation as seg

CLS = [0, 1, 2, 255]        # 3 real classes, 255 = mask-out


def test_labels_from_annotation_one_hot_and_mask_out():
    ann = np.array([[0, 1], [2, 255]], np.int32)
    lab = np.asarray(seg.labels_from_annotation(jnp.asarray(ann), CLS))
    assert lab.shape == (2, 2, 3)
    np.testing.assert_array_equal(lab[0, 0], [1, 0, 0])
    np.testing.assert_array_equal(lab[0, 1], [0, 1, 0])
    np.testing.assert_array_equal(lab[1, 0], [0, 0, 1])
    np.testing.assert_array_equal(lab[1, 1], [0, 0, 0])   # masked-out: no channel
    # batch variant is the same function (broadcasting)
    batch = np.stack([ann, ann])
    lab_b = np.asarray(seg.labels_from_annotation_batch(jnp.asarray(batch), CLS))
    assert lab_b.shape == (2, 2, 2, 3)
    np.testing.assert_array_equal(lab_b[0], lab)


def test_valid_entries_indices_matches_argwhere():
    rng = np.random.RandomState(0)
    ann = rng.choice([0, 1, 2, 255], size=(2, 4, 5)).astype(np.int32)
    size = ann.size
    idx, count = seg.valid_entries_indices(jnp.asarray(ann), CLS, size)
    want = np.argwhere(ann != 255)
    assert int(count) == len(want)
    np.testing.assert_array_equal(np.asarray(idx)[:int(count)], want)


def test_subsample_caps_fg_and_total():
    rng = np.random.RandomState(1)
    # 800 fg, 1500 bg, 100 other -> keep 500 fg, 500 bg
    ann = np.concatenate([np.ones(800), np.zeros(1500),
                          np.full(100, 7)]).astype(np.int32)
    rng.shuffle(ann)
    ann = ann.reshape(40, 60)
    out = np.asarray(seg.subsample_fg_bg(jax.random.PRNGKey(0),
                                         jnp.asarray(ann)))
    assert out.shape == ann.shape
    assert (out == 1).sum() == 500
    assert (out == 0).sum() == 500
    # the 'other' pixels are untouched, surplus became 255
    assert (out == 7).sum() == 100
    assert (out == 255).sum() == 800 - 500 + 1500 - 500
    # disabled pixels were fg/bg in the input
    changed = out != ann
    assert set(np.unique(ann[changed])) <= {0, 1}


def test_subsample_uint8_annotation_keeps_caps():
    """Ranks must not wrap in the annotation dtype (uint8 PNG masks)."""
    rng = np.random.RandomState(5)
    ann = np.concatenate([np.ones(800), np.zeros(1500)]).astype(np.uint8)
    rng.shuffle(ann)
    out = np.asarray(seg.subsample_fg_bg(jax.random.PRNGKey(3),
                                         jnp.asarray(ann.reshape(46, 50))))
    assert (out == 1).sum() == 500
    assert (out == 0).sum() == 500
    assert (out == 255).sum() == 1300


def test_subsample_under_caps_is_identity():
    ann = np.concatenate([np.ones(100), np.zeros(200)]).astype(np.int32)
    out = np.asarray(seg.subsample_fg_bg(jax.random.PRNGKey(1),
                                         jnp.asarray(ann.reshape(10, 30))))
    np.testing.assert_array_equal(out, ann.reshape(10, 30))


def test_masked_cross_entropy_equals_gathered():
    rng = np.random.RandomState(2)
    ann = rng.choice([0, 1, 2, 255], size=(2, 6, 7)).astype(np.int32)
    logits = rng.randn(2, 6, 7, 3).astype(np.float32)
    got = float(seg.valid_softmax_cross_entropy(jnp.asarray(ann),
                                                jnp.asarray(logits), CLS))
    # independent numpy: gather valid entries then softmax CE (the
    # reference's dynamic-shape formulation, training.py:183-224)
    valid = np.argwhere(ann != 255)
    ces = []
    for (b, i, j) in valid:
        lg = logits[b, i, j]
        p = np.exp(lg - lg.max())
        p /= p.sum()
        ces.append(-np.log(p[ann[b, i, j]]))
    np.testing.assert_allclose(got, np.mean(ces), rtol=1e-5)
    # sum reduction too
    got_sum = float(seg.valid_softmax_cross_entropy(
        jnp.asarray(ann), jnp.asarray(logits), CLS, reduce='sum'))
    np.testing.assert_allclose(got_sum, np.sum(ces), rtol=1e-5)


def test_cross_entropy_jit_and_grad():
    rng = np.random.RandomState(3)
    ann = jnp.asarray(rng.choice([0, 1, 2, 255], size=(1, 4, 4))
                      .astype(np.int32))
    logits = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))

    f = jax.jit(lambda lg: seg.valid_softmax_cross_entropy(ann, lg, CLS))
    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    # masked-out pixels get exactly zero gradient
    mask = np.asarray(ann) == 255
    np.testing.assert_array_equal(np.asarray(g)[mask], 0.0)
    assert np.abs(np.asarray(g)[~mask]).sum() > 0


def test_get_valid_logits_and_labels_pipeline():
    rng = np.random.RandomState(4)
    ann = rng.choice([0, 1], size=(50, 50)).astype(np.int32)
    logits = rng.randn(50, 50, 3).astype(np.float32)
    labels, lg, mask = seg.get_valid_logits_and_labels(
        jax.random.PRNGKey(2), jnp.asarray(ann), jnp.asarray(logits), CLS)
    assert labels.shape == (50, 50, 3)
    assert lg.shape == (50, 50, 3)
    # 2500 pixels, caps 500 fg + rest bg to 1000 total
    assert int(np.asarray(mask).sum()) == 1000
