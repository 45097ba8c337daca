"""Serving export round trip: freeze -> serialize -> deserialize -> decode
(engine/serve.py). The artifact must reproduce the live decode path exactly
and the loader must handle arbitrary-width images end to end."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg


@pytest.fixture
def serve_cfg():
    old = copy.deepcopy(dict(cfg))
    cfg.TRAIN.DTYPE = 'float32'
    cfg.DECODER = 'greedy'
    cfg.TEST.BATCH_SIZE = 2
    cfg.LSTM_IMPL = 'jax'
    yield
    cfg.clear()
    for k, v in old.items():
        cfg[k] = v


def _net_and_params(batch, width):
    from lstm_ctc_ocr_tpu.models.factory import get_network
    net = get_network('LSTM_test')
    params = net.init_params(
        jax.random.PRNGKey(1),
        {'data': (batch, width, cfg.NUM_FEATURES), 'time_step_len': (batch,)})
    return net, params


def test_export_roundtrip_matches_live_decode(serve_cfg, tmp_path):
    from lstm_ctc_ocr_tpu.engine.serve import ExportedDecoder, export_decoder
    from lstm_ctc_ocr_tpu.engine.train import compute_dtype, make_decode_step

    buckets, batch = [64, 96], 2
    net, params = _net_and_params(batch, buckets[0])
    manifest = export_decoder(net, params, str(tmp_path), buckets=buckets,
                              batch=batch, platforms=('cpu',))
    assert manifest['buckets'] == buckets

    live = make_decode_step(net, compute_dtype())
    dec = ExportedDecoder(str(tmp_path))
    rng = np.random.RandomState(0)
    for w in buckets:
        img = rng.rand(batch, w, cfg.NUM_FEATURES).astype(np.float32)
        ts = np.full((batch,), w // 4 - 1, np.int32)
        got = np.asarray(dec._programs[w].call(jnp.asarray(img),
                                               jnp.asarray(ts)))
        want = np.asarray(live(params, {}, jnp.asarray(img), jnp.asarray(ts)))
        np.testing.assert_array_equal(got, want)


def test_exported_decoder_end_to_end(serve_cfg, tmp_path):
    """Loader contract: raw grayscale images of assorted widths/heights in,
    decoded strings out, matching the eval driver's preprocessing.

    batch=1 so the per-image live decode is the exact oracle: the model's
    BN uses batch statistics even at test time (reference quirk,
    network.py:176-178), so batched decode legitimately depends on batch
    composition."""
    from lstm_ctc_ocr_tpu.engine.serve import ExportedDecoder, export_decoder
    from lstm_ctc_ocr_tpu.engine.test import decode_ids, prepare_single
    from lstm_ctc_ocr_tpu.engine.train import compute_dtype, make_decode_step

    buckets, batch = [64, 96], 1
    net, params = _net_and_params(batch, buckets[0])
    export_decoder(net, params, str(tmp_path), buckets=buckets, batch=batch,
                   platforms=('cpu',))
    dec = ExportedDecoder(str(tmp_path))

    rng = np.random.RandomState(2)
    # heights/widths off the model grid: loader must resize + bucket-pad
    imgs = [(rng.rand(60, w3) * 255).astype(np.uint8) for w3 in (90, 150, 64)]
    got = dec.decode_images(imgs)

    live = make_decode_step(net, compute_dtype())
    want = []
    for im in imgs:
        image, ts = prepare_single(im)
        ids = np.asarray(live(params, {}, jnp.asarray(image),
                              jnp.asarray(ts)))[0]
        want.append(decode_ids(ids))
    assert got == want


def test_exported_decoder_rejects_oversize(serve_cfg, tmp_path):
    from lstm_ctc_ocr_tpu.engine.serve import ExportedDecoder, export_decoder
    net, params = _net_and_params(1, 64)
    export_decoder(net, params, str(tmp_path), buckets=[64], batch=1,
                   platforms=('cpu',))
    dec = ExportedDecoder(str(tmp_path))
    with pytest.raises(ValueError):
        dec.decode_images([np.zeros((32, 500), np.uint8)])


def test_export_roundtrip_beam_decoder(serve_cfg, tmp_path):
    """The beam decoder (static-shape device beam search, ops/beam.py) must
    survive export identically — records/scene configs serve with beam."""
    from lstm_ctc_ocr_tpu.engine.serve import ExportedDecoder, export_decoder
    from lstm_ctc_ocr_tpu.engine.train import compute_dtype, make_decode_step

    cfg.DECODER = 'beam'
    cfg.BEAM_WIDTH = 4
    net, params = _net_and_params(2, 64)
    export_decoder(net, params, str(tmp_path), buckets=[64], batch=2,
                   platforms=('cpu',))

    live = make_decode_step(net, compute_dtype())
    dec = ExportedDecoder(str(tmp_path))
    rng = np.random.RandomState(3)
    img = rng.rand(2, 64, cfg.NUM_FEATURES).astype(np.float32)
    ts = np.full((2,), 64 // 4 - 1, np.int32)
    got = np.asarray(dec._programs[64].call(jnp.asarray(img),
                                            jnp.asarray(ts)))
    want = np.asarray(live(params, {}, jnp.asarray(img), jnp.asarray(ts)))
    np.testing.assert_array_equal(got, want)


def test_exported_decoder_charset_from_manifest(serve_cfg, tmp_path):
    """The loader must decode with the MANIFEST's charset, not the loading
    process's live cfg — artifacts are standalone."""
    from lstm_ctc_ocr_tpu.engine.serve import ExportedDecoder, export_decoder

    net, params = _net_and_params(1, 64)
    export_decoder(net, params, str(tmp_path), buckets=[64], batch=1,
                   platforms=('cpu',))
    dec = ExportedDecoder(str(tmp_path))
    baseline = dec.decode_images([np.full((32, 60), 128, np.uint8)])

    # sabotage the live cfg; the loader must not notice
    old = cfg.CHARSET
    try:
        cfg.CHARSET = '!@#$%^&*()'
        dec2 = ExportedDecoder(str(tmp_path))
        assert dec2.decode_images(
            [np.full((32, 60), 128, np.uint8)]) == baseline
    finally:
        cfg.CHARSET = old


def test_export_sorts_buckets(serve_cfg, tmp_path):
    """Unsorted --buckets must not route images to oversized programs."""
    from lstm_ctc_ocr_tpu.engine.serve import ExportedDecoder, export_decoder
    net, params = _net_and_params(1, 64)
    m = export_decoder(net, params, str(tmp_path), buckets=[96, 64], batch=1,
                       platforms=('cpu',))
    assert m['buckets'] == [64, 96]
    dec = ExportedDecoder(str(tmp_path))
    assert dec._pick_bucket(50) == 64
