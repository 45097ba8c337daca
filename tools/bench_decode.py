"""Decode-path bench: greedy vs beam, per bucket (VERDICT r2 item 6).

The reference hardwires TF's C++ beam decoder at eval
(/root/reference/lib/lstm/test.py:30, lib/networks/network.py:656) and
publishes no latency; our README's p50 row measures greedy only. This
tool times the FULL decode step (CRNN forward + decoder) AND the decoder
alone for both decoders on the bench shapes that matter:

  * the default config's modal bucket (W=96, T=23), batch 64
  * a longline bucket (W=448, T=111), batch 64

Methodology matches PERF.md: median of several timed windows, each window
closed by a device->host readback of the decoded ids (the tunnel's
dispatch latency is bursty; a single window lies). Run on the real TPU;
honors the CPU override for smoke runs (JAX_PLATFORMS=cpu).

Output: one JSON line per (shape, decoder, scope).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get('JAX_PLATFORMS') == 'cpu':
    import jax
    jax.config.update('jax_platforms', 'cpu')   # the axon plugin ignores env
import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.config import cfg
from lstm_ctc_ocr_tpu.engine.train import compute_dtype, make_decode_step
from lstm_ctc_ocr_tpu.models.factory import get_network
from lstm_ctc_ocr_tpu.ops.beam import beam_decode
from lstm_ctc_ocr_tpu.ops.decoder import greedy_decode


def time_windows(fn, *args, windows=7, reps=4):
    """Median seconds per call: `reps` calls per window, readback closes
    each window so device work can't run ahead of the clock."""
    out = fn(*args)                      # compile
    np.asarray(out)
    samples = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out)                  # device->host sync
        samples.append((time.perf_counter() - t0) / reps)
    return float(np.median(samples))


def bench_shape(tag, width, batch, seed=0):
    rng = np.random.RandomState(seed)
    dtype = compute_dtype()
    net = get_network('LSTM_test')
    params = net.init_params(
        jax.random.PRNGKey(cfg.RNG_SEED),
        {'data': (batch, width, cfg.NUM_FEATURES), 'time_step_len': (batch,)})
    params = jax.device_put(params)
    image = jnp.asarray(
        rng.rand(batch, width, cfg.NUM_FEATURES).astype(np.float32))
    t_steps = jnp.full((batch,), width // cfg.POOL_SCALE - 1, jnp.int32)

    # logits for the decoder-only scope (realistic peaked-ish distribution:
    # random logits through the trained-net head shape)
    fwd = jax.jit(lambda p, x, ts: jnp.transpose(
        net.apply(p, {'data': x, 'time_step_len': ts},
                  train=False, dtype=dtype)['logits'], (1, 0, 2)))
    logits = jax.device_put(np.asarray(fwd(params, image, t_steps)))

    results = []
    for decoder in ('greedy', 'beam'):
        cfg.DECODER = decoder
        step = make_decode_step(net, dtype)
        full = time_windows(step, params, {}, image, t_steps)
        if decoder == 'beam':
            dec = jax.jit(lambda lg, ts: beam_decode(
                lg, ts, beam_width=int(cfg.BEAM_WIDTH),
                merge_repeated=bool(cfg.BEAM_MERGE_REPEATED)))
        else:
            dec = jax.jit(greedy_decode)
        only = time_windows(dec, logits, t_steps)
        for scope, secs in (('full_step', full), ('decoder_only', only)):
            results.append({
                'shape': tag, 'width': width, 'batch': batch,
                'decoder': decoder, 'beam_width': int(cfg.BEAM_WIDTH),
                'scope': scope, 'p50_sec_per_batch': round(secs, 6),
                'p50_ms_per_image': round(secs / batch * 1e3, 4),
                'images_per_sec': round(batch / secs, 1),
            })
            print(json.dumps(results[-1]), flush=True)
    return results


def bench_frozen_vs_live(tag, width, batch, seed=0):
    """Serving-artifact cost (VERDICT r3 item 7): the frozen StableHLO
    export pins LSTM_IMPL='jax' for hardware portability (engine/serve.py);
    this times the SAME decode through (a) the live jitted path with the
    configured (pallas) kernels, (b) the live path with LSTM_IMPL='jax'
    (the exact program the artifact contains), and (c) the deserialized
    frozen artifact itself — so the portability trade-off is a number."""
    import tempfile
    from lstm_ctc_ocr_tpu.engine.serve import ExportedDecoder, export_decoder

    rng = np.random.RandomState(seed)
    dtype = compute_dtype()
    net = get_network('LSTM_test')
    params = net.init_params(
        jax.random.PRNGKey(cfg.RNG_SEED),
        {'data': (batch, width, cfg.NUM_FEATURES), 'time_step_len': (batch,)})
    params = jax.device_put(params)
    image = jnp.asarray(
        rng.rand(batch, width, cfg.NUM_FEATURES).astype(np.float32))
    t_steps = jnp.full((batch,), width // cfg.POOL_SCALE - 1, jnp.int32)

    platform = jax.devices()[0].platform
    results = []

    def emit(variant, secs):
        results.append({
            'shape': tag, 'width': width, 'batch': batch,
            'decoder': str(cfg.DECODER), 'variant': variant,
            'p50_sec_per_batch': round(secs, 6),
            'p50_ms_per_image': round(secs / batch * 1e3, 4),
            'images_per_sec': round(batch / secs, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    live = make_decode_step(net, dtype)
    emit('live_' + str(cfg.LSTM_IMPL), time_windows(live, params, {},
                                                    image, t_steps))

    old_impl = str(cfg.LSTM_IMPL)
    try:
        cfg.LSTM_IMPL = 'jax'
        portable = make_decode_step(net, dtype)
        emit('live_jax_portable', time_windows(portable, params, {},
                                               image, t_steps))
    finally:
        cfg.LSTM_IMPL = old_impl

    with tempfile.TemporaryDirectory() as d:
        export_decoder(net, jax.tree.map(np.asarray, params), d,
                       buckets=[width], batch=batch, platforms=(platform,))
        frozen = ExportedDecoder(d)._programs[width]
        emit('frozen_artifact', time_windows(frozen.call, image, t_steps))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--beam_width', type=int, default=16)
    ap.add_argument('--frozen', action='store_true',
                    help='also bench the frozen serving artifact vs the '
                         'live decode path (serve.py portability cost)')
    args = ap.parse_args()
    cfg.BEAM_WIDTH = args.beam_width
    print('devices:', jax.devices(), file=sys.stderr)
    if args.frozen:
        cfg.DECODER = 'beam'
        bench_frozen_vs_live('default_W96', 96, args.batch)
        return
    out = []
    out += bench_shape('default_W96', 96, args.batch)
    # longline bucket: reconfigure time/label geometry like longline.yml
    cfg.MIN_LEN, cfg.MAX_LEN = 20, 24
    cfg.MAX_CHAR_LEN = 24
    out += bench_shape('longline_W448', 448, args.batch)
    ratios = {}
    for tag in ('default_W96', 'longline_W448'):
        g = next(r for r in out if r['shape'] == tag and
                 r['decoder'] == 'greedy' and r['scope'] == 'full_step')
        b = next(r for r in out if r['shape'] == tag and
                 r['decoder'] == 'beam' and r['scope'] == 'full_step')
        ratios[tag] = round(b['p50_sec_per_batch'] / g['p50_sec_per_batch'], 2)
    print(json.dumps({'beam_over_greedy_full_step': ratios}), flush=True)


if __name__ == '__main__':
    main()
