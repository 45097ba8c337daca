#!/usr/bin/env python
"""Micro-benchmark: fused single-kernel BiLSTM vs two-scan formulation.

Measures the recurrence the longline config is bound by (wide buckets ->
long frame sequences; reference geometry lib/lstm/config.py NUM_HID=512,
W/4-1 frames). Prints one JSON line per (impl, mode) with median ms/call.

Run on the real TPU (no args):   python tools/bench_rnn.py
Shapes default to the longline hot bucket: [32, 191, 512], H=256/dir.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, windows=7, calls=10):
    out = fn(*args)  # compile
    # readback so the warmup execution can't spill into window 1 (dispatch
    # returns at enqueue over the tunnel; see bench.py)
    float(np.asarray(out).ravel()[0])
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn(*args)
        # force an actual device->host readback (see bench.py on why
        # block_until_ready alone is not trusted over the tunnel)
        float(np.asarray(out).ravel()[0])
        rates.append((time.perf_counter() - t0) / calls * 1e3)
    rates.sort()
    return rates[len(rates) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--frames', type=int, default=191)
    ap.add_argument('--input-dim', type=int, default=512)
    ap.add_argument('--hidden', type=int, default=256)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--windows', type=int, default=7)
    ap.add_argument('--calls', type=int, default=10)
    args = ap.parse_args()

    import jax
    # The axon TPU tunnel ignores the JAX_PLATFORMS env var; honor it
    # explicitly so CPU smoke runs don't steal the chip from a trainer.
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    import jax.numpy as jnp
    from lstm_ctc_ocr_tpu.ops import rnn, rnn_pallas

    dt = jnp.dtype(args.dtype)
    cells = rnn.bilstm_init(jax.random.PRNGKey(0), args.input_dim,
                            args.hidden)
    cells = jax.tree.map(lambda p: p.astype(dt), cells)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.frames, args.input_dim)
                    .astype(np.float32)).astype(dt)
    lens = jnp.asarray(
        rng.randint(args.frames // 2, args.frames + 1,
                    size=(args.batch,)).astype(np.int32))

    impls = {'scan_pair': rnn.bilstm_scan_pair, 'fused': rnn_pallas.bilstm}
    results = {}
    for name, impl in impls.items():
        fwd = jax.jit(lambda p, x, f=impl: f(p, x, lens))
        g = jax.jit(jax.grad(
            lambda p, x, f=impl: jnp.sum(f(p, x, lens).astype(jnp.float32)),
            argnums=(0, 1)))
        results[name] = {
            'fwd_ms': round(bench(lambda p, xx: fwd(p, xx), cells, x,
                                  windows=args.windows, calls=args.calls), 3),
            'fwd_bwd_ms': round(bench(
                lambda p, xx: g(p, xx)[1], cells, x,
                windows=args.windows, calls=args.calls), 3),
        }
        print(json.dumps({'impl': name, **results[name],
                          'shape': [args.batch, args.frames, args.input_dim],
                          'hidden': args.hidden, 'dtype': args.dtype,
                          'device': jax.devices()[0].device_kind}))
    sp, fu = results['scan_pair'], results['fused']
    print(json.dumps({
        'speedup_fwd': round(sp['fwd_ms'] / fu['fwd_ms'], 3),
        'speedup_fwd_bwd': round(sp['fwd_bwd_ms'] / fu['fwd_bwd_ms'], 3)}))


if __name__ == '__main__':
    main()
