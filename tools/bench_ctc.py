#!/usr/bin/env python
"""Micro-benchmark: CTC implementations and their internal pieces.

Times (median of windows, readback-synced like bench.py):
  * scan CTC loss fwd / fwd+bwd        (ops/ctc.py)
  * pallas CTC loss fwd / fwd+bwd      (ops/ctc_pallas.py)
  * pallas forward kernel alone        (prep amortized out)
  * XLA prep alone (pad/gather/masks)

Run on the real TPU:  python tools/bench_ctc.py [--batch 64 --frames 23]
Honors JAX_PLATFORMS=cpu (the axon tunnel ignores the env var).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, windows=9, calls=50):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        rates.append((time.perf_counter() - t0) / calls * 1e3)
    rates.sort()
    return rates[len(rates) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--frames', type=int, default=23)
    ap.add_argument('--classes', type=int, default=64)
    ap.add_argument('--maxlen', type=int, default=6)
    ap.add_argument('--windows', type=int, default=9)
    ap.add_argument('--calls', type=int, default=50)
    args = ap.parse_args()

    global jax
    import jax
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    import jax.numpy as jnp
    from lstm_ctc_ocr_tpu.ops import ctc, ctc_pallas

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(args.batch, args.frames, args.classes)
                         .astype(np.float32))
    labels = jnp.asarray(rng.randint(
        1, args.classes - 1, size=(args.batch, args.maxlen)).astype(np.int32))
    label_lens = jnp.asarray(rng.randint(
        max(1, args.maxlen - 2), args.maxlen + 1,
        size=(args.batch,)).astype(np.int32))
    logit_lens = jnp.full((args.batch,), args.frames, jnp.int32)

    # labels/lens are TRACED args (not closure constants): in the train step
    # they are runtime inputs, so constant-folding the label-dependent prep
    # (extended_labels, transition masks) here would understate real cost
    impls = {'scan': ctc.ctc_loss, 'pallas': ctc_pallas.ctc_loss_pallas}
    for name, impl in impls.items():
        fwd = jax.jit(lambda lg, lb, ll, tl, f=impl: jnp.mean(
            f(lg, lb, ll, tl)))
        bwd = jax.jit(jax.grad(lambda lg, lb, ll, tl, f=impl: jnp.mean(
            f(lg, lb, ll, tl))))
        print(json.dumps({
            'impl': name,
            'fwd_ms': round(timed(fwd, logits, labels, label_lens,
                                  logit_lens, windows=args.windows,
                                  calls=args.calls), 3),
            'fwd_bwd_ms': round(timed(bwd, logits, labels, label_lens,
                                      logit_lens, windows=args.windows,
                                      calls=args.calls), 3)}), flush=True)

    # pieces of the pallas path
    logp = jax.nn.log_softmax(logits, axis=-1)
    prep = jax.jit(lambda lp, lb, ll, tl: ctc_pallas._pad_args(
        lp, lb, ll, tl)[:4])
    g, skip, valid, final, ext, n_pad = ctc_pallas._pad_args(
        logp, labels, label_lens, logit_lens)
    kern = jax.jit(lambda *a: ctc_pallas._run_forward(*a)[0])
    print(json.dumps({'piece': 'xla_prep(pad+gather+masks)',
                      'ms': round(timed(prep, logp, labels, label_lens,
                                        logit_lens, windows=args.windows,
                                        calls=args.calls), 3)}), flush=True)
    print(json.dumps({'piece': 'pallas_fwd_kernel_only',
                      'ms': round(timed(kern, g, skip, valid, final,
                                        windows=args.windows,
                                        calls=args.calls), 3)}), flush=True)
    print(json.dumps({'device': jax.devices()[0].device_kind,
                      'shape': [args.batch, args.frames, args.classes]}))


if __name__ == '__main__':
    main()
