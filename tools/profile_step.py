#!/usr/bin/env python
"""Attribute train-step time across pieces (conv/LSTM/CTC, fwd vs bwd).

Times each jitted piece with the same readback-synced window discipline as
bench.py and prints one JSON line per piece with XLA's FLOP count and the
implied MFU, so the low-utilization piece is obvious. Subtractive model:

    full step      = fwd + bwd + adam
    fwd_loss       = model fwd + CTC
    model_fwd      = CNN + BiLSTM + projection
    ctc_only       = CTC loss on random logits (same shapes)

Run on the real TPU:  python tools/profile_step.py [--batch 64 --width 96]
Honors JAX_PLATFORMS=cpu for smoke runs (the axon tunnel ignores the env
var; see bench.py).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# peak-FLOPs lookup lives in bench.py (full table + prefix matching)


def timed(fn, args, windows=9, calls=50):
    out = fn(*args)
    readback = jax.tree_util.tree_leaves(out)[-1]
    float(np.asarray(readback).ravel()[0])
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn(*args)
        readback = jax.tree_util.tree_leaves(out)[-1]
        float(np.asarray(readback).ravel()[0])
        rates.append((time.perf_counter() - t0) / calls * 1e3)
    rates.sort()
    return rates[len(rates) // 2]


def flops_of(fn, args):
    try:
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost['flops'])
    except Exception:
        return None


def report(name, ms, flops, peak):
    row = {'piece': name, 'ms': round(ms, 3)}
    if flops:
        row['gflops'] = round(flops / 1e9, 2)
        row['tflops_achieved'] = round(flops / (ms / 1e3) / 1e12, 2)
        if peak:
            row['mfu'] = round(flops / (ms / 1e3) / peak, 4)
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--width', type=int, default=96)
    ap.add_argument('--windows', type=int, default=9)
    ap.add_argument('--calls', type=int, default=50)
    args = ap.parse_args()

    global jax
    import jax
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    import jax.numpy as jnp
    from lstm_ctc_ocr_tpu.config import cfg
    from lstm_ctc_ocr_tpu.engine.train import (
        compute_dtype, enable_persistent_compile_cache, make_loss_fn,
        make_optimizer, make_train_step)
    from lstm_ctc_ocr_tpu.models.factory import get_network
    from lstm_ctc_ocr_tpu.ops.ctc import select_ctc_loss

    enable_persistent_compile_cache()
    batch, width = args.batch, args.width
    cfg.TRAIN.BATCH_SIZE = batch
    dev = jax.devices()[0].device_kind
    from bench import build_batches, peak_flops_for
    peak = peak_flops_for(dev)
    b = build_batches(batch, width, n_batches=1)[0]
    image, label, label_len, time_step = (
        jnp.asarray(b.image), jnp.asarray(b.label),
        jnp.asarray(b.label_len), jnp.asarray(b.time_step))

    net = get_network('LSTM_train')
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (batch, width, 32),
                              'time_step_len': (batch,)})
    dt = compute_dtype()
    tx = make_optimizer()
    opt_state = tx.init(params)
    step = make_train_step(net, tx, dt)
    loss_fn = make_loss_fn(net, dt)
    rng = jax.random.PRNGKey(1)

    # labels/lens are TRACED args everywhere below (not closure constants):
    # the train step takes them at runtime, so letting XLA constant-fold the
    # label-dependent CTC prep here would misattribute its cost
    fwd = jax.jit(lambda p, lb, ll, ts: loss_fn(p, image, lb, ll,
                                                ts, rng)[0])
    model_fwd = jax.jit(lambda p, ts: net.apply(
        p, {'data': image, 'time_step_len': ts},
        train=True, rng=rng, dtype=dt)['logits'])

    t_frames = width // 4 - 1
    logits = jnp.asarray(np.random.RandomState(0)
                         .randn(batch, t_frames, 64).astype(np.float32))
    ctc_impl = select_ctc_loss()
    ctc_only = jax.jit(lambda lg, lb, ll, ts: jnp.mean(
        ctc_impl(lg, lb, ll, ts)))
    ctc_grad = jax.jit(jax.grad(lambda lg, lb, ll, ts: jnp.mean(
        ctc_impl(lg, lb, ll, ts))))

    rows = []
    # non-donating variants first (stable args)
    for name, fn, fargs in [
            ('fwd_loss (model+ctc)', fwd,
             (params, label, label_len, time_step)),
            ('model_fwd (cnn+bilstm+proj)', model_fwd, (params, time_step)),
            ('ctc_fwd', ctc_only, (logits, label, label_len, time_step)),
            ('ctc_fwd_bwd', ctc_grad,
             (logits, label, label_len, time_step)),
    ]:
        ms = timed(fn, fargs, windows=args.windows, calls=args.calls)
        rows.append(report(name, ms, flops_of(fn, fargs), peak))

    # donated full step: thread params/opt/bn through calls like bench.py
    bn0 = net.init_bn_state()
    sfl = flops_of(step, (params, opt_state, bn0, image, label, label_len,
                          time_step, 0))
    p, o, bn = params, opt_state, bn0
    p, o, bn, total, _ = step(p, o, bn, image, label, label_len, time_step, 0)
    float(total)
    rates = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for i in range(args.calls):
            p, o, bn, total, _ = step(p, o, bn, image, label, label_len,
                                      time_step, i)
        float(total)
        rates.append((time.perf_counter() - t0) / args.calls * 1e3)
    rates.sort()
    rows.append(report('full_step (fwd+bwd+adam)',
                       rates[len(rates) // 2], sfl, peak))
    print(json.dumps({'device': dev, 'batch': batch, 'width': width,
                      'lstm_impl': str(cfg.LSTM_IMPL),
                      'ctc_impl': str(cfg.CTC_IMPL)}))


if __name__ == '__main__':
    main()
