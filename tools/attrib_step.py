#!/usr/bin/env python
"""Attribute device time inside the train step by variant deltas.

A lone jitted call through the TPU tunnel pays a ~0.3-0.8 ms dispatch
floor, so timing pieces standalone (tools/profile_step.py) overstates
small ops. This tool instead times the FULL train step under variants —
CTC pallas/scan/none, LSTM pallas/scan — with identical window shape, and
reports deltas, which cancel the dispatch floor.

Run on the real TPU:  python tools/attrib_step.py [--batch 64 --width 96]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--width', type=int, default=96)
    ap.add_argument('--windows', type=int, default=9)
    ap.add_argument('--calls', type=int, default=100)
    args = ap.parse_args()

    import jax
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    import jax.numpy as jnp
    import functools
    import optax
    from lstm_ctc_ocr_tpu.config import cfg
    from lstm_ctc_ocr_tpu.engine.train import (
        compute_dtype, enable_persistent_compile_cache, make_optimizer,
        make_train_step)
    from lstm_ctc_ocr_tpu.models.factory import get_network

    enable_persistent_compile_cache()
    batch, width = args.batch, args.width
    cfg.TRAIN.BATCH_SIZE = batch

    from bench import build_batches
    b = build_batches(batch, width, n_batches=1)[0]
    data = tuple(jnp.asarray(a) for a in
                 (b.image, b.label, b.label_len, b.time_step))

    net = get_network('LSTM_train')
    params0 = net.init_params(jax.random.PRNGKey(0),
                              {'data': (batch, width, 32),
                               'time_step_len': (batch,)})
    dt = compute_dtype()
    tx = make_optimizer()

    def make_dummy_step():
        """Same step but the CTC loss replaced by a cheap elementwise loss
        (same model fwd/bwd; isolates the CTC's marginal device cost)."""
        base_key = jax.random.PRNGKey(int(cfg.RNG_SEED))

        def loss_fn(p, image, label, label_len, time_step, rng):
            out = net.apply(p, {'data': image, 'time_step_len': time_step},
                            train=True, rng=rng, dtype=dt)
            lg = out['logits'].astype(jnp.float32)
            total = jnp.mean(lg * lg) + net.regularization_loss(p)
            return total, total

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(p, o, bn, image, label, label_len, time_step, it):
            rng = jax.random.fold_in(base_key, it)
            (total, ctc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, image, label, label_len,
                                       time_step, rng)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return p, o, bn, total, ctc
        return step

    def time_step_fn(step):
        p = jax.tree_util.tree_map(jnp.copy, params0)
        o = tx.init(p)
        bn = net.init_bn_state()
        it = 0
        for _ in range(200):   # warm the dispatch path
            p, o, bn, total, _ = step(p, o, bn, *data, it)
            it += 1
        float(total)
        rates = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.calls):
                p, o, bn, total, _ = step(p, o, bn, *data, it)
                it += 1
            float(total)
            rates.append((time.perf_counter() - t0) / args.calls * 1e3)
        rates.sort()
        return rates[len(rates) // 2]

    variants = [
        ('ctc=pallas lstm=pallas', {'CTC_IMPL': 'pallas', 'LSTM_IMPL': 'pallas'}),
        ('ctc=scan   lstm=pallas', {'CTC_IMPL': 'scan', 'LSTM_IMPL': 'pallas'}),
        ('ctc=pallas lstm=scan  ', {'CTC_IMPL': 'pallas', 'LSTM_IMPL': 'scan'}),
        ('ctc=none   lstm=pallas', None),
        ('conv=shifted          ', {'CTC_IMPL': 'pallas', 'LSTM_IMPL': 'pallas',
                                    'CONV_IMPL': 'shifted'}),
    ]
    defaults = {'CTC_IMPL': 'pallas', 'LSTM_IMPL': 'pallas',
                'CONV_IMPL': str(cfg.CONV_IMPL)}
    results = {}
    for name, sets in variants:
        if sets is None:
            step = make_dummy_step()
        else:
            for k, v in {**defaults, **sets}.items():
                setattr(cfg, k, v)
            step = make_train_step(net, tx, dt)
        ms = time_step_fn(step)
        results[name] = ms
        print(json.dumps({'variant': name.strip(), 'ms_per_step': round(ms, 3)}),
              flush=True)
    base = results['ctc=pallas lstm=pallas']
    print(json.dumps({
        'delta_ctc_pallas_vs_scan_ms': round(
            base - results['ctc=scan   lstm=pallas'], 3),
        'delta_ctc_pallas_vs_none_ms': round(
            base - results['ctc=none   lstm=pallas'], 3),
        'delta_lstm_pallas_vs_scan_ms': round(
            base - results['ctc=pallas lstm=scan  '], 3),
        'device': jax.devices()[0].device_kind}))


if __name__ == '__main__':
    main()
