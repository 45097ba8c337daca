#!/usr/bin/env python
"""Benchmark: captcha training throughput, images/sec/chip on real hardware.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measures the jitted train step (forward + CTC + backward + Adam) on the
default beta-branch config — variable-width alphanumeric captchas, bf16
compute, batch 256 (the MXU-saturating size; --batch 64 for the
reference's batch) — with host batches pre-rendered and cycled so the
number is device throughput with a prefetched pipeline (the reference's
12 worker processes play the same role, lib/lstm/train.py:64).

``vs_baseline`` compares against the reference's TF-on-CPU images/sec,
measured once on this host by an equivalent TF2 graph (same conv/BiLSTM/CTC
geometry; TF 1.0.1 cannot run here) and cached in bench_baseline.json.
BASELINE.md target: >=10x.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_FILE = os.path.join(REPO, 'bench_baseline.json')

if os.environ.get('JAX_PLATFORMS') == 'cpu':
    # the axon TPU plugin ignores the env var; route through the config API
    # so smoke runs can use the CPU while training holds the chip
    import jax
    jax.config.update('jax_platforms', 'cpu')

N_WINDOWS = 9          # timing windows; the median is reported

# Peak dense bf16 matmul throughput per chip, FLOP/s (published specs:
# v5e 197 TF, v4 275 TF, v5p 459 TF, v6e/Trillium 918 TF). Used for the
# MFU denominator; unknown kinds report mfu=null rather than guessing.
PEAK_BF16_FLOPS = {
    'TPU v4': 275e12,
    'TPU v5 lite': 197e12,
    'TPU v5e': 197e12,
    'TPU v5': 459e12,
    'TPU v5p': 459e12,
    'TPU v6 lite': 918e12,
    'TPU v6e': 918e12,
}


def peak_flops_for(device_kind):
    # longest-prefix match so 'TPU v5 lite' prefers its own row over 'TPU v5'
    best = None
    for kind, peak in PEAK_BF16_FLOPS.items():
        if device_kind.startswith(kind):
            if best is None or len(kind) > len(best[0]):
                best = (kind, peak)
    return best[1] if best else None


def build_batches(batch, width, n_batches=4, seed=0):
    import random
    import numpy as np
    from lstm_ctc_ocr_tpu.config import cfg
    from lstm_ctc_ocr_tpu.data import gen
    rng = random.Random(seed)
    batches = []
    for _ in range(n_batches):
        imgs, labels = [], []
        for _ in range(batch):
            im, lab = gen.generate_img(rng)
            imgs.append(im)
            labels.append(lab)
        batches.append(gen.bucket_batch(imgs, labels, buckets=[width]))
    return batches


def bench_tpu_train(steps=30, batch=64, width=96):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lstm_ctc_ocr_tpu.config import cfg
    from lstm_ctc_ocr_tpu.engine.train import (compute_dtype,
                                               enable_persistent_compile_cache,
                                               make_optimizer, make_train_step)
    from lstm_ctc_ocr_tpu.models.factory import get_network

    enable_persistent_compile_cache()
    cfg.TRAIN.BATCH_SIZE = batch
    net = get_network('LSTM_train')
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (batch, width, 32), 'time_step_len': (batch,)})
    tx = make_optimizer()
    opt_state = tx.init(params)
    bn_state = net.init_bn_state()
    step = make_train_step(net, tx, compute_dtype())

    host_batches = build_batches(batch, width)
    dev_batches = [tuple(jnp.asarray(a) for a in
                         (b.image, b.label, b.label_len, b.time_step))
                   for b in host_batches]

    # XLA's own FLOP count for the whole compiled train step (fwd + CTC +
    # bwd + Adam) — the MFU numerator, auditable via cost_analysis()
    flops_per_step = None
    try:
        cost = step.lower(params, opt_state, bn_state, *dev_batches[0], 0) \
                   .compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost['flops'])
    except Exception as e:
        print('cost_analysis unavailable: {}'.format(e), file=sys.stderr)

    # warmup: compile, then enough steady steps for the tunnel's dispatch
    # path to reach steady state (throughput ramps over the first few
    # hundred dispatches in a fresh process)
    it = 0
    for _ in range(300):
        params, opt_state, bn_state, total, ctc = step(
            params, opt_state, bn_state,
            *dev_batches[it % len(dev_batches)], it)
        it += 1
    float(total)

    # The TPU tunnel adds bursty dispatch latency; a single window swings
    # +-30%. Take the median of several windows for a stable number.
    # Each window ends with float(total) — an actual device->host readback
    # of the last step's loss. block_until_ready alone is NOT trusted here:
    # over the axon tunnel it can return at enqueue time, which silently
    # turns the benchmark into a Python-dispatch-rate measurement (the
    # round-1 numbers of 145-220k img/s were exactly that — they imply
    # 0.44 ms/step, >4x the chip's bf16 peak at the step's XLA-counted
    # FLOPs, i.e. physically impossible). The loss readback forces the
    # whole dependent step chain to have executed.
    rates = []
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, bn_state, total, ctc = step(
                params, opt_state, bn_state,
                *dev_batches[it % len(dev_batches)], it)
            it += 1
        float(total)
        rates.append(steps * batch / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2], flops_per_step, jax.devices()[0].device_kind


def bench_sustained(seconds, batch):
    """Sustained END-TO-END training throughput: the real train step fed
    LIVE by the configured DATA_BACKEND (pool/records/synth with the
    configured RENDERER) for ``seconds`` of wall clock — host rendering,
    batching and transfer included. This is the number a real training run
    sustains on this host, vs bench_tpu_train's device-capability number
    (prefetched batches cycled from memory). The reference's only speed
    metric is exactly this end-to-end s/iter (lib/lstm/train.py:138).
    """
    import jax
    import jax.numpy as jnp
    from lstm_ctc_ocr_tpu.config import cfg
    import numpy as np
    from lstm_ctc_ocr_tpu.engine.train import (compute_dtype,
                                               enable_persistent_compile_cache,
                                               make_optimizer,
                                               make_train_chunk_step,
                                               make_train_stream,
                                               make_train_step)
    from lstm_ctc_ocr_tpu.models.factory import get_network

    enable_persistent_compile_cache()
    cfg.TRAIN.BATCH_SIZE = batch
    net = get_network('LSTM_train')
    w0 = int(cfg.BUCKETS[0])
    params = net.init_params(jax.random.PRNGKey(0),
                             {'data': (batch, w0, 32),
                              'time_step_len': (batch,)})
    tx = make_optimizer()
    opt_state = tx.init(params)
    bn_state = net.init_bn_state()
    n_dispatch = max(1, int(cfg.TRAIN.STEPS_PER_DISPATCH))

    # device-resident dataset (cfg.DATA_DEVICE): same gate as the solver
    from lstm_ctc_ocr_tpu.data.device_store import make_device_feed
    from lstm_ctc_ocr_tpu.engine.train import (make_train_chunk_step_gather,
                                               make_train_step_gather)
    feed = make_device_feed(batch)
    if feed is not None:
        step_g = make_train_step_gather(net, tx, compute_dtype())
        chunk_g = (make_train_chunk_step_gather(net, tx, compute_dtype(),
                                                n_dispatch)
                   if n_dispatch > 1 else None)

        def run_feed(n_steps, it0):
            nonlocal params, opt_state, bn_state
            it = it0
            total = None
            while it - it0 < n_steps:
                if chunk_g is not None:
                    idxs = feed.next_indices(batch, n_dispatch)
                    params, opt_state, bn_state, totals, _ = chunk_g(
                        params, opt_state, bn_state, *feed.store.arrays,
                        jnp.asarray(idxs), it)
                    total, m = totals[-1], n_dispatch
                else:
                    idxs = feed.next_indices(batch, 1)
                    params, opt_state, bn_state, total, _ = step_g(
                        params, opt_state, bn_state, *feed.store.arrays,
                        jnp.asarray(idxs[0]), it)
                    m = 1
                feed.tick(m)
                it += m
            float(total)
            return it

        it = run_feed(30, 0)          # warmup: compile + tunnel steady state
        t0 = time.perf_counter()
        it0 = it
        while time.perf_counter() - t0 < seconds:
            it = run_feed(20, it)
        dt = time.perf_counter() - t0
        return (it - it0) * batch / dt, it - it0, dt, True

    step = make_train_step(net, tx, compute_dtype())
    chunk_step = (make_train_chunk_step(net, tx, compute_dtype(), n_dispatch)
                  if n_dispatch > 1 else None)
    stream = make_train_stream(batch)
    holdover = []     # same-bucket run collector, as in SolverWrapper

    def next_group():
        group = list(holdover)
        del holdover[:]
        while len(group) < n_dispatch:
            b = next(stream)
            if group and b.image.shape[1] != group[0].image.shape[1]:
                holdover.append(b)
                break
            group.append(b)
        return group

    def run(n_steps, it0):
        nonlocal params, opt_state, bn_state
        it = it0
        total = None
        while it - it0 < n_steps:
            group = next_group()
            if chunk_step is not None and len(group) == n_dispatch:
                params, opt_state, bn_state, totals, _ = chunk_step(
                    params, opt_state, bn_state,
                    jnp.asarray(np.stack([b.image for b in group])),
                    jnp.asarray(np.stack([b.label for b in group])),
                    jnp.asarray(np.stack([b.label_len for b in group])),
                    jnp.asarray(np.stack([b.time_step for b in group])), it)
                total = totals[-1]
            else:
                for j, b in enumerate(group):
                    params, opt_state, bn_state, total, _ = step(
                        params, opt_state, bn_state,
                        jnp.asarray(b.image), jnp.asarray(b.label),
                        jnp.asarray(b.label_len), jnp.asarray(b.time_step),
                        it + j)
            it += len(group)
        float(total)        # close the window: forces the step chain
        return it

    # warmup: compile every bucket the stream actually hops across, and
    # let the tunnel dispatch path reach steady state
    it = run(30, 0)

    t0 = time.perf_counter()
    it_meas0 = it
    chunk = 20
    while time.perf_counter() - t0 < seconds:
        it = run(chunk, it)   # run() rounds up to whole dispatch groups
    dt = time.perf_counter() - t0
    steps_done = it - it_meas0
    return steps_done * batch / dt, steps_done, dt, False


def bench_tf_cpu_baseline(steps=4, batch=64, width=96):
    """Equivalent TF2-CPU train step: the reference's stack on this host."""
    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    import numpy as np
    import tensorflow as tf
    tf.config.set_visible_devices([], 'GPU')

    t_frames = width // 4 - 1
    inp = tf.keras.Input((width, 32, 1))
    x = tf.keras.layers.Conv2D(64, 3, padding='same', activation='relu')(inp)
    x = tf.keras.layers.MaxPool2D((2, 2))(x)
    x = tf.keras.layers.Conv2D(128, 3, padding='same', activation='relu')(x)
    x = tf.keras.layers.MaxPool2D((2, 2))(x)
    x = tf.keras.layers.Conv2D(256, 3, padding='same', activation='relu')(x)
    x = tf.keras.layers.Conv2D(256, 3, padding='same', activation='relu')(x)
    x = tf.keras.layers.MaxPool2D((1, 2))(x)
    x = tf.keras.layers.Conv2D(512, 3, padding='same')(x)
    x = tf.keras.layers.BatchNormalization()(x, training=True)
    x = tf.keras.layers.ReLU()(x)
    x = tf.keras.layers.Conv2D(512, 3, padding='same')(x)
    x = tf.keras.layers.BatchNormalization()(x, training=True)
    x = tf.keras.layers.ReLU()(x)
    x = tf.keras.layers.MaxPool2D((1, 2))(x)
    x = tf.keras.layers.Conv2D(512, 2, padding='valid')(x)  # -> [N, W/4-1, 1, 512]
    x = tf.keras.layers.Reshape((t_frames, 512))(x)
    x = tf.keras.layers.Bidirectional(
        tf.keras.layers.LSTM(256, return_sequences=True))(x)
    logits = tf.keras.layers.Dense(64)(x)
    model = tf.keras.Model(inp, logits)
    opt = tf.keras.optimizers.Adam(1e-4)

    rng = np.random.RandomState(0)
    image = rng.rand(batch, width, 32, 1).astype(np.float32)
    labels = rng.randint(1, 63, size=(batch, 6)).astype(np.int32)
    label_len = np.full((batch,), 6, np.int32)
    logit_len = np.full((batch,), t_frames, np.int32)

    @tf.function
    def train_step(image):
        with tf.GradientTape() as tape:
            lg = model(image, training=True)
            loss = tf.reduce_mean(tf.nn.ctc_loss(
                labels=labels, logits=lg, label_length=label_len,
                logit_length=logit_len, logits_time_major=False, blank_index=0))
        grads = tape.gradient(loss, model.trainable_variables)
        grads, _ = tf.clip_by_global_norm(grads, 10.0)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    train_step(image)  # trace/compile
    t0 = time.perf_counter()
    for _ in range(steps):
        train_step(image)
    dt = time.perf_counter() - t0
    return steps * batch / dt


def get_baseline(batch, width, refresh=False):
    if not refresh and os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            d = json.load(f)
        if d.get('batch') == batch and d.get('width') == width:
            return d['images_per_sec']
    ips = bench_tf_cpu_baseline(batch=batch, width=width)
    with open(BASELINE_FILE, 'w') as f:
        json.dump({'images_per_sec': ips, 'batch': batch, 'width': width,
                   'what': 'TF2-CPU equivalent of the reference train step '
                           '(conv+BiLSTM+ctc_loss+Adam), this host'}, f, indent=1)
    return ips


def _run_with_wedge_retry(args):
    """Re-exec the benchmark in a child process and retry once if it wedges.

    The TPU tunnel on this host intermittently WEDGES a fresh process at
    its first device contact (~0% CPU forever, no output; see CLAUDE.md) —
    measured at roughly 1-in-5 process starts on a bad day. A wedged
    driver bench run would lose the round's BENCH json, so the parent
    re-execs itself with BENCH_CHILD=1 and, if the child exceeds a
    deadline scaled to the requested work (base 1800 s for compiles,
    first-run pool render and the timing windows, plus any requested
    sustained seconds), kills it, lets the tunnel settle, and retries
    once."""
    import subprocess
    # argparse already parsed argv (the same argv the child re-parses), so
    # every flag spelling argparse accepts (--flag=value, abbreviations)
    # feeds the deadline
    deadline = (1800 + args.sustained + args.sustained_seconds
                + 2 * args.steps)
    for attempt in (1, 2):
        env = dict(os.environ)
        env['BENCH_CHILD'] = '1'
        child = subprocess.Popen([sys.executable] + sys.argv, env=env,
                                 cwd=REPO)
        try:
            rc = child.wait(timeout=deadline)
        except subprocess.TimeoutExpired:
            child.kill()
            child.wait()
            if attempt == 1:
                print('bench child produced no result in {} s (tunnel '
                      'wedge?); settling 120 s and retrying once'
                      .format(deadline), file=sys.stderr)
                time.sleep(120)
                continue
            print('bench child wedged twice; giving up', file=sys.stderr)
            sys.exit(1)
        sys.exit(rc)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=100,
                    help='train steps per timing window '
                         '({} windows, median)'.format(N_WINDOWS))
    ap.add_argument('--batch', type=int, default=256,
                    help='per-step batch; 256 saturates the v5e MXU '
                         '(~49%% MFU vs ~37%% at the reference\'s 64). '
                         'The TF-CPU baseline is measured at the same batch.')
    ap.add_argument('--width', type=int, default=96)
    ap.add_argument('--cfg', default=None,
                    help='experiment YAML (e.g. lstm/longline.yml) merged '
                         'before --set, so variant sweeps bench the config '
                         "they claim to (label lengths drive the CTC "
                         "kernel's state count S=2L+1)")
    ap.add_argument('--refresh-baseline', action='store_true')
    ap.add_argument('--no-baseline', action='store_true',
                    help='skip the TF-CPU baseline (variant sweeps at '
                         'non-default shapes: do not measure or overwrite '
                         'the cached default-shape baseline)')
    ap.add_argument('--sustained', type=int, default=0, metavar='SECONDS',
                    help='measure sustained END-TO-END training throughput '
                         'instead: the real solver-style loop fed live by '
                         'cfg.DATA_BACKEND for this many seconds '
                         '(device-capability mode cycles prefetched batches)')
    ap.add_argument('--sustained-seconds', type=int, default=45,
                    help='length of the sustained end-to-end phase appended '
                         'to the headline run (0 skips it). The headline '
                         'sustained phase uses the pool backend — the feed '
                         'real training runs use on this 1-core host — so '
                         'the JSON tracks the ACTUAL loop (host feed + '
                         'transfer/gather + device step), not just device '
                         'capability')
    ap.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                    default=None,
                    help="cfg overrides, e.g. --set CONV_IMPL '\"shifted\"' "
                         '(impl A/Bs; the CLI surface semantics)')
    args = ap.parse_args()

    if (os.environ.get('BENCH_CHILD') != '1'
            and os.environ.get('BENCH_NO_RETRY') != '1'):
        _run_with_wedge_retry(args)     # re-execs; does not return

    if args.cfg:
        from lstm_ctc_ocr_tpu.config import cfg_from_file
        cfg_from_file(args.cfg)
    if args.set_cfgs:
        from lstm_ctc_ocr_tpu.config import cfg_from_list
        cfg_from_list(args.set_cfgs)

    if args.sustained:
        from lstm_ctc_ocr_tpu.config import cfg
        ips, steps_done, dt, dev_res = bench_sustained(
            args.sustained, args.batch)
        print(json.dumps({
            'metric': 'captcha images/sec sustained (end-to-end train)',
            'value': round(ips, 2),
            'unit': 'images/sec',
            'vs_baseline': None,
            'backend': str(cfg.DATA_BACKEND),
            'device_resident': dev_res,
            'steps_per_dispatch': int(cfg.TRAIN.STEPS_PER_DISPATCH),
            'renderer': str(cfg.RENDERER),
            'batch': args.batch,
            'steps': steps_done,
            'seconds': round(dt, 1),
        }))
        sys.exit(0)

    ips, flops_per_step, device_kind = bench_tpu_train(
        steps=args.steps, batch=args.batch, width=args.width)
    if args.no_baseline:
        base = None
    else:
        try:
            base = get_baseline(args.batch, args.width,
                                refresh=args.refresh_baseline)
        except Exception as e:
            print('baseline measurement failed ({}); vs_baseline -> null'
                  .format(e), file=sys.stderr)
            base = None

    result = {
        'metric': 'captcha images/sec/chip (train)',
        'value': round(ips, 2),
        'unit': 'images/sec/chip',
        # null, never a fake 1.0 divisor: a raw img/s masquerading as a
        # ratio would claim five orders of magnitude over the >=10x target
        'vs_baseline': round(ips / base, 2) if base else None,
        'device_kind': device_kind,
    }
    if flops_per_step is not None:
        achieved = ips / args.batch * flops_per_step     # FLOP/s sustained
        result['flops_per_step'] = flops_per_step
        result['tflops_achieved'] = round(achieved / 1e12, 2)
        peak = peak_flops_for(device_kind)
        result['mfu'] = round(achieved / peak, 4) if peak else None

    # sustained end-to-end alongside device capability, so a regression in
    # the REAL loop (feed, transfer/gather, dispatch cadence) is
    # driver-visible, not just a regression in the step program. Pool
    # backend: the feed real training runs use here (records needs an
    # untracked dataset file); DATA_DEVICE stays at its default.
    if args.sustained_seconds > 0:
        from lstm_ctc_ocr_tpu.config import cfg
        # the sustained phase measures the LOOP, not the PIL renderer: when
        # the backend is the unbounded synth stream BY DEFAULT (neither
        # --set nor the --cfg YAML chose one), substitute pool so
        # sustained_img_s stays comparable across bench lines. A backend
        # chosen explicitly anywhere — including an explicit synth — is
        # the user's measurement and is honored.
        explicit = bool(args.set_cfgs) and 'DATA_BACKEND' in args.set_cfgs
        if not explicit and args.cfg:
            import yaml
            with open(args.cfg) as f:
                explicit = 'DATA_BACKEND' in (yaml.safe_load(f) or {})
        if not explicit and str(cfg.DATA_BACKEND) == 'synth':
            cfg.DATA_BACKEND = 'pool'
        try:
            s_ips, s_steps, s_dt, dev_res = bench_sustained(
                args.sustained_seconds, args.batch)
            result['sustained_img_s'] = round(s_ips, 2)
            result['sustained_backend'] = str(cfg.DATA_BACKEND)
            result['sustained_device_resident'] = dev_res
            result['sustained_seconds'] = round(s_dt, 1)
        except Exception as e:
            print('sustained phase failed ({}); sustained_img_s -> null'
                  .format(e), file=sys.stderr)
            result['sustained_img_s'] = None
    print(json.dumps(result))
