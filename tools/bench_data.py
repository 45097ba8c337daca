#!/usr/bin/env python
"""Benchmark the HOST side of the pipeline: renderers and data backends.

The device step rate (bench.py) assumes batches are already in host RAM;
on a CPU-weak host the renderer/backend is what actually bounds sustained
end-to-end training (reference analogue: the 12 multiprocess captcha
workers, /root/reference/lib/lstm/utils/gen.py:112-128). This tool
measures each renderer's raw image rate and each backend's steady-state
batch rate, printing one JSON line per measurement.

Run anywhere (host-only, no TPU):  python tools/bench_data.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstm_ctc_ocr_tpu.config import cfg  # noqa: E402


def bench_renderer(name: str, n: int) -> dict:
    import random
    from lstm_ctc_ocr_tpu.data import gen
    cfg.RENDERER = name
    rng = random.Random(0)

    def render():
        # equal work across renderers: a model-height grayscale array
        # (the native renderer resizes in C; the PIL path resizes in
        # group_batch, so fold it in here)
        img, _ = gen.generate_img(rng)
        if img.shape[0] != int(cfg.IMG_HEIGHT):
            img = gen._resize_keep_aspect(img, int(cfg.IMG_HEIGHT))
        return img

    render()                                   # warm font/atlas caches
    t0 = time.perf_counter()
    for _ in range(n):
        render()
    dt = time.perf_counter() - t0
    return {'renderer': name, 'img_per_sec': round(n / dt, 1)}


def bench_backend(name: str, batch: int, n_batches: int) -> dict:
    import jax
    seed = int(cfg.RNG_SEED)
    n_examples = 0
    if name == 'records':
        from lstm_ctc_ocr_tpu.data.records import RecordsDataset
        path = str(cfg.RECORDS_PATH)
        if not os.path.exists(path):
            return {'backend': name, 'skipped': 'no records file at ' + path}
        ds = RecordsDataset(path)
        n_examples = len(ds)
        stream = ds.batch_iterator(batch, shuffle=True, seed=seed)
    elif name == 'pool':
        from lstm_ctc_ocr_tpu.data.pool import PoolSampler
        stream = PoolSampler(int(cfg.POOL_SIZE), seed=seed,
                             verbose=False).batch_iterator(batch)
    else:
        from lstm_ctc_ocr_tpu.data.gen import get_batch
        from lstm_ctc_ocr_tpu.engine.train import effective_workers
        workers = effective_workers(int(cfg.TRAIN.NUM_WORKERS))
        stream = get_batch(num_workers=workers, seed=seed,
                           batch_size=batch, bucketed=True)
    # records: one full epoch fills the resized-image cache — training
    # runs many epochs over a fixed set, so steady-state is the real rate
    warm = (n_examples // batch + 2) if name == 'records' else 3
    warm_truncated = warm > 4000               # huge dataset: partially cold
    try:
        for _ in range(min(warm, 4000)):       # warmup / queue/cache fill
            next(stream)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(stream)
        dt = time.perf_counter() - t0
    finally:
        close = getattr(stream, 'close', None)
        if close:
            close()
    out = {'backend': name, 'batch': batch,
           'batches_per_sec': round(n_batches / dt, 2),
           'img_per_sec': round(n_batches * batch / dt, 1)}
    if warm_truncated:
        out['warm_truncated'] = True   # cache not fully warm: NOT steady-state
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--batches', type=int, default=20,
                    help='timed batches per backend')
    ap.add_argument('--images', type=int, default=100,
                    help='timed renders per renderer')
    ap.add_argument('--renderers', default='captcha,native')
    ap.add_argument('--backends', default='synth,pool,records')
    ap.add_argument('--pool-size', type=int, default=2000,
                    help='pool backend size (startup cost only; steady-state '
                         'rate is set by POOL_REFRESH renders per batch)')
    args = ap.parse_args()

    for r in args.renderers.split(','):
        try:
            print(json.dumps(bench_renderer(r.strip(), args.images)),
                  flush=True)
        except Exception as e:
            print(json.dumps({'renderer': r.strip(), 'error': str(e)}),
                  flush=True)
    cfg.RENDERER = 'captcha'
    cfg.POOL_SIZE = args.pool_size
    for b in args.backends.split(','):
        try:
            print(json.dumps(bench_backend(b.strip(), args.batch,
                                           args.batches)), flush=True)
        except Exception as e:
            print(json.dumps({'backend': b.strip(), 'error': str(e)}),
                  flush=True)


if __name__ == '__main__':
    main()
