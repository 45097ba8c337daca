"""A/B: fused conv3x3+BN+ReLU Pallas kernel vs XLA's unfused composition.

Times the FORWARD of conv4_1 / conv4_2's real geometry (reference
LSTM_train.py:31-33; W=96 bucket -> W/4=24, H=4) at the bench batch.
Methodology per PERF.md: median of timed windows, each closed by a
device->host readback. JSON line per (shape, impl).

Smoke on CPU: JAX_PLATFORMS=cpu (interpret mode — timings meaningless,
correctness only).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get('JAX_PLATFORMS') == 'cpu':
    import jax
    jax.config.update('jax_platforms', 'cpu')
import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.models.layers import conv_single_apply
from lstm_ctc_ocr_tpu.ops.conv_bn_pallas import conv3x3_bn_relu


def median_secs(fn, *args, windows=9, reps=8):
    out = fn(*args)
    np.asarray(out)
    samples = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        samples.append((time.perf_counter() - t0) / reps)
    return float(np.median(samples))


def run(tag, n, w, h, ci, co, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rng.randn(n, w, h, ci).astype(np.float32), dtype))
    params = {
        'kernel': jax.device_put(jnp.asarray(
            rng.randn(3, 3, ci, co).astype(np.float32) * 0.05)),
        'biases': jax.device_put(jnp.zeros((co,), jnp.float32)),
        'bn_gamma': jax.device_put(jnp.ones((co,), jnp.float32)),
        'bn_beta': jax.device_put(jnp.zeros((co,), jnp.float32)),
    }
    unfused = jax.jit(lambda p, v: conv_single_apply(
        p, v, {'dtype': dtype}, 3, 3, co, 1, 1,
        bn=True, biased=True, relu=True, padding='SAME'))
    fused = jax.jit(lambda p, v: conv3x3_bn_relu(
        v, p['kernel'], p['biases'], p['bn_gamma'], p['bn_beta']))

    a = np.asarray(unfused(params, x)).astype(np.float32)
    b = np.asarray(fused(params, x)).astype(np.float32)
    err = float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-6))

    flops = n * w * h * co * ci * 9 * 2
    for impl, fn in (('xla_unfused', unfused), ('pallas_fused', fused)):
        secs = median_secs(fn, params, x)
        print(json.dumps({
            'shape': tag, 'n': n, 'w': w, 'h': h, 'ci': ci, 'co': co,
            'impl': impl, 'ms': round(secs * 1e3, 4),
            'tflops': round(flops / secs / 1e12, 2),
            'rel_err_vs_unfused': round(err, 6),
        }), flush=True)


def main():
    print('devices:', jax.devices(), file=sys.stderr)
    smoke = os.environ.get('JAX_PLATFORMS') == 'cpu'
    n = 16 if smoke else 256
    run('conv4_1', n, 24, 4, 256, 512)
    run('conv4_2', n, 24, 4, 512, 512)


if __name__ == '__main__':
    main()
