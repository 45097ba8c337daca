"""A/B: fold the collapsed H axis into channels for the late conv stack.

The MFU-ceiling experiment PERF.md pre-registered: the FLOP-dominant late
convs (reference LSTM_train.py:31-35) run at H in {4, 2} — spatial extents
that pad against the TPU's 8x128 tile grid. This lowers the late stack
(conv4_1 -> conv4_2 -> pool3 -> conv5) to an H=1 layout where H lives in
the channel axis:

* conv4_x (3x3 SAME over [W, H=4]) becomes a dense 3x1 conv with a
  block-tridiagonal [4*Ci, 4*Co] kernel built inside the traced fn —
  1.33x the FLOPs (12 H-blocks instead of the tridiagonal 9+boundary),
  the bet being a denser MXU mapping pays for them.
* BN/ReLU are layout-agnostic (free reshape to per-Co stats, exactly the
  production BN of models/layers.py:conv_single_apply).
* pool3 (1x2 over H) is a max over adjacent channel blocks.
* conv5 (2x2 VALID at H=2) folds EXACTLY: a 2x1 conv with the [2*Ci, Co]
  reshaped kernel — FLOP-neutral.

Both paths share one param pytree; the fold happens under jit so the
backward pass pays the same reshape/scatter cost an integrated version
would. Numerics are asserted equal in f32 before timing in bf16.

Ship bar (VERDICT r3 item 8): >=5% full-train-step win at batch 256
(~0.83 ms of the 16.5 ms step). Otherwise this records the measurement
and closes the perf chapter.

Usage:  python tools/bench_fold_h.py [--batch 256] [--width 24]
Smoke:  JAX_PLATFORMS=cpu python tools/bench_fold_h.py --check-only
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
    jax.config.update('jax_platforms', 'cpu')
import jax
import jax.numpy as jnp


# --- shared param construction ----------------------------------------------

def make_params(rng):
    def k(*shape, scale=0.05):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)
    return {
        'conv4_1': {'kernel': k(3, 3, 256, 512), 'biases': jnp.zeros((512,)),
                    'bn_gamma': jnp.ones((512,)), 'bn_beta': jnp.zeros((512,))},
        'conv4_2': {'kernel': k(3, 3, 512, 512), 'biases': jnp.zeros((512,)),
                    'bn_gamma': jnp.ones((512,)), 'bn_beta': jnp.zeros((512,))},
        'conv5': {'kernel': k(2, 2, 512, 512), 'biases': jnp.zeros((512,))},
    }


def bn_relu(y, gamma, beta, relu=True):
    """The production BN (models/layers.py conv_single_apply, bn=True):
    f32 batch stats over (N, W, H), eps 1e-3."""
    dt = y.dtype
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(y32, axis=(0, 1, 2), keepdims=True)
    y32 = (y32 - mean) * jax.lax.rsqrt(var + 1e-3)
    y = (y32 * gamma + beta).astype(dt)
    return jnp.maximum(y, jnp.zeros((), y.dtype)) if relu else y


# --- baseline path (exact production geometry) -------------------------------

def conv(x, kernel, padding):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1), padding=padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def late_stack_baseline(params, x):
    p = params['conv4_1']
    y = bn_relu(conv(x, p['kernel'], 'SAME') + p['biases'].astype(x.dtype),
                p['bn_gamma'], p['bn_beta'])
    p = params['conv4_2']
    y = bn_relu(conv(y, p['kernel'], 'SAME') + p['biases'].astype(x.dtype),
                p['bn_gamma'], p['bn_beta'])
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                              (1, 1, 2, 1), (1, 1, 2, 1), 'VALID')  # pool3
    p = params['conv5']
    return conv(y, p['kernel'], 'VALID') + p['biases'].astype(x.dtype)


# --- folded path --------------------------------------------------------------

def fold_tridiag(kernel, hn):
    """[kw, 3, ci, co] SAME-over-H conv kernel -> [kw, 1, hn*ci, hn*co]
    block-tridiagonal folded kernel. Output y_f block h gets x_f block hp
    through K[:, hp - h + 1] (zero outside the 3-tap window)."""
    kw, kh, ci, co = kernel.shape
    zero = jnp.zeros((kw, ci, co), kernel.dtype)
    rows = []
    for hp in range(hn):
        row = [kernel[:, hp - h + 1] if 0 <= hp - h + 1 < kh else zero
               for h in range(hn)]
        rows.append(jnp.concatenate(row, axis=-1))      # [kw, ci, hn*co]
    return jnp.concatenate(rows, axis=1)[:, None]       # [kw, 1, hn*ci, hn*co]


def late_stack_folded(params, x):
    n, w, hn, ci = x.shape
    xf = x.reshape(n, w, 1, hn * ci)                    # fold H into channels
    for name in ('conv4_1', 'conv4_2'):
        p = params[name]
        co = p['kernel'].shape[-1]
        wf = fold_tridiag(p['kernel'], hn).astype(xf.dtype)
        y = conv(xf, wf, 'SAME') + jnp.tile(p['biases'], hn).astype(xf.dtype)
        # BN stats are per-Co across the folded blocks: free reshape
        y = bn_relu(y.reshape(n, w, hn, co), p['bn_gamma'], p['bn_beta'])
        xf = y.reshape(n, w, 1, hn * co)
    # pool3: max over adjacent H blocks
    co = y.shape[-1]
    y = jnp.maximum(y[:, :, 0::2], y[:, :, 1::2])       # [n, w, hn/2, co]
    hn //= 2
    xf = y.reshape(n, w, 1, hn * co)
    # conv5 2x2 VALID at H=2: exact fold, [2, 1, 2*ci, co]
    p = params['conv5']
    wf5 = p['kernel'].reshape(2, 1, 2 * co, -1)   # (k_H, Ci) flatten = fold order
    return conv(xf, wf5.astype(xf.dtype), 'VALID') + p['biases'].astype(xf.dtype)


# --- harness ------------------------------------------------------------------

def median_secs(fn, *args, windows=9, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / reps)
    return float(np.median(samples))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--width', type=int, default=24,
                    help='post-pool W (default bucket W=96 -> 24)')
    ap.add_argument('--check-only', action='store_true')
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    params = make_params(rng)
    n, w = args.batch, args.width

    # numeric equivalence in f32 (small batch: this is a correctness gate).
    # Pin true-f32 matmul passes: TPU "f32" convs default to bf16 passes,
    # which would fail the 1e-4 gate for numerics reasons, not layout ones.
    x32 = jnp.asarray(rng.randn(8, w, 4, 256).astype(np.float32))
    with jax.default_matmul_precision('float32'):
        a = jax.jit(late_stack_baseline)(params, x32)
        b = jax.jit(late_stack_folded)(params, x32)
    assert a.shape == b.shape, (a.shape, b.shape)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(json.dumps({'check': 'fold_h equivalence', 'rel_err': err,
                      'shape': list(a.shape)}))
    assert err < 1e-4, err
    if args.check_only:
        return

    x = jax.device_put(jnp.asarray(
        rng.randn(n, w, 4, 256).astype(np.float32), jnp.bfloat16))

    def loss_of(stack):
        def f(p, v):
            y = stack(p, v)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.jit(jax.value_and_grad(f))

    for tag, stack in (('baseline_H4', late_stack_baseline),
                       ('fold_h_H1', late_stack_folded)):
        fwd = jax.jit(stack)
        t_fwd = median_secs(fwd, params, x)
        t_fb = median_secs(loss_of(stack), params, x)
        print(json.dumps({'variant': tag, 'batch': n, 'w': w,
                          'fwd_ms': round(t_fwd * 1e3, 3),
                          'fwd_bwd_ms': round(t_fb * 1e3, 3)}))


if __name__ == '__main__':
    main()
