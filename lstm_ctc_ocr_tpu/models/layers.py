"""Functional layer library: each layer is an (init, apply) pair.

TPU-native counterpart of the reference's TF layer methods on the Network
base class (/root/reference/lib/networks/network.py): ``conv_single``
(:161-191), ``max_pool``/``avg_pool`` (:344-359), ``reshape_squeeze_layer``
(:362-368), ``bi_lstm`` (:97-129), ``lstm`` (:131-152), ``fc`` (:416-444),
``softmax`` (:447-451), ``dropout`` (:627-628), and batch norm
(tf.contrib.layers.batch_norm with is_training=True, :176-178).

Conventions:
* image tensors are ``[N, W, H, C]`` — the width axis is the CTC time axis,
  exactly the reference's layout (data placeholder [N, T=W, 32], expanded at
  conv_single, network.py:165);
* ``init(rng, in_shape(s)) -> (params, out_shape)`` with analytic shape
  math (SAME/VALID), ``apply(params, x, ctx) -> y`` pure;
* params are float32; ``ctx['dtype']`` selects the compute dtype (bfloat16
  on TPU) — casts happen at the layer boundary and accumulation stays f32
  via ``preferred_element_type``.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import rnn as rnn_ops


def _out_dim(size: int, k: int, s: int, padding: str) -> int:
    if padding == 'SAME':
        return -(-size // s)
    return -(-(size - k + 1) // s)


def _cast(x, ctx):
    dt = ctx.get('dtype')
    return x.astype(dt) if dt is not None else x


# --- conv_single (network.py:161-191) --------------------------------------

def conv_single_init(rng, in_shape, k_h, k_w, c_o, s_h, s_w, c_i=None,
                     bn=False, biased=True, padding='SAME'):
    n, w, h = in_shape[0], in_shape[1], in_shape[2]
    if c_i is None:
        c_i = in_shape[3] if len(in_shape) > 3 else 1
    kernel = jax.nn.initializers.glorot_uniform()(
        rng, (k_h, k_w, c_i, c_o), jnp.float32)   # xavier (network.py:168)
    params = {'kernel': kernel}
    if biased:
        params['biases'] = jnp.zeros((c_o,), jnp.float32)
    if bn:
        params['bn_gamma'] = jnp.ones((c_o,), jnp.float32)
        params['bn_beta'] = jnp.zeros((c_o,), jnp.float32)
    out = (n, _out_dim(w, k_h, s_h, padding), _out_dim(h, k_w, s_w, padding), c_o)
    return params, out


def conv_single_apply(params, x, ctx, k_h, k_w, c_o, s_h, s_w, c_i=None,
                      bn=False, biased=True, relu=True, padding='SAME'):
    if x.ndim == 3:  # [N, W, H] single-channel -> [N, W, H, 1] (network.py:165)
        x = x[..., None]
    x = _cast(x, ctx)
    kernel = _cast(params['kernel'], ctx)
    # conv runs in the compute dtype (bf16 on TPU: the MXU still accumulates
    # in f32 internally); avoid preferred_element_type here — a widened
    # output dtype breaks the conv transpose (VJP) dtype agreement
    from ..config import cfg
    ci = kernel.shape[2]
    if str(cfg.CONV_IMPL) == 'shifted' and k_h * k_w * ci >= 256:
        # shifted-matmul lowering for the channel-heavy convs (ops/conv.py):
        # identical numerics, MXU-shaped dot_generals fwd AND bwd
        from ..ops.conv import conv2d_shifted
        y = conv2d_shifted(x, kernel, (s_h, s_w), padding)
    else:
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(s_h, s_w), padding=padding,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if biased:
        y = y + _cast(params['biases'], ctx)
    if bn:
        # tf.contrib.layers.batch_norm(is_training=True): batch statistics
        # in BOTH train and test graphs (reference quirk; network.py:176-178,
        # LSTM_test builds the same bn=True graph). Stats in f32.
        # ctx['bn_stats'] (cfg.BN_EVAL='moving' eval) substitutes frozen EMA
        # statistics; ctx['bn_collect'] (train step) receives this layer's
        # batch statistics so the caller can maintain the EMA.
        y32 = y.astype(jnp.float32)
        name = ctx.get('layer')
        stats = ctx.get('bn_stats')
        if stats is not None and name in stats:
            mean = stats[name]['mean'].astype(jnp.float32).reshape(1, 1, 1, -1)
            var = stats[name]['var'].astype(jnp.float32).reshape(1, 1, 1, -1)
        else:
            mean = jnp.mean(y32, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(y32, axis=(0, 1, 2), keepdims=True)
            coll = ctx.get('bn_collect')
            if coll is not None and name is not None:
                coll[name] = {'mean': mean.reshape(-1), 'var': var.reshape(-1)}
        y32 = (y32 - mean) * jax.lax.rsqrt(var + 1e-3)
        y = _cast(y32 * params['bn_gamma'] + params['bn_beta'], ctx)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), y.dtype))
    return _cast(y, ctx)


# --- pooling (network.py:344-359) -------------------------------------------

def max_pool_apply(x, ctx, k_h, k_w, s_h, s_w, padding='SAME'):
    # NB: init must be a weak-typed python scalar — jax only recognises the
    # select-based max-pool VJP for the literal -inf pattern
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k_h, k_w, 1), (1, s_h, s_w, 1), padding)


def avg_pool_apply(x, ctx, k_h, k_w, s_h, s_w, padding='SAME'):
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k_h, k_w, 1), (1, s_h, s_w, 1), padding)
    return summed / (k_h * k_w)


def pool_out_shape(in_shape, k_h, k_w, s_h, s_w, padding='SAME'):
    n, w, h, c = in_shape
    return (n, _out_dim(w, k_h, s_h, padding), _out_dim(h, k_w, s_w, padding), c)


# --- reshape bridge CNN -> RNN (network.py:362-368) --------------------------

def reshape_squeeze_apply(x, ctx, d):
    """[N, W', H', C] -> [N, W'*H', d]: collapse the (time, 1) spatial grid
    into a time axis of d-dim feature vectors."""
    n = x.shape[0]
    return jnp.reshape(x, (n, -1, d))


# --- BiLSTM head with projection (network.py:97-129) -------------------------

def bi_lstm_init(rng, in_shape, num_hids, num_layers, nclasses, weight_decay):
    n, t, d = in_shape
    k_cells, k_proj = jax.random.split(rng)
    params = {'cells': rnn_ops.bilstm_init(k_cells, d, num_hids)}
    # variance_scaling(factor=0.01, FAN_AVG, normal) (network.py:119)
    w_init = jax.nn.initializers.variance_scaling(
        0.01, 'fan_avg', 'truncated_normal')
    params['weights'] = w_init(k_proj, (num_hids, nclasses), jnp.float32)
    params['biases'] = jnp.zeros((nclasses,), jnp.float32)
    return params, (t, n, nclasses)   # time-major logits, like the reference


def bi_lstm_apply(params, x, lens, ctx, num_hids, num_layers, nclasses):
    x = _cast(x, ctx)
    cells = jax.tree.map(lambda p: _cast(p, ctx), params['cells'])
    out = rnn_ops.bilstm(cells, x, lens)               # [N, T, num_hids]
    # projection head in f32: tiny matmul, and CTC wants full-precision logits
    logits = jnp.einsum('nth,hc->ntc', out.astype(jnp.float32),
                        params['weights']) + params['biases']
    return jnp.transpose(logits, (1, 0, 2))            # [T, N, C] (network.py:128)


# --- stacked unidirectional LSTM variant (network.py:131-152) ----------------

def lstm_init(rng, in_shape, num_hids, num_layers, nclasses, weight_decay):
    n, t, d = in_shape
    keys = jax.random.split(rng, num_layers + 1)
    cells = []
    dim = d
    for i in range(num_layers):
        cells.append(rnn_ops.lstm_init(keys[i], dim, num_hids))
        dim = num_hids
    w_init = jax.nn.initializers.truncated_normal(0.1)  # network.py:144
    params = {'cells': cells,
              'weights': w_init(keys[-1], (num_hids, nclasses), jnp.float32),
              'biases': jnp.zeros((nclasses,), jnp.float32)}
    return params, (t, n, nclasses)


def lstm_apply(params, x, lens, ctx, num_hids, num_layers, nclasses):
    x_tm = jnp.swapaxes(_cast(x, ctx), 0, 1)
    scan = rnn_ops.select_scan()          # honors cfg.LSTM_IMPL
    for cell in params['cells']:
        cell = jax.tree.map(lambda p: _cast(p, ctx), cell)
        x_tm = scan(cell, x_tm, lens)
    out = jnp.swapaxes(x_tm, 0, 1)
    logits = jnp.einsum('nth,hc->ntc', out.astype(jnp.float32),
                        params['weights']) + params['biases']
    return jnp.transpose(logits, (1, 0, 2))


# --- fc / softmax / dropout (network.py:416-459, 627-628) --------------------

def fc_init(rng, in_shape, num_out):
    d = in_shape[-1]
    k_w, _ = jax.random.split(rng)
    w = jax.nn.initializers.glorot_uniform()(k_w, (d, num_out), jnp.float32)
    return {'weights': w, 'biases': jnp.zeros((num_out,), jnp.float32)}, \
        tuple(in_shape[:-1]) + (num_out,)


def fc_apply(params, x, ctx, num_out, relu=True):
    x = _cast(x, ctx)
    y = x @ _cast(params['weights'], ctx) + params['biases']
    return jnp.maximum(y, 0.0) if relu else y


def softmax_apply(x, ctx):
    return jax.nn.softmax(x, axis=-1)


def dropout_apply(x, ctx, keep_prob):
    if not ctx.get('train', False) or keep_prob >= 1.0:
        return x
    rng = ctx['rng']
    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(keep, x / keep_prob, 0.0).astype(x.dtype)
