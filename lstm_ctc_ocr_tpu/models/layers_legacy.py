"""Legacy layer vocabulary: the PVANet/FCN-heritage layers of the reference.

The reference's ``Network`` base class carries a large layer vocabulary
inherited from the Fast-R-CNN/PVANet codebase it was forked from
(/root/reference/lib/networks/network.py:194-337, 370-412, 454-623,
639-644).  None of these are used by the live OCR model, but they are part
of the reference's public DSL surface, so the rebuild provides functional
TPU-native equivalents: each is an ``(init, apply)`` pair over explicit
parameter pytrees, composing with the spec-recording DSL in
``models/network.py`` exactly like the live layers in ``models/layers.py``.

Semantics notes (faithful to the reference, documented where odd):

* ``conv`` (network.py:194-216): general NHWC conv, xavier kernel, zero
  bias, optional relu — identical to ``conv_single`` minus the 3-D
  single-channel expansion and the bn option.
* ``conv_zero`` (:219-242): same but the kernel is ZERO-initialised.
* ``conv_norm`` (:245-269): variance-scaling(0.001, FAN_AVG, normal)
  kernel; with bias+relu it is conv→bias→batchnorm→relu; with
  ``biased=False, relu=True`` the reference applies **crelu** (concat of
  relu(x) and relu(−x), doubling channels).
* ``conv_final`` (:272-297): conv_norm with the input channel count
  hard-coded to 128 (a PVANet artifact); we validate instead of crashing.
* ``upconv`` (:300-337): transposed conv, variance-scaling(0.001) kernel,
  output spatial dims = input×stride (or an explicit shape).
* ``batch_normalization`` (:467-473): tf.contrib batch_norm with
  scale+center.  The reference never runs TF's UPDATE_OPS, so with
  ``is_training=False`` the moving statistics stay at their (0, 1) init
  forever — we reproduce that frozen behaviour exactly (moving stats are
  constants in the param tree, never updated by any optimizer step because
  gradients through them are zero-filtered by value).
* ``scale`` (:613-623): learnable per-channel affine y = αx + β with its
  own tiny weight decay (1e-5) in the reference; the DSL registers α for
  L2 the same way.
* ``pva_negation_block`` (:497-516), ``pva_negation_block_v2`` (:519-539),
  ``pva_inception_res_stack`` (:542-598), ``pva_inception_res_block``
  (:601-611): composite PVANet blocks rebuilt structurally from the
  primitives above.
* ``smooth_l1_dist`` (:639-644): pure function.

All convs run in the compute dtype (bf16 on TPU) with f32 parameters,
mirroring ``models/layers.py`` conventions.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .layers import _cast, _out_dim


def _vs_init(factor):
    return jax.nn.initializers.variance_scaling(factor, 'fan_avg',
                                                'truncated_normal')


# --- general conv family (network.py:194-297) --------------------------------

def conv_init(rng, in_shape, k_h, k_w, c_o, s_h, s_w, c_i=None,
              biased=True, padding='SAME', kernel_init='xavier'):
    n, h, w = in_shape[0], in_shape[1], in_shape[2]
    if c_i is None:
        c_i = in_shape[3]
    elif in_shape[3] != c_i:
        raise ValueError(
            'conv: declared c_i={} but input has {} channels (the reference '
            'would crash here too, e.g. conv_final hard-codes c_i=128, '
            'network.py:276)'.format(c_i, in_shape[3]))
    if kernel_init == 'xavier':
        init = jax.nn.initializers.glorot_uniform()
    elif kernel_init == 'zero':
        init = jax.nn.initializers.zeros
    else:  # variance-scaling factor
        init = _vs_init(float(kernel_init))
    params = {'kernel': init(rng, (k_h, k_w, c_i, c_o), jnp.float32)}
    if biased:
        params['biases'] = jnp.zeros((c_o,), jnp.float32)
    out = (n, _out_dim(h, k_h, s_h, padding), _out_dim(w, k_w, s_w, padding),
           c_o)
    return params, out


def conv_apply(params, x, ctx, k_h, k_w, c_o, s_h, s_w, biased=True,
               relu=True, padding='SAME'):
    x = _cast(x, ctx)
    y = jax.lax.conv_general_dilated(
        x, _cast(params['kernel'], ctx), window_strides=(s_h, s_w),
        padding=padding, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if biased:
        y = y + _cast(params['biases'], ctx)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), y.dtype))
    return y


def conv_norm_init(rng, in_shape, k_h, k_w, c_o, s_h, s_w, c_i=None,
                   biased=True, relu=True, padding='SAME'):
    k_conv, _ = jax.random.split(rng)
    params, out = conv_init(k_conv, in_shape, k_h, k_w, c_o, s_h, s_w, c_i,
                            biased, padding, kernel_init='0.001')
    if biased and relu:     # the BN path (network.py:259-263)
        params.update(batch_norm_init(c_o))
    elif not biased and relu:   # the crelu path doubles channels (:268)
        out = out[:3] + (2 * c_o,)
    return params, out


def conv_norm_apply(params, x, ctx, k_h, k_w, c_o, s_h, s_w, biased=True,
                    relu=True, padding='SAME'):
    y = conv_apply(params, x, ctx, k_h, k_w, c_o, s_h, s_w, biased,
                   relu=False, padding=padding)
    if biased and relu:
        y = batch_norm_apply(params, y, ctx, is_training=True)
        return jnp.maximum(y, jnp.zeros((), y.dtype))
    if not biased and relu:   # crelu
        return jnp.concatenate(
            [jnp.maximum(y, 0.0), jnp.maximum(-y, 0.0)], axis=-1)
    return y


def _upconv_out_dims(in_shape, ksize, stride, shape):
    h, w = in_shape[1], in_shape[2]
    if shape is None:
        return h * stride, w * stride
    out_h, out_w = int(shape[1]), int(shape[2])
    for name, i, o in (('height', h, out_h), ('width', w, out_w)):
        # TF validity: the forward conv of size o with SAME padding and this
        # stride must produce i, i.e. ceil(o/s) == i
        if not ((i - 1) * stride < o <= i * stride):
            raise ValueError(
                'upconv: requested output {} {} is unreachable from input '
                '{} with stride {} (tf.nn.conv2d_transpose would reject '
                'this output_shape too)'.format(name, o, i, stride))
    return out_h, out_w


def upconv_init(rng, in_shape, c_o, ksize=4, stride=2, shape=None,
                biased=False):
    n, h, w, c_in = in_shape
    out_h, out_w = _upconv_out_dims(in_shape, ksize, stride, shape)
    # tf.nn.conv2d_transpose filter layout is [k, k, c_out, c_in]
    # (network.py:315); kept as-is in the pytree, rearranged at apply time.
    params = {'kernel': _vs_init(0.001)(rng, (ksize, ksize, c_o, c_in),
                                        jnp.float32)}
    if biased:
        params['biases'] = jnp.zeros((c_o,), jnp.float32)
    return params, (n, out_h, out_w, c_o)


def upconv_apply(params, x, ctx, c_o, ksize=4, stride=2, shape=None,
                 biased=False, relu=True):
    """Exact tf.nn.conv2d_transpose: the input-gradient of a forward SAME
    conv from the requested output size back to the input size. Expressed
    directly as a dilated conv so explicit output_shapes get the same
    padding split TF derives from them (pad_total computed on the *output*
    size; a plain 'SAME' conv_transpose only matches when out == in*s and
    (k - s) is even — the general case needs this formulation)."""
    x = _cast(x, ctx)
    kernel = _cast(params['kernel'], ctx)          # [k, k, c_o, c_in]
    out_h, out_w = _upconv_out_dims(x.shape, ksize, stride, shape)

    def grad_pads(i, o):
        p_total = max((i - 1) * stride + ksize - o, 0)
        p_lo = p_total // 2
        p_hi = p_total - p_lo
        adj = (o + p_total - ksize) % stride
        return (ksize - 1 - p_lo, ksize - 1 - p_hi + adj)

    # rot180 spatially; treat as HWIO mapping c_in -> c_o
    k_grad = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))
    y = jax.lax.conv_general_dilated(
        x, k_grad, window_strides=(1, 1),
        padding=[grad_pads(x.shape[1], out_h), grad_pads(x.shape[2], out_w)],
        lhs_dilation=(stride, stride),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if biased:
        y = y + _cast(params['biases'], ctx)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), y.dtype))
    return y


# --- lrn (network.py:405-412) ------------------------------------------------

def lrn_apply(x, ctx, radius, alpha, beta, bias=1.0):
    """tf.nn.local_response_normalization: per-position window sum of
    squares over the channel axis; x / (bias + alpha * sum)^beta."""
    x32 = x.astype(jnp.float32)
    sq = jnp.square(x32)
    # window sum over channels with radius on each side
    pad = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(radius, radius)])
    n_c = x.shape[-1]
    idx = jnp.arange(n_c)
    win = jnp.cumsum(pad, axis=-1)
    win = jnp.concatenate([jnp.zeros_like(win[..., :1]), win], axis=-1)
    total = win[..., idx + 2 * radius + 1] - win[..., idx]
    denom = jnp.power(bias + alpha * total, beta)
    return _cast(x32 / denom, ctx)


# --- reshape family (network.py:370-402) ------------------------------------

def reshape_layer_apply(x, ctx, d, name=''):
    """The FCN/RPN channel-regroup reshape. Generic branch
    (network.py:386-392): [N,H,W,C] -> transpose to [N,C,H,W], regroup the
    channel axis into d, -> [N, H*C/d, W] spatial, transpose back."""
    n, h, w, c = x.shape
    if name == 'rpn_cls_prob_reshape':
        new_h = int(h / d * c)                  # (network.py:378-384)
    else:
        new_h = int(h * (c / d))                # (network.py:386-392)
    y = jnp.transpose(x, (0, 3, 1, 2))
    y = jnp.reshape(y, (n, int(d), new_h, w))
    return jnp.transpose(y, (0, 2, 3, 1))


def spatial_reshape_layer_apply(x, ctx, d):
    """[N, H, W, A*d] -> [N, H, W*A, d] (network.py:395-402)."""
    n, h = x.shape[0], x.shape[1]
    return jnp.reshape(x, (n, h, -1, int(d)))


def spatial_softmax_apply(x, ctx):
    """Softmax over the channel axis of [N,H,W,C] (network.py:455-459)."""
    return jax.nn.softmax(x, axis=-1)


# --- elementwise / affine (network.py:461-478, 613-623) ----------------------

def add_apply(xs, ctx):
    return xs[0] + xs[1]


def negation_apply(x, ctx):
    return x * -1.0


def scale_init(c_in):
    return {'alpha': jnp.ones((c_in,), jnp.float32),
            'beta': jnp.zeros((c_in,), jnp.float32)}


def scale_apply(params, x, ctx):
    return _cast(x * params['alpha'] + params['beta'], ctx)


def batch_norm_init(c):
    return {'bn_gamma': jnp.ones((c,), jnp.float32),
            'bn_beta': jnp.zeros((c,), jnp.float32),
            # frozen moving stats: never updated (the reference never runs
            # UPDATE_OPS, network.py:467-473 + lib/lstm/train.py)
            'bn_moving_mean': jnp.zeros((c,), jnp.float32),
            'bn_moving_var': jnp.ones((c,), jnp.float32)}


def batch_norm_apply(params, x, ctx, is_training=False, eps=1e-3):
    x32 = x.astype(jnp.float32)
    if is_training:
        mean = jnp.mean(x32, axis=tuple(range(x.ndim - 1)), keepdims=False)
        var = jnp.var(x32, axis=tuple(range(x.ndim - 1)), keepdims=False)
    else:
        mean = jax.lax.stop_gradient(params['bn_moving_mean'])
        var = jax.lax.stop_gradient(params['bn_moving_var'])
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return _cast(y * params['bn_gamma'] + params['bn_beta'], ctx)


def batch_normalization_apply(params, x, ctx, relu=True, is_training=False):
    y = batch_norm_apply(params, x, ctx, is_training)
    return jnp.maximum(y, jnp.zeros((), y.dtype)) if relu else y


# --- PVANet composite blocks (network.py:481-611) ----------------------------

def bn_scale_combo_init(rng, in_shape, c_in):
    return {'bn': batch_norm_init(c_in)}, in_shape


def bn_scale_combo_apply(params, x, ctx, c_in, relu=True):
    """BN (frozen stats) -> [Relu] (network.py:481-494; the Scale step is
    commented out in the reference, so there is none here either)."""
    y = batch_norm_apply(params['bn'], x, ctx, is_training=False)
    return jnp.maximum(y, jnp.zeros((), y.dtype)) if relu else y


def pva_negation_block_init(rng, in_shape, k_h, k_w, c_o, s_h, s_w,
                            biased=True, padding='SAME', scale=True,
                            negation=True):
    k_conv, _ = jax.random.split(rng)
    conv_p, out = conv_init(k_conv, in_shape, k_h, k_w, c_o, s_h, s_w,
                            biased=biased, padding=padding)
    params = {'conv': conv_p, 'bn': batch_norm_init(c_o)}
    c_in = c_o * (2 if negation else 1)
    if scale:
        params['scale'] = scale_init(c_in)
    return params, out[:3] + (c_in,)


def pva_negation_block_apply(params, x, ctx, k_h, k_w, c_o, s_h, s_w,
                             biased=True, padding='SAME', scale=True,
                             negation=True):
    """Conv -> BN -> [Neg -> Concat] -> [Scale] -> Relu (network.py:497-516)."""
    y = conv_apply(params['conv'], x, ctx, k_h, k_w, c_o, s_h, s_w, biased,
                   relu=False, padding=padding)
    y = batch_norm_apply(params['bn'], y, ctx, is_training=False)
    if negation:
        y = jnp.concatenate([y, -y], axis=-1)
    if scale:
        y = scale_apply(params['scale'], y, ctx)
    return jnp.maximum(y, jnp.zeros((), y.dtype))


def pva_negation_block_v2_init(rng, in_shape, k_h, k_w, c_o, s_h, s_w, c_in,
                               biased=True, padding='SAME', negation=True):
    k_conv, _ = jax.random.split(rng)
    params = {'bn': batch_norm_init(c_in)}
    c_mid = c_in * (2 if negation else 1)
    if negation:
        params['scale'] = scale_init(c_mid)
    mid_shape = in_shape[:3] + (c_mid,)
    conv_p, out = conv_init(k_conv, mid_shape, k_h, k_w, c_o, s_h, s_w,
                            biased=biased, padding=padding)
    params['conv'] = conv_p
    return params, out


def pva_negation_block_v2_apply(params, x, ctx, k_h, k_w, c_o, s_h, s_w,
                                c_in, biased=True, padding='SAME',
                                negation=True):
    """BN -> [Neg -> Concat -> Scale] -> Relu -> Conv (network.py:519-539)."""
    y = batch_norm_apply(params['bn'], x, ctx, is_training=False)
    if negation:
        y = jnp.concatenate([y, -y], axis=-1)
        y = scale_apply(params['scale'], y, ctx)
    y = jnp.maximum(y, jnp.zeros((), y.dtype))
    return conv_apply(params['conv'], y, ctx, k_h, k_w, c_o, s_h, s_w,
                      biased, relu=False, padding=padding)


_INCEP_CHANNELS = {'a': (64, 64, 24, 128, 256), 'b': (64, 96, 32, 128, 384)}


def pva_inception_res_stack_init(rng, in_shape, c_in, block_start=False,
                                 type='a', name=''):
    """Three conv towers (1x1 / 3x3 / 5x5-as-two-3x3) + optional pool tower,
    concat, 1x1 out-projection, residual add (network.py:542-598)."""
    c_0, c_1, c_2, c_pool, c_out = _INCEP_CHANNELS[type]
    stride = 2 if block_start else 1
    keys = iter(jax.random.split(rng, 16))
    n, h, w, _ = in_shape
    sh, sw = _out_dim(h, 1, stride, 'SAME'), _out_dim(w, 1, stride, 'SAME')
    params: Dict[str, Any] = {'bn': batch_norm_init(c_in),
                              'bn_scale': scale_init(c_in)}

    def tower_conv(key_name, shape, k, c, s):
        p, out = conv_init(next(keys), shape, k, k, c, s, s, biased=False)
        params[key_name] = p
        params[key_name + '_bsc'] = {'bn': batch_norm_init(c)}
        return out

    # 1x1 tower
    tower_conv('t0_conv', in_shape, 1, c_0, stride)
    # 3x3 tower (conv4_1 quirk: reduce width 48, network.py:564-567)
    c1_red = 48 if name == 'conv4_1' else c_1
    s = tower_conv('t1_reduce', in_shape, 1, c1_red, stride)
    tower_conv('t1_conv', s, 3, c_1 * 2, 1)
    # 5x5 tower = two stacked 3x3
    s = tower_conv('t2_reduce', in_shape, 1, c_2, stride)
    s = tower_conv('t2_conv0', s, 3, c_2 * 2, 1)
    tower_conv('t2_conv1', s, 3, c_2 * 2, 1)

    concat_c = c_0 + c_1 * 2 + c_2 * 2
    if block_start:
        pool_shape = (n, sh, sw, c_in)
        tower_conv('pool_proj', pool_shape, 1, c_pool, 1)
        concat_c += c_pool
        proj_p, _ = conv_init(next(keys), in_shape, 1, 1, c_out, 2, 2,
                              biased=True)
        params['proj'] = proj_p
    out_p, _ = conv_init(next(keys), (n, sh, sw, concat_c), 1, 1, c_out, 1, 1,
                         biased=True)
    params['out_conv'] = out_p
    if name == 'conv5_4':
        params['out_bsc'] = {'bn': batch_norm_init(c_out)}
    return params, (n, sh, sw, c_out)


def pva_inception_res_stack_apply(params, x, ctx, c_in, block_start=False,
                                  type='a', name=''):
    c_0, c_1, c_2, c_pool, c_out = _INCEP_CHANNELS[type]
    stride = 2 if block_start else 1
    c1_red = 48 if name == 'conv4_1' else c_1

    bn = batch_norm_apply(params['bn'], x, ctx, is_training=False)
    bn_scale = scale_apply(params['bn_scale'], bn, ctx)

    def tower(key_name, inp, k, c, s):
        y = conv_apply(params[key_name], inp, ctx, k, k, c, s, s,
                       biased=False, relu=False)
        return bn_scale_combo_apply(params[key_name + '_bsc'], y, ctx, c,
                                    relu=True)

    conv_0 = tower('t0_conv', bn_scale, 1, c_0, stride)
    bn_relu = jnp.maximum(bn_scale, jnp.zeros((), bn_scale.dtype))
    y = tower('t1_reduce', bn_relu, 1, c1_red, stride)
    conv_1 = tower('t1_conv', y, 3, c_1 * 2, 1)
    y = tower('t2_reduce', bn_scale, 1, c_2, stride)
    y = tower('t2_conv0', y, 3, c_2 * 2, 1)
    conv_2 = tower('t2_conv1', y, 3, c_2 * 2, 1)

    branches = [conv_0, conv_1, conv_2]
    if block_start:
        pool = jax.lax.reduce_window(
            bn_scale, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
            (1, 2, 2, 1), 'SAME')
        branches.append(tower('pool_proj', pool, 1, c_pool, 1))
        proj = conv_apply(params['proj'], x, ctx, 1, 1, c_out, 2, 2,
                          biased=True, relu=False)
    else:
        proj = x
    concat = jnp.concatenate(branches, axis=-1)
    y = conv_apply(params['out_conv'], concat, ctx, 1, 1, c_out, 1, 1,
                   biased=True, relu=False)
    if name == 'conv5_4':
        y = bn_scale_combo_apply(params['out_bsc'], y, ctx, c_out, relu=False)
    return y + proj


def pva_inception_res_block_init(rng, in_shape, name_prefix='conv4_',
                                 type='a'):
    """Four chained res stacks, the first with block_start (network.py:601-611)."""
    c_ins = (128, 256, 256, 256, 256) if type == 'a' else \
        (256, 384, 384, 384, 384)
    params = {}
    shape = in_shape
    keys = jax.random.split(rng, 4)
    for i in range(1, 5):
        p, shape = pva_inception_res_stack_init(
            keys[i - 1], shape, c_in=c_ins[i - 1], block_start=(i == 1),
            type=type, name=name_prefix + str(i))
        params['stack{}'.format(i)] = p
    return params, shape


def pva_inception_res_block_apply(params, x, ctx, name_prefix='conv4_',
                                  type='a'):
    c_ins = (128, 256, 256, 256, 256) if type == 'a' else \
        (256, 384, 384, 384, 384)
    y = x
    for i in range(1, 5):
        y = pva_inception_res_stack_apply(
            params['stack{}'.format(i)], y, ctx, c_in=c_ins[i - 1],
            block_start=(i == 1), type=type, name=name_prefix + str(i))
    return y


# --- smooth L1 (network.py:639-644) ------------------------------------------

def smooth_l1_dist(deltas, sigma2=9.0):
    """0.5*sigma2*d^2 where |d| < 1/sigma2, else |d| - 0.5/sigma2."""
    d = jnp.asarray(deltas)
    absd = jnp.abs(d)
    quad = absd < (1.0 / sigma2)
    return jnp.where(quad, jnp.square(d) * 0.5 * sigma2,
                     absd - 0.5 / sigma2)
