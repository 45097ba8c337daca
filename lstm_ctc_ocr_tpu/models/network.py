"""Chained layer DSL building functional (init, apply) models.

Mirrors the reference's Network DSL surface
(/root/reference/lib/networks/network.py:19-95): subclasses define
``setup()`` with a ``self.feed('data').conv_single(...).max_pool(...)``
chain, layer outputs are recorded by name, and ``feed`` re-roots the chain
(accepting multiple names for multi-input layers like ``bi_lstm``).

Underneath it is nothing like TF1 graph mode: each chained call records a
spec; ``init_params(rng, input_shapes)`` walks the specs with analytic
shape inference and returns a parameter *pytree*; ``apply(params, inputs)``
is a pure function suitable for ``jax.jit`` / ``jax.grad`` / ``pjit``.

Reference quirks preserved: duplicate layer names overwrite in the output
dict but not in the chain (the reference's double 'pool2',
LSTM_train.py:27,30), and auto-naming via ``get_unique_name``
(network.py:87-89).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import cfg
from . import layers as L
from . import layers_legacy as LL


@dataclass
class LayerSpec:
    name: str
    kind: str
    inputs: List[str]
    kwargs: Dict[str, Any]
    has_params: bool
    reg_keys: Tuple[str, ...] = ()   # param keys that carry L2 weight decay


def layer(op):
    """DSL method decorator: consume ``self.inputs``, record a spec, re-feed
    the layer's name for chaining (the reference's @layer, network.py:19-38)."""
    def wrapped(self, *args, **kwargs):
        name = kwargs.pop('name', None) or self.get_unique_name(op.__name__)
        spec = op(self, list(self.inputs), name, *args, **kwargs)
        self.specs.append(spec)
        self.layer_order.append(name)
        self.inputs = [name]
        return self
    return wrapped


class Network:
    """Base class; subclasses define the graph in ``setup()``."""

    input_names: Sequence[str] = ('data', 'time_step_len')

    def __init__(self, trainable: bool = True):
        self.trainable = trainable
        self.specs: List[LayerSpec] = []
        self.layer_order: List[str] = []
        self.inputs: List[str] = []
        self._name_counts: Dict[str, int] = {}
        self._shapes: Dict[str, Tuple[int, ...]] = {}
        self.reg_paths: List[Tuple[str, str]] = []
        self.setup()

    def setup(self):
        raise NotImplementedError('Must be subclassed (network.py:16-17)')

    # -- chaining ------------------------------------------------------------

    def feed(self, *names: str) -> 'Network':
        for n in names:
            assert isinstance(n, str), 'feed() takes layer/input names'
        self.inputs = list(names)
        return self

    def get_unique_name(self, prefix: str) -> str:
        self._name_counts[prefix] = self._name_counts.get(prefix, 0) + 1
        return '{}_{}'.format(prefix, self._name_counts[prefix])

    # -- layer vocabulary ------------------------------------------------------

    @layer
    def conv_single(self, inputs, name, k_h, k_w, c_o, s_h, s_w, c_i=None,
                    bn=False, biased=True, relu=True, padding='SAME',
                    trainable=True):
        return LayerSpec(name, 'conv_single', inputs,
                         dict(k_h=k_h, k_w=k_w, c_o=c_o, s_h=s_h, s_w=s_w,
                              c_i=c_i, bn=bn, biased=biased, relu=relu,
                              padding=padding),
                         has_params=True, reg_keys=('kernel',))

    @layer
    def max_pool(self, inputs, name, k_h, k_w, s_h, s_w, padding='SAME'):
        return LayerSpec(name, 'max_pool', inputs,
                         dict(k_h=k_h, k_w=k_w, s_h=s_h, s_w=s_w,
                              padding=padding), has_params=False)

    @layer
    def avg_pool(self, inputs, name, k_h, k_w, s_h, s_w, padding='SAME'):
        return LayerSpec(name, 'avg_pool', inputs,
                         dict(k_h=k_h, k_w=k_w, s_h=s_h, s_w=s_w,
                              padding=padding), has_params=False)

    @layer
    def reshape_squeeze_layer(self, inputs, name, d):
        return LayerSpec(name, 'reshape_squeeze', inputs, dict(d=d),
                         has_params=False)

    @layer
    def bi_lstm(self, inputs, name, num_hids, num_layers, trainable=True):
        return LayerSpec(name, 'bi_lstm', inputs,
                         dict(num_hids=num_hids, num_layers=num_layers,
                              nclasses=cfg.NCLASSES),
                         has_params=True, reg_keys=('weights',))

    @layer
    def lstm(self, inputs, name, num_hids, num_layers, trainable=True):
        return LayerSpec(name, 'lstm', inputs,
                         dict(num_hids=num_hids, num_layers=num_layers,
                              nclasses=cfg.NCLASSES),
                         has_params=True, reg_keys=('weights',))

    @layer
    def fc(self, inputs, name, num_out, relu=True, trainable=True):
        return LayerSpec(name, 'fc', inputs, dict(num_out=num_out, relu=relu),
                         has_params=True, reg_keys=('weights',))

    @layer
    def softmax(self, inputs, name):
        return LayerSpec(name, 'softmax', inputs, {}, has_params=False)

    @layer
    def dropout(self, inputs, name, keep_prob):
        return LayerSpec(name, 'dropout', inputs, dict(keep_prob=keep_prob),
                         has_params=False)

    # -- legacy vocabulary (PVANet/FCN heritage; models/layers_legacy.py) -----

    @layer
    def relu(self, inputs, name):
        return LayerSpec(name, 'relu', inputs, {}, has_params=False)

    @layer
    def conv(self, inputs, name, k_h, k_w, c_o, s_h, s_w, c_i=None,
             biased=True, relu=True, padding='SAME', trainable=True):
        return LayerSpec(name, 'conv', inputs,
                         dict(k_h=k_h, k_w=k_w, c_o=c_o, s_h=s_h, s_w=s_w,
                              c_i=c_i, biased=biased, relu=relu,
                              padding=padding),
                         has_params=True, reg_keys=('kernel',))

    @layer
    def conv_zero(self, inputs, name, k_h, k_w, c_o, s_h, s_w, biased=True,
                  relu=True, padding='SAME', trainable=True):
        return LayerSpec(name, 'conv_zero', inputs,
                         dict(k_h=k_h, k_w=k_w, c_o=c_o, s_h=s_h, s_w=s_w,
                              biased=biased, relu=relu, padding=padding),
                         has_params=True, reg_keys=('kernel',))

    @layer
    def conv_norm(self, inputs, name, k_h, k_w, c_o, s_h, s_w, biased=True,
                  relu=True, padding='SAME', trainable=True):
        return LayerSpec(name, 'conv_norm', inputs,
                         dict(k_h=k_h, k_w=k_w, c_o=c_o, s_h=s_h, s_w=s_w,
                              biased=biased, relu=relu, padding=padding),
                         has_params=True, reg_keys=('kernel',))

    @layer
    def conv_final(self, inputs, name, k_h, k_w, c_o, s_h, s_w, biased=True,
                   relu=True, padding='SAME', trainable=True):
        # the reference hard-codes c_i=128 (network.py:276); we validate it
        return LayerSpec(name, 'conv_final', inputs,
                         dict(k_h=k_h, k_w=k_w, c_o=c_o, s_h=s_h, s_w=s_w,
                              biased=biased, relu=relu, padding=padding),
                         has_params=True, reg_keys=('kernel',))

    @layer
    def upconv(self, inputs, name, shape, c_o, ksize=4, stride=2,
               biased=False, relu=True, padding='SAME', trainable=True):
        return LayerSpec(name, 'upconv', inputs,
                         dict(shape=shape, c_o=c_o, ksize=ksize,
                              stride=stride, biased=biased, relu=relu),
                         has_params=True, reg_keys=('kernel',))

    @layer
    def lrn(self, inputs, name, radius, alpha, beta, bias=1.0):
        return LayerSpec(name, 'lrn', inputs,
                         dict(radius=radius, alpha=alpha, beta=beta,
                              bias=bias), has_params=False)

    @layer
    def reshape_layer(self, inputs, name, d):
        return LayerSpec(name, 'reshape_layer', inputs,
                         dict(d=d, name=name), has_params=False)

    @layer
    def spatial_reshape_layer(self, inputs, name, d):
        return LayerSpec(name, 'spatial_reshape_layer', inputs, dict(d=d),
                         has_params=False)

    @layer
    def spatial_softmax(self, inputs, name):
        return LayerSpec(name, 'spatial_softmax', inputs, {},
                         has_params=False)

    @layer
    def add(self, inputs, name):
        return LayerSpec(name, 'add', inputs, {}, has_params=False)

    @layer
    def negation(self, inputs, name):
        return LayerSpec(name, 'negation', inputs, {}, has_params=False)

    @layer
    def scale(self, inputs, name, c_in):
        # alpha/beta decay at the reference's fixed 1e-5 rate, registered
        # via _composite_reg_entries (network.py:617-622)
        return LayerSpec(name, 'scale', inputs, dict(c_in=c_in),
                         has_params=True)

    @layer
    def batch_normalization(self, inputs, name, relu=True, is_training=False):
        return LayerSpec(name, 'batch_normalization', inputs,
                         dict(relu=relu, is_training=is_training),
                         has_params=True)

    @layer
    def bn_scale_combo(self, inputs, name, c_in, relu=True):
        return LayerSpec(name, 'bn_scale_combo', inputs,
                         dict(c_in=c_in, relu=relu), has_params=True)

    @layer
    def pva_negation_block(self, inputs, name, k_h, k_w, c_o, s_h, s_w,
                           biased=True, padding='SAME', trainable=True,
                           scale=True, negation=True):
        return LayerSpec(name, 'pva_negation_block', inputs,
                         dict(k_h=k_h, k_w=k_w, c_o=c_o, s_h=s_h, s_w=s_w,
                              biased=biased, padding=padding, scale=scale,
                              negation=negation), has_params=True)

    @layer
    def pva_negation_block_v2(self, inputs, name, k_h, k_w, c_o, s_h, s_w,
                              c_in, biased=True, padding='SAME',
                              trainable=True, scale=True, negation=True):
        # `scale` is accepted-and-ignored exactly like the reference
        # (network.py:519-520 takes it but never reads it)
        return LayerSpec(name, 'pva_negation_block_v2', inputs,
                         dict(k_h=k_h, k_w=k_w, c_o=c_o, s_h=s_h, s_w=s_w,
                              c_in=c_in, biased=biased, padding=padding,
                              negation=negation), has_params=True)

    @layer
    def pva_inception_res_stack(self, inputs, name, c_in, block_start=False,
                                type='a'):
        return LayerSpec(name, 'pva_inception_res_stack', inputs,
                         dict(c_in=c_in, block_start=block_start, type=type,
                              name=name), has_params=True)

    @layer
    def pva_inception_res_block(self, inputs, name, name_prefix='conv4_',
                                type='a'):
        return LayerSpec(name, 'pva_inception_res_block', inputs,
                         dict(name_prefix=name_prefix, type=type),
                         has_params=True)

    # -- build ----------------------------------------------------------------

    def init_params(self, rng: jax.Array,
                    input_shapes: Dict[str, Tuple[int, ...]]):
        """Walk the specs with shape inference; return the parameter pytree."""
        shapes = dict(input_shapes)
        params: Dict[str, Any] = {}
        self.reg_paths = []
        for spec in self.specs:
            in_shapes = [shapes[n] for n in spec.inputs]
            rng, sub = jax.random.split(rng)
            p, out_shape = self._init_layer(spec, sub, in_shapes)
            if p is not None:
                params[spec.name] = p
                for k in spec.reg_keys:
                    # (layer, key path, coefficient); None = cfg WEIGHT_DECAY
                    self.reg_paths.append((spec.name, (k,), None))
                for path, coeff in self._composite_reg_entries(spec, p):
                    self.reg_paths.append((spec.name, path, coeff))
            shapes[spec.name] = out_shape
        self._shapes = shapes
        return params

    # reference scale-layer decay rates: network.py:510-513 (1e-5),
    # :529-532 (4e-5), :617-622 (1e-5)
    _SCALE_WD = 1e-5
    _SCALE_WD_V2 = 4e-5

    def _composite_reg_entries(self, spec, params):
        """Reference L2 parity inside composite legacy blocks: every inner
        conv kernel carries cfg.TRAIN.WEIGHT_DECAY (network.py:503,537,
        559-594), scale alpha/beta carry their own fixed rates."""
        kind = spec.kind
        if kind == 'scale':
            return [(('alpha',), self._SCALE_WD), (('beta',), self._SCALE_WD)]
        if kind == 'pva_negation_block':
            out = [(('conv', 'kernel'), None)]
            if spec.kwargs['scale']:
                out += [(('scale', 'alpha'), self._SCALE_WD),
                        (('scale', 'beta'), self._SCALE_WD)]
            return out
        if kind == 'pva_negation_block_v2':
            out = [(('conv', 'kernel'), None)]
            if spec.kwargs['negation']:
                out += [(('scale', 'alpha'), self._SCALE_WD_V2),
                        (('scale', 'beta'), self._SCALE_WD_V2)]
            return out
        if kind == 'pva_inception_res_stack':
            return self._incep_stack_reg_entries(params)
        if kind == 'pva_inception_res_block':
            out = []
            for i in range(1, 5):
                key = 'stack{}'.format(i)
                out += [((key,) + path, coeff) for path, coeff in
                        self._incep_stack_reg_entries(params[key])]
            return out
        return []

    def _incep_stack_reg_entries(self, params):
        out = [((k, 'kernel'), None) for k, v in sorted(params.items())
               if isinstance(v, dict) and 'kernel' in v]
        out += [(('bn_scale', 'alpha'), self._SCALE_WD),
                (('bn_scale', 'beta'), self._SCALE_WD)]
        return out

    def _init_layer(self, spec, rng, in_shapes):
        kw = spec.kwargs
        if spec.kind == 'conv_single':
            s = in_shapes[0]
            if len(s) == 3:
                # 3D inputs always expand to ONE channel at apply time
                # (layers.py:64, reference network.py:165) — an explicit
                # c_i != 1 here would build a kernel apply can't use
                assert kw['c_i'] in (None, 1), \
                    'conv_single on 3D input implies c_i=1, got {}'.format(
                        kw['c_i'])
                s = s + (1,)
            return L.conv_single_init(rng, s, kw['k_h'], kw['k_w'], kw['c_o'],
                                      kw['s_h'], kw['s_w'], kw['c_i'],
                                      kw['bn'], kw['biased'], kw['padding'])
        if spec.kind in ('max_pool', 'avg_pool'):
            return None, L.pool_out_shape(in_shapes[0], kw['k_h'], kw['k_w'],
                                          kw['s_h'], kw['s_w'], kw['padding'])
        if spec.kind == 'reshape_squeeze':
            n, w, h, c = in_shapes[0]
            # strict: each time step must be exactly one (h, c) slice —
            # a merely divisible product would interleave height slices
            # into the time axis while time_step_len still counts w frames
            assert h * c == kw['d'], \
                'reshape_squeeze: h*c = {}*{} != d={} (time axis would ' \
                'not align with time_step_len)'.format(h, c, kw['d'])
            return None, (n, w * h * c // kw['d'], kw['d'])
        if spec.kind == 'bi_lstm':
            return L.bi_lstm_init(rng, in_shapes[0], kw['num_hids'],
                                  kw['num_layers'], kw['nclasses'],
                                  cfg.TRAIN.WEIGHT_DECAY)
        if spec.kind == 'lstm':
            return L.lstm_init(rng, in_shapes[0], kw['num_hids'],
                               kw['num_layers'], kw['nclasses'],
                               cfg.TRAIN.WEIGHT_DECAY)
        if spec.kind == 'fc':
            return L.fc_init(rng, in_shapes[0], kw['num_out'])
        if spec.kind in ('softmax', 'dropout'):
            return None, in_shapes[0]
        return self._init_legacy_layer(spec, rng, in_shapes)

    def _init_legacy_layer(self, spec, rng, in_shapes):
        kw = spec.kwargs
        s = in_shapes[0]
        if spec.kind == 'conv':
            return LL.conv_init(rng, s, kw['k_h'], kw['k_w'], kw['c_o'],
                                kw['s_h'], kw['s_w'], kw['c_i'],
                                kw['biased'], kw['padding'])
        if spec.kind == 'conv_zero':
            return LL.conv_init(rng, s, kw['k_h'], kw['k_w'], kw['c_o'],
                                kw['s_h'], kw['s_w'], None, kw['biased'],
                                kw['padding'], kernel_init='zero')
        if spec.kind == 'conv_norm':
            return LL.conv_norm_init(rng, s, kw['k_h'], kw['k_w'], kw['c_o'],
                                     kw['s_h'], kw['s_w'], None,
                                     kw['biased'], kw['relu'], kw['padding'])
        if spec.kind == 'conv_final':
            return LL.conv_norm_init(rng, s, kw['k_h'], kw['k_w'], kw['c_o'],
                                     kw['s_h'], kw['s_w'], 128,
                                     kw['biased'], kw['relu'], kw['padding'])
        if spec.kind == 'upconv':
            return LL.upconv_init(rng, s, kw['c_o'], kw['ksize'],
                                  kw['stride'], kw['shape'], kw['biased'])
        if spec.kind in ('relu', 'lrn', 'spatial_softmax', 'negation'):
            return None, s
        if spec.kind == 'reshape_layer':
            n, h, w, c = s
            d = kw['d']
            new_h = int(h / d * c) if kw['name'] == 'rpn_cls_prob_reshape' \
                else int(h * (c / d))
            return None, (n, new_h, w, int(d))
        if spec.kind == 'spatial_reshape_layer':
            n, h, w, c = s
            return None, (n, h, w * c // int(kw['d']), int(kw['d']))
        if spec.kind == 'add':
            return None, s
        if spec.kind == 'scale':
            return LL.scale_init(kw['c_in']), s
        if spec.kind == 'batch_normalization':
            return LL.batch_norm_init(s[-1]), s
        if spec.kind == 'bn_scale_combo':
            return LL.bn_scale_combo_init(rng, s, kw['c_in'])
        if spec.kind == 'pva_negation_block':
            return LL.pva_negation_block_init(
                rng, s, kw['k_h'], kw['k_w'], kw['c_o'], kw['s_h'],
                kw['s_w'], kw['biased'], kw['padding'], kw['scale'],
                kw['negation'])
        if spec.kind == 'pva_negation_block_v2':
            return LL.pva_negation_block_v2_init(
                rng, s, kw['k_h'], kw['k_w'], kw['c_o'], kw['s_h'],
                kw['s_w'], kw['c_in'], kw['biased'], kw['padding'],
                kw['negation'])
        if spec.kind == 'pva_inception_res_stack':
            return LL.pva_inception_res_stack_init(
                rng, s, kw['c_in'], kw['block_start'], kw['type'], kw['name'])
        if spec.kind == 'pva_inception_res_block':
            return LL.pva_inception_res_block_init(
                rng, s, kw['name_prefix'], kw['type'])
        raise ValueError('unknown layer kind: ' + spec.kind)

    # -- forward ----------------------------------------------------------------

    def apply(self, params, inputs: Dict[str, jnp.ndarray], train: bool = False,
              rng: Optional[jax.Array] = None, dtype=None,
              bn_stats=None, bn_collect=None) -> Dict[str, jnp.ndarray]:
        """Pure forward pass. Returns every named layer output
        (``get_output`` parity, network.py:79-85).

        ``bn_stats``: frozen per-layer {'mean','var'} used by bn=True convs
        instead of batch statistics (cfg.BN_EVAL='moving' eval path).
        ``bn_collect``: a dict the caller owns; bn=True convs write their
        batch statistics into it during tracing (the train step's EMA feed).
        """
        ctx = {'train': train, 'dtype': dtype,
               'bn_stats': bn_stats, 'bn_collect': bn_collect}
        # uint8 feeds are raw pixels (the cfg.TRANSFER_DTYPE='uint8'
        # host->device contract, data/gen.py:bucket_batch): normalize on
        # device with the exact f32 division the f32 wire format runs on
        # the host — bit-identical values, 4x less transfer. XLA fuses the
        # cast+scale into the first conv's input handling.
        outputs: Dict[str, jnp.ndarray] = {
            k: (v.astype(jnp.float32) / 255.0
                if getattr(v, 'dtype', None) == jnp.uint8 else v)
            for k, v in inputs.items()}
        for spec in self.specs:
            xs = [outputs[n] for n in spec.inputs]
            if spec.kind == 'dropout' and train:
                if rng is None:
                    raise ValueError(
                        'apply(train=True) on a graph with dropout '
                        'requires an rng key')
                rng, sub = jax.random.split(rng)
                ctx = dict(ctx, rng=sub)
            outputs[spec.name] = self._apply_layer(spec, params.get(spec.name),
                                                   xs, ctx)
        return outputs

    def init_bn_state(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Fresh moving-statistics state for every bn=True conv layer:
        {layer: {'mean': zeros[C], 'var': ones[C]}}. Non-optimized train-step
        state (cfg.BN_EVAL); {} when the graph has no batch norm."""
        state: Dict[str, Dict[str, jnp.ndarray]] = {}
        for spec in self.specs:
            if spec.kind == 'conv_single' and spec.kwargs.get('bn'):
                c = spec.kwargs['c_o']
                state[spec.name] = {'mean': jnp.zeros((c,), jnp.float32),
                                    'var': jnp.ones((c,), jnp.float32)}
        return state

    def _apply_layer(self, spec, p, xs, ctx):
        kw = spec.kwargs
        if spec.kind == 'conv_single':
            return L.conv_single_apply(p, xs[0], dict(ctx, layer=spec.name),
                                       **kw)
        if spec.kind == 'max_pool':
            return L.max_pool_apply(xs[0], ctx, **kw)
        if spec.kind == 'avg_pool':
            return L.avg_pool_apply(xs[0], ctx, **kw)
        if spec.kind == 'reshape_squeeze':
            return L.reshape_squeeze_apply(xs[0], ctx, **kw)
        if spec.kind == 'bi_lstm':
            return L.bi_lstm_apply(p, xs[0], xs[1], ctx, **kw)
        if spec.kind == 'lstm':
            return L.lstm_apply(p, xs[0], xs[1], ctx, **kw)
        if spec.kind == 'fc':
            return L.fc_apply(p, xs[0], ctx, **kw)
        if spec.kind == 'softmax':
            return L.softmax_apply(xs[0], ctx)
        if spec.kind == 'dropout':
            return L.dropout_apply(xs[0], ctx, **kw)
        return self._apply_legacy_layer(spec, p, xs, ctx)

    def _apply_legacy_layer(self, spec, p, xs, ctx):
        kw = spec.kwargs
        x = xs[0]
        if spec.kind == 'relu':
            return jnp.maximum(x, jnp.zeros((), x.dtype))
        if spec.kind == 'conv':
            return LL.conv_apply(p, x, ctx, kw['k_h'], kw['k_w'], kw['c_o'],
                                 kw['s_h'], kw['s_w'], kw['biased'],
                                 kw['relu'], kw['padding'])
        if spec.kind == 'conv_zero':
            return LL.conv_apply(p, x, ctx, kw['k_h'], kw['k_w'], kw['c_o'],
                                 kw['s_h'], kw['s_w'], kw['biased'],
                                 kw['relu'], kw['padding'])
        if spec.kind in ('conv_norm', 'conv_final'):
            return LL.conv_norm_apply(p, x, ctx, kw['k_h'], kw['k_w'],
                                      kw['c_o'], kw['s_h'], kw['s_w'],
                                      kw['biased'], kw['relu'], kw['padding'])
        if spec.kind == 'upconv':
            return LL.upconv_apply(p, x, ctx, kw['c_o'], kw['ksize'],
                                   kw['stride'], kw['shape'], kw['biased'],
                                   kw['relu'])
        if spec.kind == 'lrn':
            return LL.lrn_apply(x, ctx, **kw)
        if spec.kind == 'reshape_layer':
            return LL.reshape_layer_apply(x, ctx, **kw)
        if spec.kind == 'spatial_reshape_layer':
            return LL.spatial_reshape_layer_apply(x, ctx, **kw)
        if spec.kind == 'spatial_softmax':
            return LL.spatial_softmax_apply(x, ctx)
        if spec.kind == 'add':
            return LL.add_apply(xs, ctx)
        if spec.kind == 'negation':
            return LL.negation_apply(x, ctx)
        if spec.kind == 'scale':
            return LL.scale_apply(p, x, ctx)
        if spec.kind == 'batch_normalization':
            return LL.batch_normalization_apply(p, x, ctx, **kw)
        if spec.kind == 'bn_scale_combo':
            return LL.bn_scale_combo_apply(p, x, ctx, **kw)
        if spec.kind == 'pva_negation_block':
            return LL.pva_negation_block_apply(
                p, x, ctx, kw['k_h'], kw['k_w'], kw['c_o'], kw['s_h'],
                kw['s_w'], kw['biased'], kw['padding'], kw['scale'],
                kw['negation'])
        if spec.kind == 'pva_negation_block_v2':
            return LL.pva_negation_block_v2_apply(
                p, x, ctx, kw['k_h'], kw['k_w'], kw['c_o'], kw['s_h'],
                kw['s_w'], kw['c_in'], kw['biased'], kw['padding'],
                kw['negation'])
        if spec.kind == 'pva_inception_res_stack':
            return LL.pva_inception_res_stack_apply(
                p, x, ctx, kw['c_in'], kw['block_start'], kw['type'],
                kw['name'])
        if spec.kind == 'pva_inception_res_block':
            return LL.pva_inception_res_block_apply(
                p, x, ctx, kw['name_prefix'], kw['type'])
        raise ValueError('unknown layer kind: ' + spec.kind)

    # -- losses ------------------------------------------------------------------

    def regularization_loss(self, params) -> jnp.ndarray:
        """Sum of L2 penalties on conv kernels and projection weights —
        the reference's REGULARIZATION_LOSSES collection (network.py:630-637,
        660-662): wd * sum(w^2) / 2 per regularized tensor. Entries carry a
        per-tensor coefficient (None = cfg.TRAIN.WEIGHT_DECAY) because the
        legacy scale layers use their own fixed rates.

        WEIGHT_DECAY <= 0 disables the WHOLE collection — the reference
        gates adding REGULARIZATION_LOSSES on it (network.py:658-662),
        including the fixed-rate scale penalties."""
        wd = cfg.TRAIN.WEIGHT_DECAY
        if wd <= 0:
            return jnp.float32(0.0)
        total = jnp.float32(0.0)
        for layer_name, path, coeff in self.reg_paths:
            w = params[layer_name]
            for key in path:
                w = w[key]
            c = wd if coeff is None else coeff
            total = total + c * 0.5 * jnp.sum(jnp.square(w.astype(jnp.float32)))
        return total

    def output_shape(self, name: str):
        return self._shapes.get(name)
