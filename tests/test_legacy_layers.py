"""Legacy layer vocabulary (models/layers_legacy.py): the PVANet/FCN-heritage
layers of the reference DSL (/root/reference/lib/networks/network.py:194-337,
370-412, 454-623, 639-644). Shape inference, init semantics, and numerics
against independent formulas (and TF where it has the same op).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstm_ctc_ocr_tpu.models import layers_legacy as LL
from lstm_ctc_ocr_tpu.models.network import Network


class _Chain(Network):
    """Tiny configurable net: build from a list of (method, args, kwargs)."""

    def __init__(self, steps, input_names=('data',)):
        self._steps = steps
        self.input_names = input_names
        super().__init__()

    def setup(self):
        node = self.feed(*self.input_names)
        for method, args, kwargs in self._steps:
            node = getattr(node, method)(*args, **kwargs)


def _run(steps, in_shape=(2, 8, 8, 4), inputs=None, seed=0):
    net = _Chain(steps)
    rng = np.random.RandomState(seed)
    x = rng.rand(*in_shape).astype(np.float32)
    params = net.init_params(jax.random.PRNGKey(seed), {'data': in_shape})
    out = net.apply(params, {'data': jnp.asarray(x)})
    return net, params, x, out


def test_conv_general_multichannel():
    net, params, x, out = _run([('conv', (3, 3, 16, 1, 1), {'name': 'c'})])
    assert net.output_shape('c') == (2, 8, 8, 16)
    assert out['c'].shape == (2, 8, 8, 16)
    assert np.all(np.asarray(out['c']) >= 0)          # relu applied
    # xavier init, zero bias
    assert params['c']['biases'].shape == (16,)
    assert float(jnp.std(params['c']['kernel'])) > 0


def test_conv_zero_outputs_bias_only():
    net, params, x, out = _run(
        [('conv_zero', (3, 3, 5, 1, 1), {'name': 'cz', 'relu': False})])
    # zero kernel + zero bias -> identically zero output (network.py:226-227)
    np.testing.assert_array_equal(np.asarray(out['cz']), 0.0)


def test_conv_norm_bn_path_and_crelu_path():
    # biased+relu: conv -> bias -> batchnorm -> relu (network.py:259-263)
    net, params, x, out = _run(
        [('conv_norm', (3, 3, 6, 1, 1), {'name': 'cn'})])
    y = np.asarray(out['cn'], np.float64)
    assert y.shape == (2, 8, 8, 6)
    assert np.all(y >= 0)
    # batch-normalised pre-relu stats: nonneg mean after relu, unit-ish scale
    assert y.max() < 6.0
    # unbiased+relu: crelu doubles channels (network.py:268)
    net2, p2, x2, out2 = _run(
        [('conv_norm', (3, 3, 6, 1, 1), {'name': 'cc', 'biased': False})])
    assert net2.output_shape('cc') == (2, 8, 8, 12)
    z = np.asarray(out2['cc'])
    assert z.shape == (2, 8, 8, 12)
    assert np.all(z >= 0)
    # crelu identity: pos half - neg half reconstructs the raw conv, so the
    # two halves are never both positive at the same position
    assert np.all((z[..., :6] == 0) | (z[..., 6:] == 0))


def test_conv_final_validates_c_i_128():
    with pytest.raises(ValueError):
        _run([('conv_final', (3, 3, 8, 1, 1), {'name': 'cf'})],
             in_shape=(1, 4, 4, 3))
    net, params, x, out = _run(
        [('conv_final', (1, 1, 8, 1, 1), {'name': 'cf'})],
        in_shape=(1, 4, 4, 128))
    assert out['cf'].shape == (1, 4, 4, 8)


def test_upconv_doubles_spatial_dims():
    net, params, x, out = _run(
        [('upconv', (None, 7), {'name': 'up', 'ksize': 4, 'stride': 2})],
        in_shape=(2, 5, 6, 3))
    assert net.output_shape('up') == (2, 10, 12, 7)
    assert out['up'].shape == (2, 10, 12, 7)
    # explicit target shape crops (network.py:311-312)
    net2, p2, x2, out2 = _run(
        [('upconv', ([None, 9, 11, None], 7), {'name': 'up2'})],
        in_shape=(2, 5, 6, 3))
    assert out2['up2'].shape == (2, 9, 11, 7)


@pytest.mark.parametrize('ksize,stride,out_hw', [
    (4, 2, (10, 12)),    # default: out = in*stride, even k-s split
    (5, 2, (9, 11)),     # odd pad split derived from the requested output
    (4, 3, (13, 16)),    # k < s + explicit output_shape
    (3, 2, (9, 12)),
])
def test_upconv_matches_tf_conv2d_transpose(ksize, stride, out_hw):
    tf = pytest.importorskip('tensorflow')
    rng = np.random.RandomState(1)
    x = rng.rand(1, 5, 6, 3).astype(np.float32)
    k_tf = rng.rand(ksize, ksize, 7, 3).astype(np.float32)  # [k,k,c_out,c_in]
    ref = tf.nn.conv2d_transpose(
        x, k_tf, output_shape=[1, out_hw[0], out_hw[1], 7],
        strides=[1, stride, stride, 1], padding='SAME').numpy()
    shape = None if out_hw == (5 * stride, 6 * stride) \
        else [1, out_hw[0], out_hw[1], 7]
    got = LL.upconv_apply({'kernel': jnp.asarray(k_tf)}, jnp.asarray(x), {},
                          c_o=7, ksize=ksize, stride=stride, shape=shape,
                          relu=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_upconv_rejects_unreachable_output_shape():
    # ceil(11/2) != 5 -> TF rejects this output_shape; so do we, at init
    with pytest.raises(ValueError):
        LL.upconv_init(jax.random.PRNGKey(0), (1, 5, 6, 3), c_o=7,
                       ksize=4, stride=2, shape=[1, 11, 12, 7])


def test_lrn_matches_tf():
    tf = pytest.importorskip('tensorflow')
    rng = np.random.RandomState(2)
    x = rng.rand(2, 4, 4, 12).astype(np.float32)
    ref = tf.nn.local_response_normalization(
        x, depth_radius=2, alpha=1e-4, beta=0.75, bias=1.0).numpy()
    got = LL.lrn_apply(jnp.asarray(x), {}, radius=2, alpha=1e-4, beta=0.75,
                       bias=1.0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_reshape_layer_regroups_channels():
    # generic branch: [N,H,W,C] with d=2 -> [N, H*C/d, W, d]
    net, params, x, out = _run([('reshape_layer', (2,), {'name': 'rs'})],
                               in_shape=(1, 4, 5, 6))
    assert net.output_shape('rs') == (1, 12, 5, 2)
    assert out['rs'].shape == (1, 12, 5, 2)
    # round-trip: values preserved
    assert np.asarray(out['rs']).size == x.size
    np.testing.assert_allclose(np.sort(np.asarray(out['rs']).ravel()),
                               np.sort(x.ravel()))


def test_spatial_reshape_and_softmax():
    net, params, x, out = _run(
        [('spatial_reshape_layer', (3,), {'name': 'sr'}),
         ('spatial_softmax', (), {'name': 'sm'})],
        in_shape=(2, 4, 5, 6))
    assert out['sr'].shape == (2, 4, 10, 3)
    sm = np.asarray(out['sm'])
    np.testing.assert_allclose(sm.sum(-1), np.ones((2, 4, 10)), rtol=1e-5)


def test_add_negation_scale_relu():
    class Net(Network):
        input_names = ('data',)

        def setup(self):
            (self.feed('data')
             .negation(name='neg')
             .scale(4, name='sc'))
            (self.feed('data', 'neg')
             .add(name='sum')
             .relu(name='r'))

    net = Net()
    x = np.random.RandomState(3).randn(2, 3, 3, 4).astype(np.float32)
    params = net.init_params(jax.random.PRNGKey(0), {'data': (2, 3, 3, 4)})
    out = net.apply(params, {'data': jnp.asarray(x)})
    np.testing.assert_allclose(np.asarray(out['neg']), -x)
    # scale is identity at init (alpha=1, beta=0, network.py:617-622)
    np.testing.assert_allclose(np.asarray(out['sc']), -x)
    # x + (-x) = 0, relu(0) = 0
    np.testing.assert_array_equal(np.asarray(out['sum']), 0.0)
    np.testing.assert_array_equal(np.asarray(out['r']), 0.0)
    # alpha AND beta decay at the reference's fixed 1e-5 (network.py:617-622)
    assert ('sc', ('alpha',), 1e-5) in net.reg_paths
    assert ('sc', ('beta',), 1e-5) in net.reg_paths


def test_batch_normalization_frozen_vs_training():
    x = np.random.RandomState(4).randn(8, 4, 4, 3).astype(np.float32) * 3 + 1
    p = LL.batch_norm_init(3)
    # is_training=False: frozen (0,1) moving stats -> identity modulo eps
    y = np.asarray(LL.batch_normalization_apply(p, jnp.asarray(x), {},
                                                relu=False,
                                                is_training=False))
    np.testing.assert_allclose(y, x / np.sqrt(1 + 1e-3), rtol=1e-5)
    # is_training=True: batch stats -> standardized
    z = np.asarray(LL.batch_normalization_apply(p, jnp.asarray(x), {},
                                                relu=False,
                                                is_training=True))
    np.testing.assert_allclose(z.reshape(-1, 3).mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(z.reshape(-1, 3).std(0), 1.0, atol=1e-2)


def test_pva_negation_block_shapes_and_concat():
    net, params, x, out = _run(
        [('pva_negation_block', (3, 3, 8, 1, 1), {'name': 'pnb'})],
        in_shape=(2, 6, 6, 4))
    # negation doubles channels before scale/relu (network.py:504-507)
    assert net.output_shape('pnb') == (2, 6, 6, 16)
    y = np.asarray(out['pnb'])
    assert y.shape == (2, 6, 6, 16)
    assert np.all(y >= 0)
    assert np.all((y[..., :8] == 0) | (y[..., 8:] == 0))


def test_pva_negation_block_v2_shapes():
    net, params, x, out = _run(
        [('pva_negation_block_v2', (3, 3, 10, 1, 1, 4), {'name': 'pnb2'})],
        in_shape=(2, 6, 6, 4))
    assert net.output_shape('pnb2') == (2, 6, 6, 10)
    assert out['pnb2'].shape == (2, 6, 6, 10)


@pytest.mark.parametrize('block_start,stride', [(True, 2), (False, 1)])
def test_pva_inception_res_stack(block_start, stride):
    c_in = 128 if block_start else 256
    net, params, x, out = _run(
        [('pva_inception_res_stack', (c_in,),
          {'name': 's1', 'block_start': block_start, 'type': 'a'})],
        in_shape=(1, 8, 8, c_in))
    hw = 8 // stride
    assert net.output_shape('s1') == (1, hw, hw, 256)
    assert out['s1'].shape == (1, hw, hw, 256)
    assert np.isfinite(np.asarray(out['s1'])).all()


def test_pva_inception_res_block_chains_four_stacks():
    net, params, x, out = _run(
        [('pva_inception_res_block', (),
          {'name': 'blk', 'name_prefix': 'conv4_', 'type': 'a'})],
        in_shape=(1, 8, 8, 128))
    assert net.output_shape('blk') == (1, 4, 4, 256)
    assert out['blk'].shape == (1, 4, 4, 256)
    assert np.isfinite(np.asarray(out['blk'])).all()


def test_composite_reg_parity():
    """Inner conv kernels of the composite PVA blocks carry weight decay,
    scale alpha/beta carry the reference's fixed rates (network.py:503,
    510-513, 529-532, 556-594)."""
    net, params, x, out = _run(
        [('pva_negation_block', (3, 3, 8, 1, 1), {'name': 'pnb'}),
         ('pva_negation_block_v2', (3, 3, 10, 1, 1, 16), {'name': 'pnb2'}),
         ('pva_inception_res_stack', (10,),
          {'name': 's1', 'block_start': True, 'type': 'a'})],
        in_shape=(1, 8, 8, 4))
    entries = {(n, p): c for n, p, c in net.reg_paths}
    assert entries[('pnb', ('conv', 'kernel'))] is None        # cfg wd
    assert entries[('pnb', ('scale', 'alpha'))] == 1e-5
    assert entries[('pnb', ('scale', 'beta'))] == 1e-5
    assert entries[('pnb2', ('conv', 'kernel'))] is None
    assert entries[('pnb2', ('scale', 'alpha'))] == 4e-5       # network.py:530
    assert entries[('s1', ('bn_scale', 'alpha'))] == 1e-5
    # every inner conv tower of the inception stack is registered
    inner = {p[0] for (n, p) in entries if n == 's1' and p[-1] == 'kernel'}
    assert {'t0_conv', 't1_reduce', 't1_conv', 't2_reduce', 't2_conv0',
            't2_conv1', 'pool_proj', 'proj', 'out_conv'} <= inner
    # and the total evaluates finitely with mixed coefficients
    assert np.isfinite(float(net.regularization_loss(params)))


def test_pva_negation_block_v2_accepts_ignored_scale_kwarg():
    # the reference takes scale= and never reads it (network.py:519-520)
    net, params, x, out = _run(
        [('pva_negation_block_v2', (3, 3, 6, 1, 1, 4),
          {'name': 'p', 'scale': False})],
        in_shape=(1, 6, 6, 4))
    assert out['p'].shape == (1, 6, 6, 6)


def test_smooth_l1_dist_formula():
    d = np.linspace(-2, 2, 101).astype(np.float32)
    got = np.asarray(LL.smooth_l1_dist(d, sigma2=9.0))
    want = np.where(np.abs(d) < 1 / 9.0, 0.5 * 9.0 * d ** 2,
                    np.abs(d) - 0.5 / 9.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # differentiable everywhere (incl. through jax.grad)
    g = jax.grad(lambda t: jnp.sum(LL.smooth_l1_dist(t)))(jnp.asarray(d))
    assert np.isfinite(np.asarray(g)).all()


def test_legacy_layers_trainable_end_to_end():
    """Gradients flow through a composite legacy graph."""
    net = _Chain([('conv_norm', (3, 3, 6, 1, 1), {'name': 'c1'}),
                  ('pva_negation_block', (3, 3, 4, 1, 1), {'name': 'p1'}),
                  ('conv', (1, 1, 2, 1, 1), {'name': 'head', 'relu': False})])
    x = jnp.asarray(np.random.RandomState(5).rand(2, 6, 6, 3)
                    .astype(np.float32))
    params = net.init_params(jax.random.PRNGKey(1), {'data': (2, 6, 6, 3)})

    def loss_fn(p):
        out = net.apply(p, {'data': x})
        return jnp.mean(jnp.square(out['head']))

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads))
    assert all(np.isfinite(float(v)) for v in flat)
    # conv kernels receive nonzero gradient
    assert float(jnp.sum(jnp.abs(grads['c1']['kernel']))) > 0
