"""Length-masked (bi)directional LSTM as a JAX time scan.

TPU-native replacement for ``tf.contrib.rnn.LSTMCell`` +
``tf.nn.bidirectional_dynamic_rnn(..., sequence_length=img_len)``
(/root/reference/lib/networks/network.py:104-109):

* cell math follows the TF1 LSTMCell contract — gate order (i, j, f, o),
  ``forget_bias=1.0`` added at compute time, zero bias init, tanh
  activations, no peepholes;
* ``sequence_length`` semantics match ``bidirectional_dynamic_rnn``:
  outputs at ``t >= len`` are zero and state stops updating, and the
  backward direction runs over the *length-reversed* sequence
  (``tf.reverse_sequence``) so frame 0 of the bw pass is the last valid
  frame of each example.

Performance shape: the input projection ``x @ W`` for every timestep is
hoisted out of the scan into one large ``[T*N, D] @ [D, 4H]`` matmul (MXU),
so the per-step body is only the recurrent ``[N, H] @ [H, 4H]`` matmul and
fused gate elementwise ops. A fully fused Pallas scan (weights resident in
VMEM) is the ``cfg.LSTM_IMPL='pallas'`` variant in ``rnn_pallas.py``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def lstm_init(rng: jax.Array, input_dim: int, hidden: int,
              dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Glorot-uniform kernel [input+hidden, 4*hidden], zero bias (TF1 default)."""
    k = jax.nn.initializers.glorot_uniform()(
        rng, (input_dim + hidden, 4 * hidden), dtype)
    return {'kernel': k, 'bias': jnp.zeros((4 * hidden,), dtype)}


def _cell_step(h, c, x_proj, u, bias, forget_bias=1.0):
    """One LSTM step given the precomputed input projection ``x_proj``."""
    gates = x_proj + h @ u + bias
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_h, new_c


def lstm_scan(params, x_tm: jnp.ndarray, lens: jnp.ndarray,
              forget_bias: float = 1.0) -> jnp.ndarray:
    """Unidirectional masked LSTM over time-major input [T, N, D] -> [T, N, H]."""
    t_len, n, d = x_tm.shape
    four_h = params['kernel'].shape[1]
    h_dim = four_h // 4
    w = params['kernel'][:d]          # input weights
    u = params['kernel'][d:]          # recurrent weights
    bias = params['bias']

    # hoist the input projection: one big MXU matmul instead of T small ones
    x_proj = (x_tm.reshape(t_len * n, d) @ w).reshape(t_len, n, four_h)

    def step(carry, inp):
        h, c, t = carry
        xp = inp
        new_h, new_c = _cell_step(h, c, xp, u, bias, forget_bias)
        live = (t < lens)[:, None].astype(h.dtype)
        h = live * new_h + (1.0 - live) * h
        c = live * new_c + (1.0 - live) * c
        out = live * new_h          # dynamic_rnn zeroes outputs past seq len
        return (h, c, t + 1), out

    h0 = jnp.zeros((n, h_dim), x_tm.dtype)
    c0 = jnp.zeros((n, h_dim), x_tm.dtype)
    _, out = jax.lax.scan(step, (h0, c0, jnp.int32(0)), x_proj)
    return out


def select_scan():
    """The configured masked-LSTM scan implementation (cfg.LSTM_IMPL):
    'pallas' -> the fused VMEM-resident kernel, anything else -> lax.scan.
    Single dispatch point for every LSTM layer variant.

    'pallas' is a TPU fast path only: off-TPU it would run in the Pallas
    *interpreter* (far slower than lax.scan), so CPU/GPU backends fall back
    to the scan. The kernel tests exercise interpret mode directly."""
    import jax
    from ..config import cfg
    if str(cfg.LSTM_IMPL) == 'pallas' and jax.default_backend() == 'tpu':
        from . import rnn_pallas
        return rnn_pallas.lstm_scan
    return lstm_scan


def reverse_sequence(x_tm: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Per-example reversal of the first ``lens[n]`` frames (tf.reverse_sequence).

    x_tm: [T, N, ...]; frames past ``lens`` keep their position.
    """
    t_len, n = x_tm.shape[0], x_tm.shape[1]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (t_len, n), 0)
    src = jnp.where(t_idx < lens[None, :], lens[None, :] - 1 - t_idx, t_idx)
    return jnp.take_along_axis(
        x_tm, src.reshape(src.shape + (1,) * (x_tm.ndim - 2)), axis=0)


def bilstm_scan_pair(params, x: jnp.ndarray, lens: jnp.ndarray,
                     forget_bias: float = 1.0) -> jnp.ndarray:
    """BiLSTM as two directional scans + reverse_sequence gathers (the
    portable formulation; conformance reference for the fused kernel)."""
    scan = select_scan()
    x_tm = jnp.swapaxes(x, 0, 1)
    out_fw = scan(params['fw'], x_tm, lens, forget_bias)
    x_rev = reverse_sequence(x_tm, lens)
    out_bw_rev = scan(params['bw'], x_rev, lens, forget_bias)
    out_bw = reverse_sequence(out_bw_rev, lens)
    out = jnp.concatenate([out_fw, out_bw], axis=-1)
    return jnp.swapaxes(out, 0, 1)


def select_bilstm():
    """The configured BiLSTM implementation. On TPU with
    ``cfg.LSTM_IMPL='pallas'``: the fully fused single-kernel BiLSTM
    (rnn_pallas.bilstm — one sequential grid covers both directions and
    the per-example reversal, no gathers). Otherwise: two masked scans
    + reverse_sequence."""
    import jax
    from ..config import cfg
    if str(cfg.LSTM_IMPL) == 'pallas' and jax.default_backend() == 'tpu':
        from . import rnn_pallas
        return rnn_pallas.bilstm
    return bilstm_scan_pair


def bilstm(params, x: jnp.ndarray, lens: jnp.ndarray,
           forget_bias: float = 1.0) -> jnp.ndarray:
    """Bidirectional masked LSTM.

    Args:
      params: {'fw': {kernel, bias}, 'bw': {kernel, bias}} each hidden H.
      x:      [N, T, D] batch-major input.
      lens:   [N] valid frame counts.
    Returns:
      [N, T, 2H] concat(fw, bw) outputs, zero past ``lens``
      (tf.nn.bidirectional_dynamic_rnn contract, network.py:107-109).
    """
    return select_bilstm()(params, x, lens, forget_bias)


def bilstm_init(rng: jax.Array, input_dim: int, num_hids: int,
                dtype=jnp.float32) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Init for ``bilstm``: two direction cells of ``num_hids//2`` units each
    (reference: LSTMCell(num_hids//2) fw/bw, network.py:104-105)."""
    k_fw, k_bw = jax.random.split(rng)
    h = num_hids // 2
    return {'fw': lstm_init(k_fw, input_dim, h, dtype),
            'bw': lstm_init(k_bw, input_dim, h, dtype)}
