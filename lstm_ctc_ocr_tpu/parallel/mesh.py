"""Data parallelism over a TPU mesh: jit + NamedSharding over ICI.

The reference has no device parallelism at all — one GPU picked via
CUDA_VISIBLE_DEVICES (train_net.py:59) and 12 host data workers
(SURVEY.md section 2, "Parallelism strategies"). The TPU-native scale-out
story is SPMD: a 1-D ``jax.sharding.Mesh`` over the chips, the batch
sharded on the ``data`` axis, parameters and optimizer state replicated,
and XLA inserting the gradient ``psum`` (and the cross-shard BN-statistics
all-reduce) automatically from the sharding annotations. Collectives ride
ICI; no NCCL/MPI translation.

``make_parallel_train_step`` reuses the exact single-chip loss
(engine/train.py) — only the sharding annotations differ, so single-chip
and multi-chip training are the same program by construction (verified
numerically in tests/test_parallel.py on a virtual 8-device CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.train import make_loss_fn


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host (multi-slice / pod) runtime init.

    One controller process per host: call this before any other JAX use,
    then ``make_mesh()`` sees the *global* device set and the same sharded
    train step scales across hosts (DCN between slices, ICI within).
    Arguments default to the ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env vars; on a managed TPU
    pod where the runtime can discover the topology, setting only
    ``JAX_COORDINATOR_ADDRESS`` (or passing it) is enough. Returns the
    process count.

    No-op single-process fallback when neither arguments nor env vars are
    configured, so single-host entry points can call it unconditionally.
    """
    import os
    coord = coordinator_address or os.environ.get('JAX_COORDINATOR_ADDRESS')
    if num_processes is None and 'JAX_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and 'JAX_PROCESS_ID' in os.environ:
        process_id = int(os.environ['JAX_PROCESS_ID'])
    if coord is None and num_processes is None:
        return 1
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count()


def shard_host_batch(mesh: Mesh, *arrays, axis: str = 'data'):
    """Per-host local batches -> one global sharded array per input.

    Multi-host analogue of :func:`shard_batch`: each host passes only its
    local slice of the global batch (its own synth workers' output) and the
    result is a global array sharded over ``axis`` without any cross-host
    data movement.
    """
    sh = batch_sharded(mesh, axis)
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in arrays)


def make_mesh(n_devices: Optional[int] = None, axis: str = 'data') -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), \
        'requested {} devices, have {}'.format(n, len(devices))
    return Mesh(np.array(devices[:n]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, *arrays, axis: str = 'data'):
    """Host arrays -> device arrays sharded on the leading (batch) dim."""
    sh = batch_sharded(mesh, axis)
    return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)


def chunk_sharded(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Sharding for K-step dispatch chunks [K, batch, ...]: the scan (step)
    axis replicated, the batch axis sharded."""
    return NamedSharding(mesh, P(None, axis))


def shard_chunk(mesh: Mesh, *arrays, axis: str = 'data'):
    """Host arrays [K, batch, ...] -> batch-axis-sharded device arrays."""
    sh = chunk_sharded(mesh, axis)
    return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)


def shard_host_chunk(mesh: Mesh, *arrays, axis: str = 'data'):
    """Per-host local chunks [K, local_batch, ...] -> global arrays sharded
    on the batch axis (multi-host analogue of :func:`shard_chunk`)."""
    sh = chunk_sharded(mesh, axis)
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in arrays)


def make_parallel_train_step(net, tx, dtype, mesh: Mesh, axis: str = 'data'):
    """DP train step: params/opt replicated, batch sharded; grads psum'd by
    XLA. Delegates to the single-chip factory with sharding annotations, so
    multi-chip training is literally the same step function."""
    from ..engine.train import make_train_step
    repl = replicated(mesh)
    dsh = batch_sharded(mesh, axis)
    # args: params, opt_state, bn_state, image, label, label_len, time_step,
    # step_idx — state replicated, batch sharded; the bn EMA update consumes
    # batch statistics XLA already all-reduced across shards, so the
    # replicated bn_state stays bit-identical on every device
    return make_train_step(
        net, tx, dtype,
        in_shardings=(repl, repl, repl, dsh, dsh, dsh, dsh, repl),
        out_shardings=(repl, repl, repl, repl, repl))


def make_parallel_train_chunk_step(net, tx, dtype, mesh: Mesh, n_steps: int,
                                   axis: str = 'data'):
    """DP K-step dispatch chunk (engine/train.py make_train_chunk_step with
    mesh annotations): state replicated, the stacked batches sharded on
    their batch axis (axis 1), per-step loss arrays replicated."""
    from ..engine.train import make_train_chunk_step
    repl = replicated(mesh)
    csh = chunk_sharded(mesh, axis)
    return make_train_chunk_step(
        net, tx, dtype, n_steps,
        in_shardings=(repl, repl, repl, csh, csh, csh, csh, repl),
        out_shardings=(repl, repl, repl, repl, repl))


def make_parallel_train_step_gather(net, tx, dtype, mesh: Mesh,
                                    axis: str = 'data'):
    """DP gather step for the device-resident dataset (data/device_store.py):
    params/opt/bn AND the store arrays replicated, the [N] index array
    batch-sharded — each device gathers its local batch shard from its own
    store replica, so per-step host->device traffic is the index array and
    the only collective is the usual grad psum."""
    from ..engine.train import make_train_step_gather
    repl = replicated(mesh)
    dsh = batch_sharded(mesh, axis)
    # args: params, opt_state, bn_state, img, lab, lab_len, t_step, idx,
    # step_idx
    return make_train_step_gather(
        net, tx, dtype,
        in_shardings=(repl, repl, repl, repl, repl, repl, repl, dsh, repl),
        out_shardings=(repl, repl, repl, repl, repl))


def make_parallel_train_chunk_step_gather(net, tx, dtype, mesh: Mesh,
                                          n_steps: int, axis: str = 'data'):
    """K-step dispatch chunk over the device-resident store: [K, N] index
    rows sharded on the batch axis (axis 1), store + state replicated."""
    from ..engine.train import make_train_chunk_step_gather
    repl = replicated(mesh)
    csh = chunk_sharded(mesh, axis)
    return make_train_chunk_step_gather(
        net, tx, dtype, n_steps,
        in_shardings=(repl, repl, repl, repl, repl, repl, repl, csh, repl),
        out_shardings=(repl, repl, repl, repl, repl))


def block_sharded(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Sharding for per-device block arrays [D, ...]: the leading device
    axis sharded, everything after it local to the owning device."""
    return NamedSharding(mesh, P(axis))


def make_parallel_train_step_gather_sharded(net, tx, dtype, mesh: Mesh,
                                            axis: str = 'data'):
    """DP gather step for the SHARDED device store: per-device row blocks
    [D, R, ...] and per-device index rows [D, B/D] both sharded on the
    leading device axis — each chip gathers its batch shard from its OWN
    dataset partition (no replication, no cross-chip gather traffic), and
    the only collective stays the grad psum. This is the multi-host
    device-residence layout: each host uploads only its local devices'
    partitions (data/device_store.py:ShardedDeviceStore)."""
    from ..engine.train import make_train_step_gather_blocks
    repl = replicated(mesh)
    bsh = block_sharded(mesh, axis)
    # args: params, opt_state, bn_state, img, lab, lab_len, t_step, idx,
    # step_idx
    return make_train_step_gather_blocks(
        net, tx, dtype,
        in_shardings=(repl, repl, repl, bsh, bsh, bsh, bsh, bsh, repl),
        out_shardings=(repl, repl, repl, repl, repl))


def make_parallel_train_chunk_step_gather_sharded(net, tx, dtype, mesh: Mesh,
                                                  n_steps: int,
                                                  axis: str = 'data'):
    """K-step dispatch chunk over the sharded store: idxs [K, D, B/D] with
    the device axis (axis 1) sharded, store blocks + state as in
    :func:`make_parallel_train_step_gather_sharded`."""
    from ..engine.train import make_train_chunk_step_gather_blocks
    repl = replicated(mesh)
    bsh = block_sharded(mesh, axis)
    ksh = NamedSharding(mesh, P(None, axis))
    return make_train_chunk_step_gather_blocks(
        net, tx, dtype, n_steps,
        in_shardings=(repl, repl, repl, bsh, bsh, bsh, bsh, ksh, repl),
        out_shardings=(repl, repl, repl, repl, repl))


def make_parallel_decode_step(net, dtype, mesh: Mesh, axis: str = 'data'):
    """DP decode step for batched validation/eval across the mesh (same
    delegation as the train step)."""
    from ..engine.train import make_decode_step
    repl = replicated(mesh)
    dsh = batch_sharded(mesh, axis)
    return make_decode_step(net, dtype,
                            in_shardings=(repl, repl, dsh, dsh),
                            out_shardings=dsh)
