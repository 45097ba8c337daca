"""Training driver: jitted train step, snapshot/restore, in-loop validation.

Role-equivalent of the reference SolverWrapper/train_net
(/root/reference/lib/lstm/train.py:10-174) with the TF1 session loop
replaced by a single donated ``jax.jit`` train step compiled once per width
bucket:

* optimizer select Adam/RMS/Momentum (train.py:74-76) via optax, global-norm
  gradient clip 10 (train.py:79-83), step lr decay ``lr *= GAMMA`` every
  STEPSIZE iters (train.py:114-115) as a schedule;
* loss = mean per-example CTC + L2 regularization collection
  (network.py:653-662);
* display cadence with loss/lr/speed (train.py:135-138), snapshot every
  SNAPSHOT_ITERS or on a new loss minimum below 0.015 (train.py:139-144;
  quirk fixed: we snapshot the true step, not "iter 2"), validation on a
  cached first val batch every VAL_STEP (train.py:145-162);
* restore-latest + resume-step contract (train.py:96-106) via
  ``checkpoint.restore_latest`` — optimizer state included (TF Saver parity).

Host->device: the synth workers produce fixed-shape bucketed batches
(data/gen.py) so the per-step transfer is the only host boundary; XLA sees
one static program per bucket.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import cfg
from ..data.gen import get_batch
from ..ops.decoder import greedy_decode
from ..utils.metrics import accuracy_calculation
from ..utils.profiler import StepProfiler
from . import checkpoint
from .summary import SummaryWriter


def enable_persistent_compile_cache():
    """XLA compiles of the train step run minutes on TPU; cache them on disk
    so restarts (resume, eval, bench) reuse compiled executables."""
    try:
        cache_dir = os.path.join(cfg.ROOT_DIR, '.jax_cache')
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception as e:  # older jax versions: non-fatal
        print('persistent compile cache unavailable:', e)


def lr_schedule(step):
    """lr = LEARNING_RATE * GAMMA^(step // STEPSIZE) (train.py:114-115)."""
    e = jnp.asarray(step) // cfg.TRAIN.STEPSIZE
    return cfg.TRAIN.LEARNING_RATE * jnp.power(cfg.TRAIN.GAMMA, e.astype(jnp.float32))


def make_optimizer():
    solver = cfg.TRAIN.SOLVER
    if solver == 'Adam':
        opt = optax.adam(lr_schedule, eps=1e-8)
    elif solver == 'RMS':
        opt = optax.rmsprop(lr_schedule, decay=0.9, eps=1e-10)
    else:  # Momentum
        opt = optax.sgd(lr_schedule, momentum=cfg.TRAIN.MOMENTUM)
    return optax.chain(optax.clip_by_global_norm(cfg.TRAIN.GRAD_CLIP), opt)


def compute_dtype():
    return {'bfloat16': jnp.bfloat16, 'float32': None}.get(
        str(cfg.TRAIN.DTYPE), None)


def make_loss_fn(net, dtype):
    from ..ops.ctc import select_ctc_loss
    ctc_loss_impl = select_ctc_loss()      # honors cfg.CTC_IMPL

    def loss_fn(params, image, label, label_len, time_step, rng):
        bn_batch = {}    # bn=True convs deposit their batch mean/var here
        out = net.apply(params, {'data': image, 'time_step_len': time_step},
                        train=True, rng=rng, dtype=dtype, bn_collect=bn_batch)
        logits = jnp.transpose(out['logits'], (1, 0, 2))   # [N, T, C]
        losses = ctc_loss_impl(logits, label, label_len, time_step)
        # infeasible alignments (logit_len too short for the label) carry
        # the 1e30 sentinel and a zero gradient; average over FEASIBLE
        # examples only so one degenerate sample can't blow up the loss
        # scalar and disable the low-loss snapshot trigger for the run
        feasible = losses < 1e29
        n_ok = jnp.maximum(jnp.sum(feasible), 1)
        ctc = jnp.sum(jnp.where(feasible, losses, 0.0)) / n_ok
        total = ctc + net.regularization_loss(params)
        return total, (ctc, bn_batch)
    return loss_fn


def _make_sgd_step(net, tx, dtype):
    """The un-jitted single optimizer step shared by :func:`make_train_step`
    (K=1 dispatch) and :func:`make_train_chunk_step` (K-step lax.scan), so
    the two paths are the same math by construction."""
    loss_fn = make_loss_fn(net, dtype)
    base_key = jax.random.PRNGKey(int(cfg.RNG_SEED))
    momentum = float(cfg.BN_MOMENTUM)

    def sgd_step(params, opt_state, bn_state, image, label, label_len,
                 time_step, step_idx):
        rng = jax.random.fold_in(base_key, step_idx)
        (total, (ctc, bn_batch)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            params, image, label, label_len, time_step, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # moving BN statistics as non-optimized state: the reference's TF1
        # graph registers the same EMA updates into UPDATE_OPS but never
        # runs them (network.py:176-178 + train.py's bare sess.run), so its
        # moving stats stay at init forever — here they actually track, and
        # cfg.BN_EVAL='moving' eval can use them
        bn_state = jax.tree.map(
            lambda old, new: momentum * old + (1.0 - momentum) * new,
            bn_state, bn_batch)
        return params, opt_state, bn_state, total, ctc

    return sgd_step


def make_train_step(net, tx, dtype, in_shardings=None, out_shardings=None):
    """The jitted train step takes the *iteration number* (a traced int32
    scalar), not a PRNG key: the per-step key is derived on-device via
    ``fold_in``. A host-side ``jax.random.split`` per iteration is a tiny
    device op whose dispatch round-trip serializes the pipeline over the
    TPU tunnel (it roughly tripled the Python-side dispatch rate when
    removed; audited end-to-end numbers live in PERF.md). fold_in(base, it)
    is also deterministic per iteration, so resume reproduces the exact
    key stream.

    ``in_shardings``/``out_shardings`` annotate the same program for a
    device mesh (parallel/mesh.py delegates here, so single-chip and
    multi-chip training are literally the same step function)."""
    sgd_step = _make_sgd_step(net, tx, dtype)
    jit_kwargs = {'donate_argnums': (0, 1, 2)}
    if in_shardings is not None:
        jit_kwargs['in_shardings'] = in_shardings
        jit_kwargs['out_shardings'] = out_shardings
    return functools.partial(jax.jit, **jit_kwargs)(sgd_step)


def make_train_chunk_step(net, tx, dtype, n_steps,
                          in_shardings=None, out_shardings=None):
    """K optimizer steps per dispatch (cfg.TRAIN.STEPS_PER_DISPATCH).

    One jit call runs ``n_steps`` consecutive optimizer steps as a
    ``lax.scan`` over K pre-staged same-bucket batches (stacked on a new
    leading axis), returning the per-step loss arrays. This is the
    TPU-idiomatic host training loop: on hosts where the per-dispatch
    Python + tunnel round-trip dominates (PERF.md's sustained table shows
    it eating ~75% of the wall clock on this 1-core box), the overhead
    amortizes K-fold while the device-side math stays step-for-step
    IDENTICAL to the 1-step program — same ``fold_in(base, step)`` key
    stream, same optax schedule counts, same BN-EMA updates
    (tests/test_multistep.py asserts bit-equality of the trajectories).

    The reference has no analogue: its sess.run returns the loss
    synchronously every iteration (/root/reference/lib/lstm/train.py:121-138).
    """
    sgd_step = _make_sgd_step(net, tx, dtype)
    jit_kwargs = {'donate_argnums': (0, 1, 2)}
    if in_shardings is not None:
        jit_kwargs['in_shardings'] = in_shardings
        jit_kwargs['out_shardings'] = out_shardings

    @functools.partial(jax.jit, **jit_kwargs)
    def train_chunk(params, opt_state, bn_state, images, labels, label_lens,
                    time_steps, step_idx0):
        def body(carry, xs):
            params, opt_state, bn_state = carry
            image, label, label_len, time_step, idx = xs
            params, opt_state, bn_state, total, ctc = sgd_step(
                params, opt_state, bn_state, image, label, label_len,
                time_step, idx)
            return (params, opt_state, bn_state), (total, ctc)

        idxs = jnp.asarray(step_idx0, jnp.int32) + jnp.arange(
            n_steps, dtype=jnp.int32)
        (params, opt_state, bn_state), (totals, ctcs) = jax.lax.scan(
            body, (params, opt_state, bn_state),
            (images, labels, label_lens, time_steps, idxs))
        return params, opt_state, bn_state, totals, ctcs

    return train_chunk


def make_train_step_gather(net, tx, dtype, in_shardings=None,
                           out_shardings=None):
    """Train step for the device-resident dataset (data/device_store.py):
    the batch is gathered ON DEVICE from the HBM-resident store by row
    index, so the host->device payload per step is the [N] int32 index
    array (~1 KB) instead of the image batch (~786 KB) — the transfer the
    sustained-throughput measurements showed to be the bottleneck
    (PERF.md). Same per-step math as make_train_step by construction.

    ``in_shardings``/``out_shardings`` annotate the same program for a DP
    mesh (parallel/mesh.py:make_parallel_train_step_gather): the store is
    replicated per device and the index array batch-sharded, so each chip
    gathers its local shard from its own replica — the gather itself never
    crosses ICI."""
    sgd_step = _make_sgd_step(net, tx, dtype)
    jit_kwargs = {'donate_argnums': (0, 1, 2)}
    if in_shardings is not None:
        jit_kwargs['in_shardings'] = in_shardings
        jit_kwargs['out_shardings'] = out_shardings

    @functools.partial(jax.jit, **jit_kwargs)
    def step(params, opt_state, bn_state, img, lab, lab_len, t_step,
             idx, step_idx):
        return sgd_step(params, opt_state, bn_state,
                        jnp.take(img, idx, axis=0),
                        jnp.take(lab, idx, axis=0),
                        jnp.take(lab_len, idx, axis=0),
                        jnp.take(t_step, idx, axis=0), step_idx)
    return step


def make_train_chunk_step_gather(net, tx, dtype, n_steps,
                                 in_shardings=None, out_shardings=None):
    """K gather-steps per dispatch: lax.scan over [K, N] index rows against
    the device-resident store. Unlike the host-batch chunk program
    (make_train_chunk_step), there is nothing left to transfer per step,
    so the K-fold dispatch amortization helps rather than hurts — measured
    +11% at K=8 and +13.5% at K=16 over the store's K=1 rate on the chip
    (PERF.md "Device-resident dataset") — and the store is a single
    bucket, so groups never break on width changes."""
    sgd_step = _make_sgd_step(net, tx, dtype)
    jit_kwargs = {'donate_argnums': (0, 1, 2)}
    if in_shardings is not None:
        jit_kwargs['in_shardings'] = in_shardings
        jit_kwargs['out_shardings'] = out_shardings

    @functools.partial(jax.jit, **jit_kwargs)
    def chunk(params, opt_state, bn_state, img, lab, lab_len, t_step,
              idxs, step_idx0):
        def body(carry, xs):
            params, opt_state, bn_state = carry
            idx, i = xs
            params, opt_state, bn_state, total, ctc = sgd_step(
                params, opt_state, bn_state,
                jnp.take(img, idx, axis=0), jnp.take(lab, idx, axis=0),
                jnp.take(lab_len, idx, axis=0),
                jnp.take(t_step, idx, axis=0), i)
            return (params, opt_state, bn_state), (total, ctc)

        steps = jnp.asarray(step_idx0, jnp.int32) + jnp.arange(
            n_steps, dtype=jnp.int32)
        (params, opt_state, bn_state), (totals, ctcs) = jax.lax.scan(
            body, (params, opt_state, bn_state), (idxs, steps))
        return params, opt_state, bn_state, totals, ctcs

    return chunk


def make_train_step_gather_blocks(net, tx, dtype, in_shardings=None,
                                  out_shardings=None):
    """Gather step for the SHARDED device store (per-device row blocks).

    The store arrays carry a leading device axis — ``img [D, R, W, F]``
    sharded over the mesh's data axis, so device ``d`` holds only its own
    ``R``-row partition — and ``idx [D, B/D]`` (same sharding) holds each
    device's LOCAL row ids. The batched ``vmap(take)`` gathers block-local
    rows: the sharded operands share the mesh axis, so GSPMD partitions the
    gather with no collective, and each chip reads only its own HBM. This
    is the multi-host device-residence layout (data/device_store.py:
    ShardedDeviceStore): hosts feed disjoint dataset partitions and ship
    only index arrays after the one-time upload."""
    sgd_step = _make_sgd_step(net, tx, dtype)
    jit_kwargs = {'donate_argnums': (0, 1, 2)}
    if in_shardings is not None:
        jit_kwargs['in_shardings'] = in_shardings
        jit_kwargs['out_shardings'] = out_shardings

    take = jax.vmap(lambda a, i: jnp.take(a, i, axis=0))

    def flat(x):
        return x.reshape((-1,) + x.shape[2:])

    @functools.partial(jax.jit, **jit_kwargs)
    def step(params, opt_state, bn_state, img, lab, lab_len, t_step,
             idx, step_idx):
        return sgd_step(params, opt_state, bn_state,
                        flat(take(img, idx)), flat(take(lab, idx)),
                        flat(take(lab_len, idx)), flat(take(t_step, idx)),
                        step_idx)
    return step


def make_train_chunk_step_gather_blocks(net, tx, dtype, n_steps,
                                        in_shardings=None,
                                        out_shardings=None):
    """K block-gather steps per dispatch: lax.scan over ``idxs [K, D, B/D]``
    against the sharded store (make_train_step_gather_blocks semantics)."""
    sgd_step = _make_sgd_step(net, tx, dtype)
    jit_kwargs = {'donate_argnums': (0, 1, 2)}
    if in_shardings is not None:
        jit_kwargs['in_shardings'] = in_shardings
        jit_kwargs['out_shardings'] = out_shardings

    take = jax.vmap(lambda a, i: jnp.take(a, i, axis=0))

    def flat(x):
        return x.reshape((-1,) + x.shape[2:])

    @functools.partial(jax.jit, **jit_kwargs)
    def chunk(params, opt_state, bn_state, img, lab, lab_len, t_step,
              idxs, step_idx0):
        def body(carry, xs):
            params, opt_state, bn_state = carry
            idx, i = xs
            params, opt_state, bn_state, total, ctc = sgd_step(
                params, opt_state, bn_state,
                flat(take(img, idx)), flat(take(lab, idx)),
                flat(take(lab_len, idx)), flat(take(t_step, idx)), i)
            return (params, opt_state, bn_state), (total, ctc)

        steps = jnp.asarray(step_idx0, jnp.int32) + jnp.arange(
            n_steps, dtype=jnp.int32)
        (params, opt_state, bn_state), (totals, ctcs) = jax.lax.scan(
            body, (params, opt_state, bn_state), (idxs, steps))
        return params, opt_state, bn_state, totals, ctcs

    return chunk


def make_decode_step(net, dtype, in_shardings=None, out_shardings=None):
    jit_kwargs = {}
    if in_shardings is not None:
        jit_kwargs['in_shardings'] = in_shardings
        jit_kwargs['out_shardings'] = out_shardings
    use_moving = str(cfg.BN_EVAL) == 'moving'

    @functools.partial(jax.jit, **jit_kwargs)
    def decode_step(params, bn_state, image, time_step):
        out = net.apply(params, {'data': image, 'time_step_len': time_step},
                        train=False, dtype=dtype,
                        bn_stats=bn_state if use_moving else None)
        logits = jnp.transpose(out['logits'], (1, 0, 2))
        if cfg.DECODER == 'beam':
            from ..ops.beam import beam_decode
            return beam_decode(logits, time_step, beam_width=cfg.BEAM_WIDTH,
                               merge_repeated=bool(cfg.BEAM_MERGE_REPEATED))
        return greedy_decode(logits, time_step)
    return decode_step


def global_accuracy(local_acc: float, local_n: int) -> float:
    """GLOBAL exact-match accuracy from per-process local scores.

    Each process scores only its own local val rows; the match/total counts
    reduce across hosts here — otherwise every host would print only its
    local-shard number and no global metric would exist anywhere
    (tests/multihost_worker.py pins global == the single-process value).
    Identity on single-process runs.
    """
    if jax.process_count() == 1:
        return local_acc
    from jax.experimental import multihost_utils
    local = np.asarray([local_acc * local_n, local_n], np.float32)
    counts = np.asarray(multihost_utils.process_allgather(local))
    return float(counts[:, 0].sum() / counts[:, 1].sum())


def effective_workers(requested: int) -> int:
    """Scale worker count to the host: a 1-core box runs inline."""
    try:
        import multiprocessing
        cores = multiprocessing.cpu_count()
    except Exception:
        cores = 1
    if cores <= 1:
        return 0
    return min(requested, max(cores - 1, 1))


def make_train_stream(batch_size):
    """Select the training data backend (cfg.DATA_BACKEND).

    'synth'   — fresh multiprocess captcha stream (beta path, gen.py)
    'pool'    — pre-rendered pool with incremental refresh (weak hosts)
    'records' — serialized dataset (dev path, tf_records.py equivalent)

    On a multi-host mesh each host feeds its own local shard, so synth
    seeds are offset per process (records/pool epochs are likewise
    decorrelated across hosts through the same seed offset). Module-level
    (not a SolverWrapper method) so bench.py --sustained drives the
    identical backend stream the solver trains from.
    """
    backend = str(cfg.DATA_BACKEND)
    seed = int(cfg.RNG_SEED) + 100003 * jax.process_index()
    if backend == 'records':
        from ..data.records import RecordsDataset
        ds = RecordsDataset(str(cfg.RECORDS_PATH),
                            cache_resized=bool(cfg.RECORDS_CACHE_RESIZED))
        print('records backend: {} examples from {}'.format(
            len(ds), cfg.RECORDS_PATH))
        return ds.batch_iterator(batch_size, shuffle=True, seed=seed)
    if backend == 'pool':
        from ..data.pool import PoolSampler
        pool = PoolSampler(int(cfg.POOL_SIZE), seed=seed)
        return pool.batch_iterator(batch_size)
    workers = effective_workers(int(cfg.TRAIN.NUM_WORKERS))
    return get_batch(num_workers=workers, seed=seed,
                     batch_size=batch_size, bucketed=True)


class SolverWrapper:
    """Training orchestrator (reference lib/lstm/train.py:10-162)."""

    def __init__(self, network, imgdb, pre_train, output_dir, logdir):
        self.net = network
        self.imgdb = imgdb
        self.pre_train = pre_train
        self.output_dir = output_dir
        self.writer = SummaryWriter(logdir, flush_secs=5)

    def snapshot(self, state, step):
        # keep_every exempts the SNAPSHOT_ITERS cadence from pruning so
        # low-loss-trigger spam near convergence can't evict the periodic
        # history (checkpoint.save docstring)
        fname = checkpoint.save(state, self.output_dir, step,
                                max_to_keep=100,
                                keep_every=int(cfg.TRAIN.SNAPSHOT_ITERS))
        print('Wrote snapshot to: {:s}'.format(fname))

    def _make_train_stream(self, batch_size):
        return make_train_stream(batch_size)

    @staticmethod
    def _select_mesh(batch_size):
        """DP mesh over the visible chips, or None for the single-device step.

        'auto' picks the largest device count that divides both the train and
        val batch sizes (every shard must be equal — static shapes). The
        reference trains on exactly one GPU (train_net.py:59); here
        ``./train.sh`` scales over every chip JAX can see.
        """
        if str(cfg.PARALLEL) == 'off':
            return None
        n_dev = len(jax.devices())
        if n_dev <= 1:
            return None
        val_bs = int(cfg.VAL.BATCH_SIZE)
        nd = n_dev
        while nd > 1 and (batch_size % nd or val_bs % nd):
            nd -= 1
        if nd <= 1:
            print('PARALLEL=auto: batch sizes ({}, {}) share no divisor with '
                  '{} devices; using the single-device step'.format(
                      batch_size, val_bs, n_dev))
            return None
        from ..parallel import mesh as pmesh
        return pmesh.make_mesh(nd)

    def train_model(self, max_iters, restore=False):
        enable_persistent_compile_cache()
        dtype = compute_dtype()
        bucket0 = int(cfg.BUCKETS[0])
        n = int(cfg.TRAIN.BATCH_SIZE)
        rng = jax.random.PRNGKey(cfg.RNG_SEED)
        rng, init_rng = jax.random.split(rng)
        params = self.net.init_params(
            init_rng, {'data': (n, bucket0, cfg.NUM_FEATURES),
                       'time_step_len': (n,)})
        tx = make_optimizer()
        opt_state = tx.init(params)
        bn_state = self.net.init_bn_state()

        restore_iter = 1
        if restore:
            # bn_state may be absent from pre-BN_EVAL-era snapshots: keep the
            # fresh init and let the EMA re-converge (it tracks within a few
            # hundred steps at BN_MOMENTUM=0.99)
            state, step = checkpoint.restore_latest(
                {'params': params, 'opt_state': opt_state,
                 'bn_state': bn_state},
                self.output_dir, allow_missing_prefixes=('bn_state',))
            if state is None:
                raise RuntimeError(
                    'restore requested but no checkpoint in {}'.format(self.output_dir))
            params, opt_state = state['params'], state['opt_state']
            bn_state = state['bn_state']
            restore_iter = step
            print('Restored step {} from {}'.format(step, self.output_dir))
        elif self.pre_train:
            if str(self.pre_train).endswith('.npy'):
                # reference Network.load format (network.py:50-63)
                params = checkpoint.load_npy_pretrained(
                    params, self.pre_train, ignore_missing=True)
            else:
                params = checkpoint.restore(
                    {'params': params}, self.pre_train)['params']
            print('Loaded pre-trained weights from {}'.format(self.pre_train))

        n_dispatch = max(1, int(cfg.TRAIN.STEPS_PER_DISPATCH))
        chunk_step = None
        mesh = self._select_mesh(n)
        # device-resident dataset (cfg.DATA_DEVICE): the pool/records rows
        # live in HBM and the step gathers by row index — per-step transfer
        # drops from the image batch to a ~1 KB index array (PERF.md
        # "Device-resident store", measured). Single-process: the store is
        # replicated per device and the index array batch-sharded on a DP
        # mesh (parallel/mesh.py). Multi-host: each device holds its OWN
        # dataset partition built from its host's local sampler stream
        # (ShardedDeviceStore) and hosts ship only per-device index rows.
        feed = None
        train_step_gather = chunk_gather = None
        force_sharded = (str(cfg.DATA_DEVICE_LAYOUT) == 'sharded'
                         and mesh is not None)
        if jax.process_count() == 1 and not force_sharded:
            from ..data.device_store import make_device_feed
            feed = make_device_feed(n, mesh=mesh)
        elif mesh is not None:
            from ..data.device_store import make_sharded_device_feed
            feed = make_sharded_device_feed(n, mesh)
        if feed is not None:
            if getattr(feed, 'layout', 'replicated') == 'sharded':
                from ..parallel import mesh as pmesh
                train_step_gather = \
                    pmesh.make_parallel_train_step_gather_sharded(
                        self.net, tx, dtype, mesh)
                if n_dispatch > 1:
                    chunk_gather = \
                        pmesh.make_parallel_train_chunk_step_gather_sharded(
                            self.net, tx, dtype, mesh, n_dispatch)
            elif mesh is not None:
                from ..parallel import mesh as pmesh
                train_step_gather = pmesh.make_parallel_train_step_gather(
                    self.net, tx, dtype, mesh)
                if n_dispatch > 1:
                    chunk_gather = pmesh.make_parallel_train_chunk_step_gather(
                        self.net, tx, dtype, mesh, n_dispatch)
            else:
                train_step_gather = make_train_step_gather(self.net, tx, dtype)
                if n_dispatch > 1:
                    chunk_gather = make_train_chunk_step_gather(
                        self.net, tx, dtype, n_dispatch)
        if mesh is not None:
            from ..parallel import mesh as pmesh
            print('DP mesh over {} device(s): {}'.format(
                mesh.size, [str(d) for d in mesh.devices.flat]))
            train_step = pmesh.make_parallel_train_step(self.net, tx, dtype, mesh)
            decode_step = pmesh.make_parallel_decode_step(self.net, dtype, mesh)
            repl = pmesh.replicated(mesh)
            params = jax.device_put(params, repl)
            opt_state = jax.device_put(opt_state, repl)
            bn_state = jax.device_put(bn_state, repl)
            if jax.process_count() > 1:
                def put(*arrays):
                    """Local shard -> global batch-sharded arrays (multi-host)."""
                    return pmesh.shard_host_batch(mesh, *arrays)

                def put_chunk(*arrays):
                    return pmesh.shard_host_chunk(mesh, *arrays)
            else:
                def put(*arrays):
                    return pmesh.shard_batch(mesh, *arrays)

                def put_chunk(*arrays):
                    return pmesh.shard_chunk(mesh, *arrays)
            if n_dispatch > 1:
                chunk_step = pmesh.make_parallel_train_chunk_step(
                    self.net, tx, dtype, mesh, n_dispatch)
        else:
            train_step = make_train_step(self.net, tx, dtype)
            decode_step = make_decode_step(self.net, dtype)

            def put(*arrays):
                return tuple(jnp.asarray(a) for a in arrays)

            put_chunk = put
            if n_dispatch > 1:
                chunk_step = make_train_chunk_step(
                    self.net, tx, dtype, n_dispatch)

        # each host renders/reads only its local slice of the global batch
        n_proc = jax.process_count()
        if n % n_proc or int(cfg.VAL.BATCH_SIZE) % n_proc:
            raise ValueError(
                'TRAIN.BATCH_SIZE ({}) and VAL.BATCH_SIZE ({}) must both be '
                'divisible by the process count ({}) so every host feeds an '
                'equal shard'.format(n, cfg.VAL.BATCH_SIZE, n_proc))
        local_n = n // n_proc
        local_val = int(cfg.VAL.BATCH_SIZE) // n_proc
        # with a device feed the host stream is redundant (the feed owns the
        # backend's sampler and RNG streams)
        train_gen = None if feed is not None \
            else self._make_train_stream(local_n)
        # val seed offset per process like the train stream — otherwise
        # every host renders the same rows and the global val batch is
        # n_proc copies of VAL.BATCH_SIZE/n_proc unique examples
        val_gen = get_batch(
            num_workers=0,
            seed=cfg.RNG_SEED + 7 + 100003 * jax.process_index(),
            batch_size=local_val, bucketed=True)

        prof = StepProfiler()
        loss_min = float(cfg.TRAIN.LOSS_MIN_SNAPSHOT)
        val_batch = None

        # The loss scalars of dispatch group N are consumed after group N+1
        # is submitted: by then group N has finished on device, so the
        # readback never stalls the pipeline and the host renders the next
        # batches while the device runs the current group. (The reference's
        # sess.run returns loss synchronously every iter, train.py:121-130 —
        # on TPU that would serialize host and device.) Snapshots and
        # validation stay SYNCHRONOUS at their own cadence so a checkpoint
        # named iter_K always holds exactly the post-step-K state (resume
        # replays nothing); only the loss-triggered low-loss snapshot is
        # decided one group late, and is therefore named for the step whose
        # params it actually contains.
        #
        # A "group" is one host dispatch: a single step (the K=1 default —
        # exact reference-parity loop) or cfg.TRAIN.STEPS_PER_DISPATCH
        # consecutive same-bucket steps run on-device by the lax.scan chunk
        # program (make_train_chunk_step). Groups are clipped so snapshot/val
        # boundaries always land on a group end, and short runs (width
        # change, boundary remainder) fall back to the 1-step program — the
        # compiled-signature set stays at most {1-step, K-step} per bucket.
        pending = None                  # (first_it, totals, group_len)

        val_dev = None             # device-cached (image, time_step) pair

        def run_val(it):
            nonlocal val_batch, val_dev
            if val_batch is None:  # cached first batch (train.py:146-149)
                val_batch = next(val_gen)
                # ship it once: the SAME batch is validated every time
                # (reference parity), so re-transferring it per call only
                # costs tunnel bandwidth — and on this tunnel every
                # host->device batch also leaks host RSS (CLAUDE.md). The
                # decode step does not donate its inputs, so the cached
                # device arrays survive across calls.
                val_dev = put(val_batch.image, val_batch.time_step)
            vb = val_batch
            dec_arr = decode_step(params, bn_state, *val_dev)
            if jax.process_count() > 1:
                # this host's rows only: its addressable shards, global order
                shards = sorted(dec_arr.addressable_shards,
                                key=lambda s: s.index[0].start or 0)
                dec = np.concatenate([np.asarray(s.data) for s in shards])
            else:
                dec = np.asarray(dec_arr)
            org = [vb.label[i, :vb.label_len[i]].tolist()
                   for i in range(vb.label.shape[0])]
            acc = accuracy_calculation(org, dec.tolist(), ignore_value=0)
            acc = global_accuracy(acc, len(org))
            self.writer.add_scalar('val_accuracy', acc, it)
            print('accuracy: {:.5f}'.format(acc), flush=True)

        def process_group(first_it, totals, secs_per_iter, cur_end):
            """Lagged bookkeeping for the dispatch group starting at step
            ``first_it`` (params/opt_state have since advanced through step
            ``cur_end``). The displayed and logged value is the TOTAL loss
            (CTC + L2 collection), matching the reference's summary/display
            scalar (network.py:660-662 into train.py:135-138)."""
            nonlocal loss_min
            # one readback for the whole group: a [K] array from the chunk
            # program, or a list of lazy per-step device scalars
            vals = np.asarray(totals).reshape(-1).tolist()
            for j, loss_val in enumerate(vals):
                it = first_it + j
                self.writer.add_scalar('loss', loss_val, it)
                if it % cfg.TRAIN.DISPLAY == 0:
                    # the optimizer's schedule count before step `it` is it-1
                    # (fresh: steps 1..it-1 ran; resume: snapshot at step S
                    # holds count S and restarts at it=S+1) — print the lr
                    # the update actually used, not the next boundary's value
                    lr_now = float(lr_schedule(it - 1))
                    print('iter: %d / %d, total loss: %.7f, lr: %.7f' %
                          (it, max_iters, loss_val, lr_now), end=' ')
                    print('speed: {:.3f}s / iter'.format(secs_per_iter),
                          flush=True)

            lo = min(vals)
            if lo < loss_min:
                print('loss: ', lo, end=' ')
                loss_min = lo
                # params currently in scope are post-step cur_end; within a
                # group the trigger collapses to one snapshot (the params
                # the mid-group minima produced no longer exist)
                self.snapshot({'params': params, 'opt_state': opt_state,
                               'bn_state': bn_state}, cur_end + 1)
                run_val(first_it + int(np.argmin(vals)))

        K = n_dispatch
        holdover = []                # width-change carry-over, at most 1 batch

        def next_batches(target):
            """Up to ``target`` consecutive same-width batches, stream order
            preserved; a mid-run bucket change ends the run early and the odd
            batch carries over into the next group."""
            group = list(holdover)
            del holdover[:]
            while len(group) < target:
                b = next(train_gen)
                if group and b.image.shape[1] != group[0].image.shape[1]:
                    holdover.append(b)
                    break
                group.append(b)
            return group

        try:
            import time as _time
            group_t0 = None
            it = restore_iter
            while it < max_iters:
                prof.step(it)
                # wall time between successive dispatches IS the true s/iter:
                # train_step returns at dispatch (async), and the wait for
                # the device lands in the lagged group readback — timing just
                # the dispatch would exclude all device time
                now = _time.perf_counter()
                secs_per_iter = ((now - group_t0) / pending[2]
                                 if group_t0 is not None else 0.0)
                group_t0 = now
                # clip the group so snapshot/val boundaries land on group
                # ends (the cadence actions need exactly-post-step-K params)
                target = min(
                    K, max_iters - it,
                    cfg.TRAIN.SNAPSHOT_ITERS - it % cfg.TRAIN.SNAPSHOT_ITERS,
                    cfg.VAL.VAL_STEP - it % cfg.VAL.VAL_STEP)
                if feed is not None:
                    # device-resident path: ship indices, gather on device
                    # (index layout is the feed's contract — [m, N] global
                    # rows for the replicated store, [m, D, B/D] per-device
                    # local rows for the sharded one)
                    m = target if (chunk_gather is not None and target == K) \
                        else 1
                    if m > 1:
                        params, opt_state, bn_state, totals, ctcs = \
                            chunk_gather(params, opt_state, bn_state,
                                         *feed.store.arrays,
                                         feed.chunk_indices(n, m), it)
                    else:
                        params, opt_state, bn_state, total, ctc = \
                            train_step_gather(params, opt_state, bn_state,
                                              *feed.store.arrays,
                                              feed.step_indices(n), it)
                        totals = [total]
                    feed.tick(m)
                    if pending is not None:
                        process_group(pending[0], pending[1], secs_per_iter,
                                      cur_end=it + m - 1)
                    pending = (it, totals, m)
                    it_end = it + m - 1
                    if (it_end + 1) % cfg.TRAIN.SNAPSHOT_ITERS == 0:
                        self.snapshot({'params': params,
                                       'opt_state': opt_state,
                                       'bn_state': bn_state}, it_end + 1)
                    if (it_end + 1) % cfg.VAL.VAL_STEP == 0:
                        run_val(it_end)
                    it += m
                    continue
                group = next_batches(K if target == K else 1)
                m = len(group)
                if chunk_step is not None and m == K:
                    params, opt_state, bn_state, totals, ctcs = chunk_step(
                        params, opt_state, bn_state,
                        *put_chunk(
                            np.stack([b.image for b in group]),
                            np.stack([b.label for b in group]),
                            np.stack([b.label_len for b in group]),
                            np.stack([b.time_step for b in group])), it)
                else:
                    totals = []
                    for j, b in enumerate(group):
                        # per-step key folds in on-device (make_train_step);
                        # a host split here would add a dispatch round-trip
                        params, opt_state, bn_state, total, ctc = train_step(
                            params, opt_state, bn_state,
                            *put(b.image, b.label, b.label_len, b.time_step),
                            it + j)
                        totals.append(total)
                if pending is not None:
                    process_group(pending[0], pending[1], secs_per_iter,
                                  cur_end=it + m - 1)
                pending = (it, totals, m)

                it_end = it + m - 1
                if (it_end + 1) % cfg.TRAIN.SNAPSHOT_ITERS == 0:
                    self.snapshot({'params': params, 'opt_state': opt_state,
                                   'bn_state': bn_state}, it_end + 1)
                if (it_end + 1) % cfg.VAL.VAL_STEP == 0:
                    run_val(it_end)
                it += m
            if pending is not None:
                final_secs = ((_time.perf_counter() - group_t0) / pending[2]
                              if group_t0 is not None else 0.0)
                process_group(pending[0], pending[1], final_secs,
                              cur_end=pending[0] + pending[2] - 1)
        finally:
            prof.close()
            if train_gen is not None:
                train_gen.close()
            if feed is not None:
                feed.store.flush_refresh()
            val_gen.close()
            self.writer.close()
        return params, opt_state


def train_net(network, imgdb, pre_train, output_dir, log_dir,
              max_iters=40000, restore=False):
    """Entry point mirroring reference train.py:165-174."""
    sw = SolverWrapper(network, imgdb, pre_train, output_dir, log_dir)
    print('Solving...')
    result = sw.train_model(max_iters, restore=restore)
    print('done solving')
    return result
