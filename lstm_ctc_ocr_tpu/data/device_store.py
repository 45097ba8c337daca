"""Device-resident dataset: the pool/records backends living in HBM.

Measured on this host (PERF.md "Sustained end-to-end"), the training loop
is host->device *bandwidth*-bound: every step ships a full image batch
over the TPU link (786 KB/step at batch 256 even in the uint8 wire
format). The fixed-size backends make that transfer unnecessary: a
20k-image pool is ~103 MB as uint8, a 100k-example records dataset
~0.5 GB — both a rounding error in 16 GB of HBM.

So: upload the whole dataset ONCE as raw uint8 (padded to one width
bucket), and per step send only the sampled row indices (~1 KB); the
jitted train step gathers its batch on device
(engine/train.py:make_train_step_gather). Measured on the chip (PERF.md
"Device-resident dataset", 2026-08-20): sustained end-to-end training
goes 9,384 -> 16,471 img/s (pool, +76%) and 7,891 -> 16,179 img/s
(records, +105%) at batch 256 — the loop runs at the tunnel's ~63 Hz
dispatch ceiling with nothing left between host and chip. Pool refresh
still renders fresh images on the host, but they accumulate in a buffer
that flushes through a donated in-place row update every ~32 rows
instead of riding every batch. With the per-step payload gone,
TRAIN.STEPS_PER_DISPATCH pays for the first time on this host: the
K-step lax.scan program lifts the dispatch ceiling for another measured
+11% (K=8) / +13.5% (K=16, 18,363 img/s).

Semantics vs the host path (kept or consciously changed, in order):

* The gathered pixels, labels and per-row time_steps are IDENTICAL to
  what ``bucket_batch`` builds for the same rows, and the samplers
  consume the SAME RNG streams in the same order (pool: choice/refresh
  interleaving of PoolSampler; records: the permutation-walk of
  ``RecordsDataset.batch_iterator``) — pinned by tests/test_device_store.py.
* Every batch is padded to the single store-wide bucket (the widest
  row's). The host path pads to the *sampled max* width's bucket — which
  at batch >= 64 is the store bucket virtually always (the max of 64+
  draws), so this is the same program the host path runs; tiny batches
  on narrow draws would have used a narrower bucket.
* Reference lineage: this is the dev branch's "load data at once"
  old-master idea (/root/reference/README.md:3-6) pushed to its TPU
  conclusion — the dataset lives where the compute is.

Enabled by ``cfg.DATA_DEVICE`` ('auto' uses it for pool/records when the
store fits ``cfg.DATA_DEVICE_MAX_MB``). Two layouts
(``cfg.DATA_DEVICE_LAYOUT``): the replicated store above (single-process;
one full replica per device on a DP mesh, zero gather traffic), and
:class:`ShardedDeviceStore` — per-DEVICE dataset partitions, the
multi-host layout (each host uploads only its local devices' partitions
from its own sampler stream; also forceable single-process for datasets
too big to replicate: n_dev x less HBM per chip).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from ..config import cfg, get_encode_decode_dict
from .gen import max_label_len, pick_bucket


def _pack_rows(images: List[np.ndarray], labels: List[str],
               w_bucket: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                       np.ndarray]:
    """Stack (image, label) rows into the store layout — exactly the pixel
    placement of gen.bucket_batch's uint8 path (width-major, zero right-pad,
    dense 0-padded labels, time_step = true_w//4 - 1)."""
    encode_maps, _ = get_encode_decode_dict()
    n = len(images)
    l_max = max_label_len()
    feat = int(cfg.NUM_FEATURES)
    img = np.zeros((n, w_bucket, feat), np.uint8)
    lab = np.zeros((n, l_max), np.int32)
    lab_len = np.zeros((n,), np.int32)
    t_step = np.zeros((n,), np.int32)
    for i, (im, s) in enumerate(zip(images, labels)):
        w = im.shape[1]
        assert w <= w_bucket, 'row wider than the store bucket'
        img[i, :w, :] = im.swapaxes(0, 1).reshape(w, -1)
        code = [encode_maps[c] for c in s]
        assert len(code) <= l_max, f'label longer than MAX_LEN: {s}'
        lab[i, :len(code)] = code
        lab_len[i] = len(code)
        t_step[i] = w // int(cfg.POOL_SCALE) + int(cfg.OFFSET_TIME_STEP)
    return img, lab, lab_len, t_step


@functools.lru_cache(maxsize=None)
def _update_rows_fn():
    """Jitted donated row scatter: flushing refreshed rows updates the HBM
    arrays in place (donation aliases input/output buffers)."""
    import jax

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def update(img, lab, lab_len, t_step, rows, f_img, f_lab, f_len, f_ts):
        return (img.at[rows].set(f_img), lab.at[rows].set(f_lab),
                lab_len.at[rows].set(f_len), t_step.at[rows].set(f_ts))
    return update


class DeviceStore:
    """HBM-resident (image, label) rows + a host-side index sampler.

    ``mode='uniform'``: per-batch ``choice(n, batch, replace=False)`` from
    ``np_rng`` (PoolSampler.sample_batch parity).
    ``mode='epoch'``:   shuffled epoch permutation walk
    (RecordsDataset.batch_iterator parity; drops the <batch remainder).
    """

    def __init__(self, images: List[np.ndarray], labels: List[str],
                 mode: str, np_rng: np.random.RandomState,
                 flush_every: int = 32, verbose: bool = True, mesh=None):
        import jax
        assert mode in ('uniform', 'epoch')
        self.mode = mode
        self._np_rng = np_rng
        self.n = len(images)
        self.w_bucket = pick_bucket(max(im.shape[1] for im in images))
        img, lab, lab_len, t_step = _pack_rows(images, labels, self.w_bucket)
        self.nbytes = img.nbytes + lab.nbytes + lab_len.nbytes + t_step.nbytes
        if verbose:
            extra = (' x{} replicas'.format(mesh.size) if mesh is not None
                     else '')
            print('device store: {} rows @ bucket {} -> {:.1f} MB in HBM{}'
                  .format(self.n, self.w_bucket, self.nbytes / 1e6, extra),
                  flush=True)
        if mesh is not None:
            # one full replica per device: the DP gather step
            # (parallel/mesh.py) shards only the index array, so each chip
            # gathers its batch shard locally with zero ICI traffic
            from jax.sharding import NamedSharding, PartitionSpec
            put = functools.partial(
                jax.device_put, device=NamedSharding(mesh, PartitionSpec()))
        else:
            put = jax.device_put
        self.img = put(img)
        self.lab = put(lab)
        self.lab_len = put(lab_len)
        self.t_step = put(t_step)
        self._order: Optional[np.ndarray] = None     # epoch mode
        self._pos = 0
        # refresh buffer: (row, image, label) triples awaiting a flush
        self._flush_every = int(flush_every)
        self._pending: List[Tuple[int, np.ndarray, str]] = []

    @property
    def arrays(self):
        return self.img, self.lab, self.lab_len, self.t_step

    # ---- sampling ------------------------------------------------------
    def next_indices(self, batch_size: int, k: int = 1) -> np.ndarray:
        """[k, batch_size] int32 row indices — k consecutive batches (one
        dispatch group). Consumes the RNG exactly like the host samplers."""
        out = np.empty((k, batch_size), np.int32)
        for j in range(k):
            if self.mode == 'uniform':
                out[j] = self._np_rng.choice(self.n, size=batch_size,
                                             replace=False)
            else:
                if self._order is None or self._pos + batch_size > self.n:
                    self._order = self._np_rng.permutation(self.n)
                    self._pos = 0
                out[j] = self._order[self._pos:self._pos + batch_size]
                self._pos += batch_size
        return out

    # ---- pool-style refresh ---------------------------------------------
    def stage_refresh(self, row: int, image: np.ndarray, label: str) -> None:
        """Queue a freshly rendered row replacement; flushed in blocks so
        the tiny updates don't cost a dispatch per training step. Rows wider
        than the store bucket are skipped (cannot fit; width distributions
        are stationary so this is rare and logged)."""
        if image.shape[1] > self.w_bucket:
            print('device store: skipping refresh row wider than bucket '
                  '({} > {})'.format(image.shape[1], self.w_bucket))
            return
        self._pending.append((row, image, label))
        if len(self._pending) >= self._flush_every:
            self.flush_refresh()

    def flush_refresh(self) -> None:
        if not self._pending:
            return
        rows = np.asarray([r for r, _, _ in self._pending], np.int32)
        f_img, f_lab, f_len, f_ts = _pack_rows(
            [im for _, im, _ in self._pending],
            [s for _, _, s in self._pending], self.w_bucket)
        self._pending = []
        self.img, self.lab, self.lab_len, self.t_step = _update_rows_fn()(
            self.img, self.lab, self.lab_len, self.t_step,
            rows, f_img, f_lab, f_len, f_ts)


class _ReplicatedIndices:
    """Uniform solver-facing index API shared by both store layouts: the
    replicated store takes plain [N] / [K, N] global-row arrays (the jit
    in_shardings reshard them on a mesh)."""

    layout = 'replicated'

    def step_indices(self, global_batch: int):
        import jax.numpy as jnp
        return jnp.asarray(self.next_indices(global_batch, 1)[0])

    def chunk_indices(self, global_batch: int, k: int):
        import jax.numpy as jnp
        return jnp.asarray(self.next_indices(global_batch, k))


class PoolDeviceFeed(_ReplicatedIndices):
    """Pool backend, device-resident: wraps a PoolSampler's image set and
    RNG streams; ``tick`` renders cfg.POOL_REFRESH fresh rows per training
    step (PoolSampler.batch_iterator's refresh cadence) into the staged
    buffer."""

    def __init__(self, pool, verbose: bool = True, mesh=None):
        self._pool = pool
        self.store = DeviceStore(pool.images, pool.labels, 'uniform',
                                 pool._np_rng, verbose=verbose, mesh=mesh)
        # free the host copy: the pool list is only needed to build the
        # store (the disk cache, not this list, serves restarts)
        pool.images, pool.labels = [], []

    def next_indices(self, batch_size: int, k: int = 1) -> np.ndarray:
        return self.store.next_indices(batch_size, k)

    def tick(self, steps: int = 1) -> None:
        from .pool import _render_resized
        for _ in range(int(cfg.POOL_REFRESH) * steps):
            row = int(self._pool._np_rng.randint(self.store.n))
            im, lab = _render_resized(self._pool._rng)
            self.store.stage_refresh(row, im, lab)


class RecordsDeviceFeed(_ReplicatedIndices):
    """Records backend, device-resident: materializes every record at model
    height once (the same resize/cache path batches use), uploads, then
    walks shuffled epochs exactly like RecordsDataset.batch_iterator."""

    def __init__(self, ds, seed: int, verbose: bool = True, mesh=None):
        images, labels = [], []
        for i in range(len(ds)):
            lab, im = ds.get_at_model_height(i)
            images.append(im)
            labels.append(lab)
        self.store = DeviceStore(images, labels, 'epoch',
                                 np.random.RandomState(seed), verbose=verbose,
                                 mesh=mesh)

    def next_indices(self, batch_size: int, k: int = 1) -> np.ndarray:
        return self.store.next_indices(batch_size, k)

    def tick(self, steps: int = 1) -> None:   # records never refresh
        pass


@functools.lru_cache(maxsize=None)
def _update_blocks_fn(mesh):
    """Jitted donated per-block row scatter for the sharded store: each
    device updates rows inside its OWN [R, ...] partition (vmap over the
    sharded device axis — no cross-device traffic)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    bsh = NamedSharding(mesh, P('data'))
    upd = jax.vmap(lambda a, r, v: a.at[r].set(v))

    @functools.partial(
        jax.jit, donate_argnums=(0, 1, 2, 3),
        in_shardings=(bsh,) * 9, out_shardings=(bsh,) * 4)
    def update(img, lab, lab_len, t_step, rows, f_img, f_lab, f_len, f_ts):
        return (upd(img, rows, f_img), upd(lab, rows, f_lab),
                upd(lab_len, rows, f_len), upd(t_step, rows, f_ts))
    return update


class ShardedDeviceStore:
    """Per-DEVICE dataset partitions in HBM: the multi-host residence layout.

    Where :class:`DeviceStore` replicates the whole dataset on every device
    (fine single-process, impossible multi-host — each host owns a
    different sampler stream), this store gives every device its OWN
    ``R``-row partition: block arrays ``[D, R, ...]`` sharded over the
    mesh's data axis, so device ``d`` physically holds only block ``d``,
    and each host uploads only its local devices' partitions (built from
    its local sampler stream). Per step each device gathers its batch
    shard from its own partition by local row id
    (engine/train.py:make_train_step_gather_blocks) — after the one-time
    upload, hosts ship only ``[D, B/D]`` int32 index arrays.

    Sampling semantics are the standard distributed-loader contract, NOT
    the single-stream contract of :class:`DeviceStore` (documented, not
    hidden): 'uniform' draws each device's batch shard from its own
    partition; 'epoch' walks each partition in per-device shuffled order,
    so one global epoch still visits every dataset row exactly once
    (partitions are disjoint).
    """

    layout = 'sharded'

    def __init__(self, images_per_dev: List[List[np.ndarray]],
                 labels_per_dev: List[List[str]], mode: str, seed: int,
                 mesh, flush_every: int = 32, verbose: bool = True):
        import jax
        from jax.sharding import PartitionSpec as P
        assert mode in ('uniform', 'epoch')
        self.mode = mode
        self.mesh = mesh
        self.d_local = len(images_per_dev)
        self.n_dev = int(mesh.size)
        assert self.d_local * jax.process_count() == self.n_dev, (
            'need one row block per device ({} local blocks x {} processes '
            'vs mesh of {})'.format(self.d_local, jax.process_count(),
                                    self.n_dev))
        self.rows = len(images_per_dev[0])
        assert all(len(b) == self.rows for b in images_per_dev), \
            'equal per-device block sizes required (static shapes)'
        # one GLOBAL width bucket: hosts agree via a one-time tiny allgather
        # (their local width maxima can differ)
        w = pick_bucket(max(im.shape[1] for block in images_per_dev
                            for im in block))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            w = int(np.max(multihost_utils.process_allgather(
                np.asarray([w], np.int32))))
        self.w_bucket = w
        blocks = [_pack_rows(imgs, labs, w)
                  for imgs, labs in zip(images_per_dev, labels_per_dev)]
        local = [np.stack([b[j] for b in blocks]) for j in range(4)]
        self.nbytes = sum(a.nbytes for a in local)   # this host's share
        if verbose:
            print('sharded device store: {} rows/device @ bucket {} -> '
                  '{:.1f} MB/host in HBM ({} devices, {} rows globally)'
                  .format(self.rows, w, self.nbytes / 1e6, self.n_dev,
                          self.rows * self.n_dev), flush=True)
        self.img, self.lab, self.lab_len, self.t_step = (
            self._put(a, P('data')) for a in local)
        # per-local-device sampler streams, decorrelated by GLOBAL device id
        base = int(seed)
        first = jax.process_index() * self.d_local
        self._rngs = [np.random.RandomState(base + 7919 * (first + i))
                      for i in range(self.d_local)]
        self._orders: List[Optional[np.ndarray]] = [None] * self.d_local
        self._pos = [0] * self.d_local
        self._flush_every = int(flush_every)
        self._pending: List[List[Tuple[int, np.ndarray, str]]] = [
            [] for _ in range(self.d_local)]

    @property
    def arrays(self):
        return self.img, self.lab, self.lab_len, self.t_step

    # ---- sampling ------------------------------------------------------
    def next_indices(self, global_batch: int, k: int = 1) -> np.ndarray:
        """[k, d_local, B/D] LOCAL row ids for this host's devices."""
        assert global_batch % self.n_dev == 0, \
            'global batch must divide over the mesh'
        b_dev = global_batch // self.n_dev
        out = np.empty((k, self.d_local, b_dev), np.int32)
        for i in range(self.d_local):
            for j in range(k):
                if self.mode == 'uniform':
                    out[j, i] = self._rngs[i].choice(self.rows, size=b_dev,
                                                     replace=False)
                else:
                    if (self._orders[i] is None
                            or self._pos[i] + b_dev > self.rows):
                        self._orders[i] = self._rngs[i].permutation(self.rows)
                        self._pos[i] = 0
                    out[j, i] = self._orders[i][
                        self._pos[i]:self._pos[i] + b_dev]
                    self._pos[i] += b_dev
        return out

    def _put(self, local: np.ndarray, spec) -> 'jax.Array':
        import jax
        from jax.sharding import NamedSharding
        sh = NamedSharding(self.mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, local)
        return jax.device_put(local, sh)

    def step_indices(self, global_batch: int):
        """Global [D, B/D] device array for make_train_step_gather_blocks."""
        from jax.sharding import PartitionSpec as P
        return self._put(self.next_indices(global_batch, 1)[0], P('data'))

    def chunk_indices(self, global_batch: int, k: int):
        """Global [K, D, B/D] array for the K-step chunk program."""
        from jax.sharding import PartitionSpec as P
        return self._put(self.next_indices(global_batch, k),
                         P(None, 'data'))

    # ---- pool-style refresh --------------------------------------------
    def stage_refresh(self, dev: int, row: int, image: np.ndarray,
                      label: str) -> None:
        """Queue a fresh row for local device ``dev``. The row must fit the
        store bucket (the pool feed re-renders oversize rows — truncating
        would cut glyphs off a full label, and skipping would desynchronize
        the per-device pending counts that keep multi-host flushes in
        lockstep: the global jitted scatter needs the SAME number of staged
        rows per device on every host)."""
        if image.shape[1] > self.w_bucket:
            # a real raise, not an assert: under python -O a too-wide row
            # would otherwise surface as an opaque broadcast error deep in
            # the flush, with the pending queue poisoned
            raise ValueError(
                'refresh row wider than the store bucket ({} > {}) — '
                'callers must re-render (PoolShardedFeed.tick)'.format(
                    image.shape[1], self.w_bucket))
        self._pending[dev].append((row, image, label))
        if all(len(p) >= self._flush_every for p in self._pending):
            self.flush_refresh()

    def flush_refresh(self) -> None:
        m = min(len(p) for p in self._pending)
        if m == 0:
            return
        rows = np.stack([
            np.asarray([r for r, _, _ in p[:m]], np.int32)
            for p in self._pending])
        packed = [_pack_rows([im for _, im, _ in p[:m]],
                             [s for _, _, s in p[:m]], self.w_bucket)
                  for p in self._pending]
        self._pending = [p[m:] for p in self._pending]
        from jax.sharding import PartitionSpec as P
        payload = [self._put(np.stack([b[j] for b in packed]), P('data'))
                   for j in range(4)]
        rows_g = self._put(rows, P('data'))
        self.img, self.lab, self.lab_len, self.t_step = \
            _update_blocks_fn(self.mesh)(
                self.img, self.lab, self.lab_len, self.t_step,
                rows_g, *payload)


class _ShardedIndices:
    """Solver-facing index API for sharded-store feeds (the counterpart of
    :class:`_ReplicatedIndices`): delegate to the store's global-array
    builders."""

    layout = 'sharded'

    def step_indices(self, global_batch: int):
        return self.store.step_indices(global_batch)

    def chunk_indices(self, global_batch: int, k: int):
        return self.store.chunk_indices(global_batch, k)


class PoolShardedFeed(_ShardedIndices):
    """Pool backend over the sharded store: this host renders one
    ``rows``-sized partition per LOCAL device from its own RNG streams;
    ``tick`` refreshes cfg.POOL_REFRESH rows per device per step."""

    def __init__(self, mesh, verbose: bool = True):
        import jax
        import random
        from .pool import _render_resized
        n_dev = int(mesh.size)
        d_local = max(1, n_dev // jax.process_count())
        rows = max(1, int(cfg.POOL_SIZE) // n_dev)
        seed = int(cfg.RNG_SEED)
        first = jax.process_index() * d_local
        self._render_rngs = [random.Random(seed + 104729 * (first + i))
                             for i in range(d_local)]
        self._refresh_rngs = [np.random.RandomState(
            seed + 15485863 * (first + i)) for i in range(d_local)]
        if verbose:
            print('rendering {} x {} sharded pool images...'.format(
                d_local, rows), flush=True)
        images, labels = [], []
        for rng in self._render_rngs:
            imgs, labs = [], []
            for _ in range(rows):
                im, lab = _render_resized(rng)
                imgs.append(im)
                labs.append(lab)
            images.append(imgs)
            labels.append(labs)
        self.store = ShardedDeviceStore(images, labels, 'uniform',
                                        seed, mesh, verbose=verbose)

    def tick(self, steps: int = 1) -> None:
        from .pool import _render_resized
        for dev in range(len(self._render_rngs)):
            for _ in range(int(cfg.POOL_REFRESH) * steps):
                row = int(self._refresh_rngs[dev].randint(self.store.rows))
                # oversize rows: re-render, NEVER skip (a skip would break
                # the per-device lockstep multi-host flushes depend on).
                # The bucket is the rounded-up max over thousands of draws
                # from this same distribution, so a miss is rare. If the
                # distribution genuinely outgrew the bucket, stage a BLANK
                # row (empty label — valid CTC data) rather than raising:
                # a unilateral raise on one host would leave its peers
                # blocked forever in the next global collective, which is
                # far harder to diagnose than this loud degradation.
                for _ in range(64):
                    im, lab = _render_resized(self._render_rngs[dev])
                    if im.shape[1] <= self.store.w_bucket:
                        break
                else:
                    print('sharded pool refresh: 64 consecutive renders '
                          'wider than the store bucket {} — staging a '
                          'blank row; the render distribution no longer '
                          'fits the store (rebuild it)'.format(
                              self.store.w_bucket), flush=True)
                    im = np.zeros((int(cfg.IMG_HEIGHT), self.store.w_bucket),
                                  np.uint8)
                    lab = ''
                self.store.stage_refresh(dev, row, im, lab)


class RecordsShardedFeed(_ShardedIndices):
    """Records backend over the sharded store: GLOBAL device ``g`` owns
    dataset rows ``g::n_dev`` (strided partition; the < n_dev remainder
    rows are dropped so blocks stay equal-sized). Each host materializes
    only its local devices' partitions."""

    def __init__(self, ds, mesh, verbose: bool = True):
        import jax
        n_dev = int(mesh.size)
        d_local = max(1, n_dev // jax.process_count())
        rows = len(ds) // n_dev
        if rows == 0:
            raise ValueError('records dataset smaller than the mesh '
                             '({} rows, {} devices)'.format(len(ds), n_dev))
        dropped = len(ds) - rows * n_dev
        if dropped and verbose and jax.process_index() == 0:
            print('sharded store: dropping {} remainder rows '
                  '({} % {} devices)'.format(dropped, len(ds), n_dev))
        first = jax.process_index() * d_local
        images, labels = [], []
        for i in range(d_local):
            g = first + i
            imgs, labs = [], []
            for r in range(rows):
                lab, im = ds.get_at_model_height(g + r * n_dev)
                imgs.append(im)
                labs.append(lab)
            images.append(imgs)
            labels.append(labs)
        self.store = ShardedDeviceStore(images, labels, 'epoch',
                                        int(cfg.RNG_SEED), mesh,
                                        verbose=verbose)

    def tick(self, steps: int = 1) -> None:   # records never refresh
        pass


def _feed_gate(verbose: bool):
    """Shared DATA_DEVICE gate plumbing for both store layouts: the
    (setting, backend) pair plus the decline protocol — 'on' raises with
    the reason, 'auto' prints it (a silent fall-back to host batches costs
    ~2x sustained throughput on a transfer-bound host, PERF.md, which
    nobody should have to diagnose from a speed drop). Returns
    (setting, backend, decline); pair with :func:`_backend_or_decline`
    for the shared backend check."""
    setting = str(cfg.DATA_DEVICE)
    backend = str(cfg.DATA_BACKEND)

    def decline(why):
        if setting == 'on':
            raise ValueError("DATA_DEVICE 'on': " + why)
        if verbose:
            print('DATA_DEVICE auto: using host batches — ' + why,
                  flush=True)
        return None

    return setting, backend, decline


def _backend_or_decline(backend, decline):
    """True when the backend has a fixed dataset to upload; else the loud
    decline (shared wording for both layouts, pinned by
    tests/test_device_store.py::test_auto_gate_declines_loudly)."""
    if backend in ('pool', 'records'):
        return True
    decline("backend '{}' has no fixed dataset to upload (pool|records "
            'only; synth is an unbounded stream)'.format(backend))
    return False


def make_sharded_device_feed(batch_size: int, mesh, verbose: bool = True):
    """The multi-host DATA_DEVICE gate: a sharded per-device store when the
    backend supports it and a per-host share fits, else None (host batches).
    Same loudness contract as :func:`make_device_feed`."""
    import jax
    setting, backend, decline = _feed_gate(verbose)
    if setting == 'off':
        return None
    if not _backend_or_decline(backend, decline):
        return None
    if batch_size % int(mesh.size):
        return decline('global batch {} does not divide over the {}-device '
                       'mesh'.format(batch_size, mesh.size))
    if setting == 'auto':
        est_mb = estimate_store_mb(backend) / jax.process_count()
        if est_mb > float(cfg.DATA_DEVICE_MAX_MB):
            return decline(
                'estimated per-host store share {:.0f} MB exceeds '
                'DATA_DEVICE_MAX_MB={}'.format(est_mb, cfg.DATA_DEVICE_MAX_MB))
    if backend == 'records':
        from .records import RecordsDataset
        ds = RecordsDataset(str(cfg.RECORDS_PATH),
                            cache_resized=bool(cfg.RECORDS_CACHE_RESIZED))
        if verbose:
            print('records backend (sharded device store): {} examples '
                  'from {}'.format(len(ds), cfg.RECORDS_PATH))
        feed = RecordsShardedFeed(ds, mesh, verbose=verbose)
        ds.close()
        return feed
    return PoolShardedFeed(mesh, verbose=verbose)


def estimate_store_mb(backend: str) -> float:
    """Cheap pre-build size estimate for the 'auto' gate."""
    l_max = max_label_len()
    feat = int(cfg.NUM_FEATURES)
    if backend == 'records':
        from .records import RecordsDataset
        ds = RecordsDataset(str(cfg.RECORDS_PATH), cache_resized=False)
        n = len(ds)
        # sample a few rows for the width scale (resize preserves aspect)
        ws = []
        for i in range(0, n, max(1, n // 64)):
            _, im = ds.get(i)
            ws.append(im.shape[1] * int(cfg.IMG_HEIGHT) / im.shape[0])
        ds.close()
        w_bucket = pick_bucket(int(max(ws)) + 4)
    else:
        n = int(cfg.POOL_SIZE)
        w_bucket = int(cfg.BUCKETS[-1])           # conservative
    return n * (w_bucket * feat + 4 * l_max + 8) / 1e6


def make_device_feed(batch_size: int, verbose: bool = True, mesh=None):
    """The cfg.DATA_DEVICE gate: a PoolDeviceFeed/RecordsDeviceFeed when the
    backend supports device residence and fits, else None (host batches).

    With ``mesh`` the store is replicated across the DP mesh and the
    caller must use the parallel gather steps
    (parallel/mesh.py:make_parallel_train_step_gather) — index arrays are
    GLOBAL-batch rows, sharded by the step's in_shardings. Without a mesh
    the store lives on the default device — the one the un-annotated jit
    step runs on — so single-device training on a multi-device host
    (PARALLEL='off') qualifies too. Single-process only: multi-host runs
    take the sharded per-host layout (make_sharded_device_feed) via the
    solver, not this gate.

    'auto' requires: backend in (pool, records), one process, and an
    estimated per-replica store under cfg.DATA_DEVICE_MAX_MB. A declined
    'auto' says WHICH gate declined — silently falling back to host
    batches costs ~3x sustained throughput on a transfer-bound host
    (PERF.md), which nobody should have to diagnose from a speed drop.
    """
    import jax
    setting, backend, decline = _feed_gate(verbose)
    if setting == 'off':
        return None
    if not _backend_or_decline(backend, decline):
        return None
    if jax.process_count() > 1:
        return decline(
            'multi-host run ({} processes) — the solver uses the sharded '
            'per-host store instead'.format(jax.process_count()))
    if setting == 'auto':
        est_mb = estimate_store_mb(backend)
        if est_mb > float(cfg.DATA_DEVICE_MAX_MB):
            return decline(
                'estimated store {:.0f} MB exceeds DATA_DEVICE_MAX_MB={} '
                '(raise the cap or set DATA_DEVICE on to force)'.format(
                    est_mb, cfg.DATA_DEVICE_MAX_MB))
    seed = int(cfg.RNG_SEED) + 100003 * jax.process_index()
    if backend == 'records':
        from .records import RecordsDataset
        ds = RecordsDataset(str(cfg.RECORDS_PATH),
                            cache_resized=bool(cfg.RECORDS_CACHE_RESIZED))
        if verbose:
            print('records backend (device-resident): {} examples from {}'
                  .format(len(ds), cfg.RECORDS_PATH))
        feed = RecordsDeviceFeed(ds, seed=seed, verbose=verbose, mesh=mesh)
        ds.close()
        return feed
    from .pool import PoolSampler
    pool = PoolSampler(int(cfg.POOL_SIZE), seed=seed, verbose=verbose)
    return PoolDeviceFeed(pool, verbose=verbose, mesh=mesh)
