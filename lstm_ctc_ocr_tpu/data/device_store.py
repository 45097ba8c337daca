"""Device-resident dataset: the pool/records backends living in HBM.

Measured on this host (PERF.md "Sustained end-to-end"), the training loop
is host->device *bandwidth*-bound: every step ships a full image batch
over the TPU link (786 KB/step at batch 256 even in the uint8 wire
format), capping sustained throughput at ~68% of the device step rate.
The fixed-size backends make that transfer unnecessary: a 20k-image pool
is ~80 MB as uint8, a 100k-example records dataset ~400 MB — both a
rounding error in 16 GB of HBM.

So: upload the whole dataset ONCE as raw uint8 (padded to one width
bucket), and per step send only the sampled row indices (1 KB vs 786 KB,
a ~700x cut); the jitted train step gathers its batch on device
(engine/train.py:make_train_step_gather). Pool refresh still renders
fresh images on the host, but they accumulate in a buffer that flushes
through a donated in-place row update every ~32 rows instead of riding
every batch. With the per-step payload gone, TRAIN.STEPS_PER_DISPATCH
finally pays: the K-step lax.scan program amortizes the dispatch
round-trip with nothing left to transfer.

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

Enabled by ``cfg.DATA_DEVICE`` ('auto' uses it for pool/records in
single-process runs — single device or a DP mesh, where the store is
replicated per device — when a replica fits ``cfg.DATA_DEVICE_MAX_MB``).
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


class PoolDeviceFeed:
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


class RecordsDeviceFeed:
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
    setting = str(cfg.DATA_DEVICE)
    backend = str(cfg.DATA_BACKEND)
    if setting == 'off':
        return None

    def decline(why):
        if setting == 'on':
            raise ValueError("DATA_DEVICE 'on': " + why)
        if verbose:
            print('DATA_DEVICE auto: using host batches — ' + why,
                  flush=True)
        return None

    if backend not in ('pool', 'records'):
        return decline(
            "backend '{}' has no fixed dataset to upload (pool|records "
            'only; synth is an unbounded stream)'.format(backend))
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
