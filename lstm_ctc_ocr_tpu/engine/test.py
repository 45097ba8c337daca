"""Evaluation driver: decode a directory of labeled images.

Role-equivalent of the reference SolverWrapper.test_model/test_net
(/root/reference/lib/lstm/test.py:27-101): restore the latest checkpoint
from the output dir, then for every image file — grayscale read, width
right-padded to a multiple of POOL_SCALE and /255 (test.py:61-70), decode
with the configured CTC decoder, parse the ground truth from the
``{idx}_{label}.png`` filename (test.py:82), report per-image latency and
exact-match accuracy (test.py:84-88).

TPU-first differences (documented, deliberate):
* images are padded to a width *bucket* so XLA compiles a handful of
  programs instead of one per distinct width, and eval can batch;
* time_step = W//4 - 1, consistent with training (the reference uses W//4
  at eval, an off-by-one vs its own training batcher — gen.py:54 vs
  test.py:74 — that TF's decoder tolerates only incidentally);
* decoder is greedy or beam per ``cfg.DECODER`` (the reference hardwires
  beam search, test.py:30).
"""

from __future__ import annotations

import math
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cfg, get_encode_decode_dict
from ..data.gen import pick_bucket
from ..utils.timer import Timer
from . import checkpoint
from .train import compute_dtype, make_decode_step


def decode_ids(nums, decode_maps=None, ignore=0) -> str:
    """Ids -> string; out-of-charset ids (possible when NCLASSES > charset,
    e.g. the reference's 64-class head over 62 chars) decode to ''."""
    if decode_maps is None:
        _, decode_maps = get_encode_decode_dict()
    return ''.join(decode_maps.get(int(i), '') for i in np.asarray(nums).ravel()
                   if int(i) != ignore)


def load_image(path: str) -> np.ndarray:
    import cv2
    flag = 0 if cfg.NCHANNELS == 1 else 1
    img = cv2.imread(path, flag)
    if img is None:
        raise IOError('cannot read image: {}'.format(path))
    return img


def preprocess_image(img: np.ndarray, *, img_height: int, num_features: int,
                     pool_scale: int, offset_time_step: int, pick):
    """The eval preprocessing contract as a pure function (reference
    test.py:61-70): resize to ``img_height``, right-pad the width to
    ``pick(w)``, /255, width-major features. Parameterized so the serving
    loader (engine/serve.py) runs the IDENTICAL code driven by its manifest
    instead of live cfg. Returns ([W_pad, num_features] float32, time_step).
    """
    import cv2
    h, w = img.shape[:2]
    if h != img_height:
        w = int(img_height / h * w)
        img = cv2.resize(img, (w, img_height))
    width = pick(w)
    out = np.zeros((width, num_features), np.float32)
    out[:w] = (img.astype(np.float32) / 255.0).swapaxes(0, 1).reshape(w, -1)
    return out, w // pool_scale + offset_time_step


def prepare_single(img: np.ndarray, bucketed: bool = True):
    """Reference test.py:61-70 preprocessing, with optional bucket padding.

    Returns (image [1, W_pad, 32] float32, time_step [1] int32).
    Eval-time images are resized to height IMG_HEIGHT first when needed
    (offline datasets are rendered at height 60 like the generator's input).
    """
    if bucketed:
        pick = pick_bucket
    else:
        def pick(w):
            return math.ceil(w / cfg.POOL_SCALE) * cfg.POOL_SCALE
    out, ts = preprocess_image(
        img, img_height=int(cfg.IMG_HEIGHT),
        num_features=int(cfg.NUM_FEATURES), pool_scale=int(cfg.POOL_SCALE),
        offset_time_step=int(cfg.OFFSET_TIME_STEP), pick=pick)
    return out[None], np.array([ts], np.int32)


class SolverWrapper:
    def __init__(self, network, imgdb, output_dir, logdir, pretrained_model=None):
        self.net = network
        self.imgdb = imgdb
        self.output_dir = output_dir
        self.pretrained_model = pretrained_model

    def test_model(self, testDir=None, restore=True):
        from .train import enable_persistent_compile_cache
        enable_persistent_compile_cache()
        dtype = compute_dtype()
        n, w0 = 1, int(cfg.BUCKETS[0])
        params = self.net.init_params(
            jax.random.PRNGKey(cfg.RNG_SEED),
            {'data': (n, w0, cfg.NUM_FEATURES), 'time_step_len': (n,)})
        bn_state = self.net.init_bn_state()
        use_moving = str(cfg.BN_EVAL) == 'moving' and bn_state
        if restore:
            # training snapshots first, else the shipped release weights
            # (checkpoints/<EXP_DIR>/, tracked in git)
            found = checkpoint.latest_eval_checkpoint(self.output_dir)
            if found is None:
                raise RuntimeError(
                    'no checkpoint found in {} (nor released weights in {})'
                    .format(self.output_dir,
                            checkpoint.release_dir(self.output_dir)))
            path, step = found
            print('Restoring from {}...'.format(path), end=' ')
            # extra flat keys (opt_state/...) in the snapshot are ignored
            if use_moving:
                # BN_EVAL='moving' needs the checkpoint's moving statistics;
                # loud failure beats silently evaluating with init stats
                if not checkpoint.has_keys_under(path, 'bn_state'):
                    raise RuntimeError(
                        'BN_EVAL=moving but {} has no bn_state (pre-BN_EVAL '
                        'snapshot or release) — estimate it post-hoc with '
                        'tools/calibrate_bn.py, or eval with BN_EVAL=batch'
                        .format(path))
                state = checkpoint.restore(
                    {'params': params, 'bn_state': bn_state}, path)
                params, bn_state = state['params'], state['bn_state']
            else:
                params = checkpoint.restore({'params': params}, path)['params']
            print('done (step {})'.format(step))
        _, decode_maps = get_encode_decode_dict()
        from ..data.records import parse_label_from_filename
        all_entries = sorted(os.listdir(testDir))
        files = [f for f in all_entries
                 if parse_label_from_filename(f) is not None]
        skipped = len(all_entries) - len(files)
        if skipped:
            # a stray labels.txt/.DS_Store/subdir must not abort an eval
            # run (the batched path would die in the up-front grouping
            # scan before producing any results)
            print('skipping {} non-dataset entries in {}'.format(
                skipped, testDir))
        batch = int(cfg.TEST.BATCH_SIZE)

        # like training (train.py:_select_mesh), batched eval scales over
        # every visible chip: DP mesh when the batch splits evenly
        mesh = None
        if batch > 1 and str(cfg.PARALLEL) != 'off':
            nd = len(jax.devices())
            while nd > 1 and batch % nd:
                nd -= 1
            if nd > 1:
                from ..parallel import mesh as pmesh
                mesh = pmesh.make_mesh(nd)
                print('eval DP mesh over {} device(s)'.format(mesh.size))

        # restore() returns host numpy arrays; push the pytree to the device
        # once — otherwise EVERY decode call re-transfers all ~7M params
        # (hundreds of leaves), which through the TPU tunnel costs seconds
        # per batch and dominated eval wall time
        if mesh is not None:
            from ..parallel import mesh as pmesh
            params = jax.device_put(params, pmesh.replicated(mesh))
            bn_state = jax.device_put(bn_state, pmesh.replicated(mesh))
            decode_step = pmesh.make_parallel_decode_step(
                self.net, dtype, mesh)

            def put(*arrays):
                return pmesh.shard_batch(mesh, *arrays)
        else:
            params = jax.device_put(params)
            bn_state = jax.device_put(bn_state)
            decode_step = make_decode_step(self.net, dtype)

            def put(*arrays):
                return tuple(jnp.asarray(a) for a in arrays)

        if batch > 1:
            return self._test_batched(decode_step, params, bn_state,
                                      decode_maps, testDir, files, batch, put)

        timer = Timer()
        total = correct = 0
        latencies: List[float] = []
        import time as _time
        for fname in files:
            timer.tic()
            total += 1
            img = load_image(os.path.join(testDir, fname))
            image, time_step = prepare_single(img)
            td = _time.perf_counter()
            res_ids = np.asarray(decode_step(params, bn_state,
                                             jnp.asarray(image),
                                             jnp.asarray(time_step)))[0]
            # p50 counts the DECODE only, same definition as the batched
            # path; the printed per-file cost stays whole-body like the
            # reference's Timer (test.py:58,85-86)
            latencies.append(_time.perf_counter() - td)
            res = decode_ids(res_ids, decode_maps)
            org = fname.split('.')[0].split('_')[1]
            if org == res:
                correct += 1
            diff = timer.toc(average=False)
            print('{} cost time: {:.3f},\n    res: {}'.format(fname, diff, res))
        acc = correct / max(total, 1)
        p50 = float(np.percentile(latencies, 50)) if latencies else 0.0
        print('total acc:{}/{}={:.4f}'.format(correct, total, acc))
        print('p50 decode latency: {:.4f}s'.format(p50))
        return acc, p50

    def _test_batched(self, decode_step, params, bn_state, decode_maps,
                      testDir, files, batch, put):
        """Throughput eval: images grouped by width bucket, decoded in
        fixed-shape batches (TPU-first addition; cfg.TEST.BATCH_SIZE > 1).
        The reference evaluates strictly one image at a time
        (test.py:57-77). Returns ``(accuracy, p50)`` like the batch-1 path,
        with p50 the per-image share of each batch's decode wall time;
        amortized throughput is printed alongside.

        Only filenames are grouped up front; pixels are loaded per chunk so
        memory stays O(batch), not O(dataset).
        """
        import time as _time
        from PIL import Image
        by_bucket: Dict[int, List[str]] = {}
        for fname in files:
            # header-only read: grouping needs just the size, not the pixels
            # (close the handle — the lazy open would leak one fd per image)
            with Image.open(os.path.join(testDir, fname)) as im:
                w, h = im.size
            if h != cfg.IMG_HEIGHT:
                w = int(cfg.IMG_HEIGHT / h * w)
            by_bucket.setdefault(pick_bucket(w), []).append(fname)

        total = correct = 0
        latencies: List[float] = []
        chunk_times: List[tuple] = []   # (n_images, decode_seconds, is_warm)
        t0 = _time.perf_counter()
        for width, names in sorted(by_bucket.items()):
            bucket_first = True         # each bucket's first call compiles
            for i in range(0, len(names), batch):
                chunk = names[i:i + batch]
                loaded = []
                for fname in chunk:
                    img = load_image(os.path.join(testDir, fname))
                    image, time_step = prepare_single(img)
                    loaded.append((image[0], int(time_step[0])))
                pad = batch - len(loaded)          # static batch per bucket
                images = np.stack([x[0] for x in loaded]
                                  + [loaded[-1][0]] * pad)
                steps = np.array([x[1] for x in loaded]
                                 + [loaded[-1][1]] * pad, np.int32)
                tb = _time.perf_counter()
                dec = np.asarray(decode_step(params, bn_state,
                                             *put(images, steps)))
                decode_secs = _time.perf_counter() - tb
                chunk_times.append((len(chunk), decode_secs,
                                    not bucket_first))
                bucket_first = False
                if os.environ.get('LSTM_EVAL_DEBUG'):
                    print('chunk decode: {:.3f}s'.format(decode_secs),
                          flush=True)
                # amortized: the device computes the full padded batch
                # regardless of how many rows are real
                per_image = decode_secs / batch
                latencies.extend([per_image] * len(chunk))
                for fname, ids in zip(chunk, dec):
                    total += 1
                    res = decode_ids(ids, decode_maps)
                    org = fname.split('.')[0].split('_')[1]
                    correct += int(org == res)
                    print('{}    res: {}'.format(fname, res))
        dt = _time.perf_counter() - t0
        acc = correct / max(total, 1)
        p50 = float(np.percentile(latencies, 50)) if latencies else 0.0
        ips = total / dt if dt > 0 else 0.0
        print('total acc:{}/{}={:.4f}'.format(correct, total, acc))
        print('p50 decode latency: {:.4f}s (amortized, batch {})'.format(
            p50, batch))
        print('batched decode: {:.1f} images/sec total'.format(ips))
        # EACH BUCKET's first decode call carries an XLA compilation (and,
        # over the axon tunnel, an intermittent multi-minute first-dispatch
        # stall); the steady-state rate over the warm chunks is what
        # repeated/serving eval actually sustains
        warm = [(k, s) for k, s, is_warm in chunk_times if is_warm]
        if warm:
            warm_n = sum(k for k, _ in warm)
            warm_dt = sum(s for _, s in warm)
            if warm_dt > 0:
                print('batched decode: {:.1f} images/sec steady-state '
                      '(excl. each bucket\'s compile call)'.format(
                          warm_n / warm_dt))
        return acc, p50


def test_net(network, imgdb, testDir, output_dir, log_dir,
             pretrained_model=None, restore=True):
    """Entry point mirroring reference test.py:91-100."""
    sw = SolverWrapper(network, imgdb, output_dir, log_dir,
                       pretrained_model=pretrained_model)
    print('Solving...')
    result = sw.test_model(testDir=testDir, restore=restore)
    print('done solving')
    return result
