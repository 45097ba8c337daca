"""Serving export: freeze the decode path into standalone StableHLO artifacts.

The reference has no deployment story beyond a TF1 checkpoint + the eval
script (/root/reference/lib/lstm/test.py); a TPU-native framework's serving
artifact is a serialized, ahead-of-time-lowered XLA program. This module
freezes the trained params INTO the program (jax.export closes over them as
constants) and emits one artifact per width bucket — the same static-shape
discipline as training, so a server never recompiles.

* Exported programs are multi-platform (CPU + TPU) by default: lowering is
  platform-retargetable StableHLO; compilation happens at load time on
  whatever backend the serving host has.
* The LSTM runs through the portable lax.scan path inside the artifact
  (``LSTM_IMPL='jax'``): Pallas kernels are Mosaic-lowered for a specific
  TPU generation, which would pin the artifact to the exporting host's
  hardware. Decode throughput is conv-dominated, so this is cheap —
  measured at +1.3% end-to-end decode latency for the frozen artifact vs
  the live Pallas path (PERF.md "Frozen serving artifact vs live decode";
  ``tools/bench_decode.py --frozen``) — and buys a hardware-agnostic
  artifact.
* ``ExportedDecoder`` is the loader: manifest + per-bucket programs, with
  the same preprocessing contract as eval (engine/test.py:prepare_single).
* Inherited reference quirk: under the default ``BN_EVAL: batch`` BN uses
  batch statistics even in the test graph (network.py:176-178), so decoded
  output can vary slightly with batch composition — exactly as the
  reference's own eval does. Two composition-independent options: export
  with ``batch=1`` (costs serving throughput), or export under
  ``BN_EVAL: moving`` with a checkpoint that carries moving statistics
  (train-step EMA or tools/calibrate_bn.py) — the frozen artifact then
  normalizes with constants and batching is free.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np

from ..config import cfg

MANIFEST = 'manifest.json'


def _artifact_name(width: int) -> str:
    return 'decode_w{}.stablehlo'.format(width)


def export_decoder(net, params, out_dir: str,
                   buckets: Sequence[int] | None = None,
                   batch: int | None = None,
                   platforms: Sequence[str] = ('cpu', 'tpu'),
                   bn_state=None) -> Dict:
    """Write per-bucket frozen decode programs + manifest; returns manifest.

    ``bn_state`` (moving BN statistics) freezes into the program alongside
    the params when ``cfg.BN_EVAL == 'moving'`` — the artifact then decodes
    batch-composition independently at any batch size."""
    import jax
    from jax import export as jexport
    from .train import make_decode_step

    buckets = sorted(int(b) for b in (buckets or cfg.BUCKETS))
    batch = int(batch or cfg.TEST.BATCH_SIZE)
    os.makedirs(out_dir, exist_ok=True)
    if str(cfg.BN_EVAL) == 'moving' and not bn_state:
        raise ValueError('BN_EVAL=moving export requires bn_state '
                         '(restore a bn_state-bearing checkpoint or run '
                         'tools/calibrate_bn.py)')
    bn_state = bn_state or {}

    old_impl = str(cfg.LSTM_IMPL)
    cfg.LSTM_IMPL = 'jax'          # portable artifact (see module docstring)
    try:
        from .train import compute_dtype
        decode_step = make_decode_step(net, compute_dtype())

        def frozen(image, time_step):
            return decode_step(params, bn_state, image, time_step)

        import jax.numpy as jnp
        for w in buckets:
            spec_img = jax.ShapeDtypeStruct((batch, w, int(cfg.NUM_FEATURES)),
                                            jnp.float32)
            spec_ts = jax.ShapeDtypeStruct((batch,), jnp.int32)
            exp = jexport.export(jax.jit(frozen),
                                 platforms=tuple(platforms))(spec_img, spec_ts)
            with open(os.path.join(out_dir, _artifact_name(w)), 'wb') as f:
                f.write(exp.serialize())
    finally:
        cfg.LSTM_IMPL = old_impl

    manifest = {
        'buckets': buckets,
        'batch': batch,
        'platforms': list(platforms),
        'charset': str(cfg.CHARSET),
        'nclasses': int(cfg.NCLASSES),
        'decoder': str(cfg.DECODER),
        'img_height': int(cfg.IMG_HEIGHT),
        'num_features': int(cfg.NUM_FEATURES),
        'pool_scale': int(cfg.POOL_SCALE),
        'offset_time_step': int(cfg.OFFSET_TIME_STEP),
        'bn_eval': str(cfg.BN_EVAL),
    }
    with open(os.path.join(out_dir, MANIFEST), 'w') as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedDecoder:
    """Load an export_decoder() directory and serve decode requests.

    ``decode_images(imgs)`` takes grayscale uint8/float arrays of any width
    (height anything — resized to the manifest height) and returns decoded
    strings, batching per width bucket exactly like eval."""

    def __init__(self, export_dir: str):
        from jax import export as jexport
        with open(os.path.join(export_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.manifest['buckets'] = sorted(
            int(b) for b in self.manifest['buckets'])
        self._programs = {}
        for w in self.manifest['buckets']:
            path = os.path.join(export_dir, _artifact_name(w))
            with open(path, 'rb') as f:
                self._programs[int(w)] = jexport.deserialize(f.read())
        # charset comes from the MANIFEST, not the loading process's cfg —
        # the artifact must decode correctly in a process that never loaded
        # the training config (standalone contract)
        self._decode_maps = {0: ''}
        for i, c in enumerate(self.manifest['charset'], 1):
            self._decode_maps[i] = c

    def _pick_bucket(self, width: int) -> int:
        for b in self.manifest['buckets']:
            if b >= width:
                return int(b)
        raise ValueError('image width {} exceeds largest exported bucket {}'
                         .format(width, self.manifest['buckets'][-1]))

    def _prepare(self, img: np.ndarray):
        from .test import preprocess_image
        m = self.manifest
        img = np.asarray(img)
        if np.issubdtype(img.dtype, np.floating):
            # floats are 0..1 normalized by contract; 0..255-scale floats
            # are clipped (never wrapped) as a convenience
            img = np.clip(img, 0, 1) * 255 if img.max() <= 1.0 \
                else np.clip(img, 0, 255)
        img = img.astype(np.uint8)
        out, ts = preprocess_image(
            img, img_height=m['img_height'], num_features=m['num_features'],
            pool_scale=m['pool_scale'],
            offset_time_step=m['offset_time_step'], pick=self._pick_bucket)
        return out.shape[0], out, ts

    def decode_ids_array(self, ids: np.ndarray) -> str:
        from .test import decode_ids
        return decode_ids(ids, self._decode_maps)

    def decode_images(self, imgs: List[np.ndarray]) -> List[str]:
        import jax.numpy as jnp
        batch = int(self.manifest['batch'])
        prepared = [self._prepare(im) for im in imgs]
        results: List[str] = [''] * len(imgs)
        by_bucket: Dict[int, List[int]] = {}
        for i, (bucket, _, _) in enumerate(prepared):
            by_bucket.setdefault(bucket, []).append(i)
        for bucket, idxs in sorted(by_bucket.items()):
            prog = self._programs[bucket]
            for start in range(0, len(idxs), batch):
                chunk = idxs[start:start + batch]
                pad = batch - len(chunk)
                images = np.stack([prepared[i][1] for i in chunk]
                                  + [prepared[chunk[-1]][1]] * pad)
                steps = np.array([prepared[i][2] for i in chunk]
                                 + [prepared[chunk[-1]][2]] * pad, np.int32)
                dec = np.asarray(prog.call(jnp.asarray(images),
                                           jnp.asarray(steps)))
                for i, ids in zip(chunk, dec):
                    results[i] = self.decode_ids_array(ids)
        return results
