"""Step-numbered checkpoints with restore-latest-and-resume semantics.

Contract mirrors the reference Saver flow (lib/lstm/train.py:18,23-37,96-106):
snapshots named ``{SNAPSHOT_PREFIX}_ctc{_INFIX}_iter_{step}.ckpt.npz`` in
``output/<EXP_DIR>/``, resume picks the checkpoint with the highest step
parsed from the filename and returns that step (the reference parses the
filename too, train.py:101-102). Old snapshots are kept (Saver
max_to_keep=100 -> we keep ``max_to_keep`` newest).

Storage is a flat .npz: pytree leaves keyed by their tree path — portable,
dependency-free, and convertible to a plain ``.npy`` dict
(tools/convert_ckpt2npy.py, the reference's lib/utils/convert_ckpt2npy.py).

Consciously fixed reference quirk: low-loss snapshots were saved as
``iter_2`` (train.py:142), corrupting filename-parsed resume; we always
save the true step.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..config import cfg


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, 'key'):
            parts.append(str(p.key))
        elif hasattr(p, 'idx'):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return '/'.join(parts)


def flatten_state(state) -> Dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    return {_path_str(path): np.asarray(leaf) for path, leaf in leaves}


def unflatten_like(template, flat: Dict[str, np.ndarray],
                   allow_missing_prefixes: Tuple[str, ...] = ()):
    """Rebuild a pytree like ``template`` from flat path-keyed arrays.

    Keys absent from ``flat`` raise, EXCEPT under ``allow_missing_prefixes``
    (path-prefix match), where the template's own leaf is kept — the
    backward-compat path for state added after a checkpoint was written
    (e.g. ``bn_state`` on pre-BN_EVAL snapshots)."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    missing_allowed = []
    for path, leaf in paths_leaves:
        key = _path_str(path)
        if key not in flat:
            if any(key == p or key.startswith(p + '/')
                   for p in allow_missing_prefixes):
                missing_allowed.append(key)
                new_leaves.append(np.asarray(leaf))
                continue
            raise KeyError('checkpoint missing parameter: {}'.format(key))
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError('shape mismatch for {}: ckpt {} vs model {}'
                             .format(key, arr.shape, np.shape(leaf)))
        # released checkpoints store float leaves in f16 (save_release);
        # the model template's dtype wins so compute dtypes are unchanged
        want = np.asarray(leaf).dtype
        if arr.dtype != want and np.issubdtype(arr.dtype, np.floating) \
                and np.issubdtype(want, np.floating):
            arr = arr.astype(want)
        new_leaves.append(arr)
    if missing_allowed:
        print('checkpoint predates {} key(s) under {}; keeping fresh '
              'initial values'.format(len(missing_allowed),
                                      sorted(allow_missing_prefixes)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def snapshot_name(step: int) -> str:
    infix = ('_' + cfg.TRAIN.SNAPSHOT_INFIX) if cfg.TRAIN.SNAPSHOT_INFIX else ''
    return '{}_ctc{}_iter_{:d}.ckpt.npz'.format(
        cfg.TRAIN.SNAPSHOT_PREFIX, infix, step)


_CKPT_RE = re.compile(r'_iter_(\d+)\.ckpt\.npz$')


def save(state, output_dir: str, step: int, max_to_keep: int = 100,
         keep_every: int = 0) -> str:
    os.makedirs(output_dir, exist_ok=True)
    fname = os.path.join(output_dir, snapshot_name(step))
    flat = flatten_state(state)
    tmp = fname + '.tmp'
    with open(tmp, 'wb') as f:
        np.savez(f, **flat)
    os.replace(tmp, fname)
    # prune beyond max_to_keep (Saver parity, train.py:18) — but only OUR
    # family of snapshots: a second experiment sharing output_dir under a
    # different SNAPSHOT_PREFIX/INFIX must not have its files deleted.
    # ``keep_every`` (the solver passes SNAPSHOT_ITERS) exempts on-cadence
    # snapshots from pruning: near convergence the low-loss trigger
    # (train.py:139-144 parity) can fire every few steps, and without the
    # exemption its spam evicts the periodic history — a 4k-iter-old
    # checkpoint you wanted to resume from silently disappears.
    ckpts = sorted(list_checkpoints(output_dir, current_only=True),
                   key=lambda x: x[1])
    prunable = [c for c in ckpts
                if not (keep_every and c[1] % keep_every == 0)]
    n_spare = max_to_keep - (len(ckpts) - len(prunable))
    for path, _ in prunable[:-n_spare] if max_to_keep and n_spare > 0 \
            else (prunable if max_to_keep else []):
        try:
            os.remove(path)
        except OSError:
            pass
    return fname


def list_checkpoints(output_dir: str, current_only: bool = False):
    """(path, step) pairs; ``current_only`` restricts to the configured
    SNAPSHOT_PREFIX/INFIX family (restore stays permissive like
    tf.train.latest_checkpoint's directory scan)."""
    pattern = _CKPT_RE
    if current_only:
        stem = re.escape(snapshot_name(0)[:-len('0.ckpt.npz')])
        pattern = re.compile('^' + stem + r'(\d+)\.ckpt\.npz$')
    out = []
    if not os.path.isdir(output_dir):
        return out
    for f in os.listdir(output_dir):
        m = pattern.search(f)
        if m:
            out.append((os.path.join(output_dir, f), int(m.group(1))))
    return out


def latest_checkpoint(output_dir: str) -> Optional[Tuple[str, int]]:
    ckpts = list_checkpoints(output_dir)
    if not ckpts:
        return None
    return max(ckpts, key=lambda x: x[1])


def restore(template, path: str, allow_missing_prefixes: Tuple[str, ...] = ()):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_like(template, flat, allow_missing_prefixes)


def has_keys_under(path: str, prefix: str) -> bool:
    """True if the .npz at ``path`` stores any leaf under ``prefix/``
    (e.g. 'bn_state' — written by BN_EVAL-era snapshots and
    tools/calibrate_bn.py-augmented releases)."""
    with np.load(path) as data:
        return any(k == prefix or k.startswith(prefix + '/')
                   for k in data.files)


def load_npy_pretrained(params, path: str, ignore_missing: bool = False):
    """Load a ``{layer: {param: ndarray}}`` .npy dict into a params pytree.

    Parity with ``Network.load`` (reference network.py:50-63): per-layer
    per-variable assignment, unknown layers/params raise unless
    ``ignore_missing``. The dict format is what tools/convert_ckpt2npy.py
    writes (the reference's converter format).
    """
    d = np.load(path, allow_pickle=True).item()
    params = jax.tree.map(lambda x: x, params)       # fresh tree containers

    def assign(dst, src, prefix):
        for name, val in src.items():
            where = prefix + '/' + name if prefix else name
            # list-valued nodes (e.g. the stacked `lstm` layer's cells,
            # layers.py:154) round-trip through the converter as digit keys
            if isinstance(dst, (list, tuple)) and str(name).isdigit():
                idx = int(name)
                if idx >= len(dst):
                    if ignore_missing:
                        continue
                    raise KeyError(
                        'pretrained var not in model: {}'.format(where))
                if isinstance(val, dict):
                    assign(dst[idx], val, where)
                    continue
            missing = not (hasattr(dst, '__contains__') and name in dst)
            if missing:
                if ignore_missing:
                    continue
                raise KeyError('pretrained var not in model: {}'.format(where))
            if isinstance(val, dict):
                assign(dst[name], val, where)
                continue
            cur = dst[name]
            if tuple(np.shape(cur)) != tuple(np.shape(val)):
                # reference Network.load catches the assign ValueError and
                # skips the tensor under ignore_missing (network.py:57-63) —
                # e.g. migrating weights with a different NCLASSES head
                if ignore_missing:
                    print('skipping {}: ckpt shape {} vs model {}'.format(
                        where, np.shape(val), np.shape(cur)))
                    continue
                raise ValueError('shape mismatch for {}: {} vs {}'.format(
                    where, np.shape(val), np.shape(cur)))
            dst[name] = np.asarray(val)

    assign(params, d, '')
    return params


def restore_latest(template, output_dir: str,
                   allow_missing_prefixes: Tuple[str, ...] = ()):
    """Returns (state, step) from the newest snapshot, or (None, 0)."""
    found = latest_checkpoint(output_dir)
    if found is None:
        return None, 0
    path, step = found
    return restore(template, path, allow_missing_prefixes), step


# --- released (shipped) checkpoints ------------------------------------------
#
# Training snapshots live in output/<EXP_DIR>/ (a runtime artifact dir,
# .gitignored like the reference's output/). Released weights — the
# params-only checkpoints backing the README results table — live in
# checkpoints/<EXP_DIR>/ and ARE tracked in git, so a fresh clone can run
# ./test.sh against the shipped models without retraining. Eval and export
# fall back to the release dir when output/ has no snapshot; training
# resume deliberately does not (a release has no optimizer state — use
# --pre_train for warm starts).

def release_dir(output_dir: str) -> str:
    """checkpoints/<EXP_DIR> sibling of an output/<EXP_DIR> directory."""
    parent, exp = os.path.split(os.path.normpath(output_dir))
    root = os.path.dirname(parent) if os.path.basename(parent) == 'output' \
        else parent
    return os.path.join(root, 'checkpoints', exp)


def latest_eval_checkpoint(output_dir: str) -> Optional[Tuple[str, int]]:
    """Newest snapshot for EVAL: output/<EXP_DIR>/ first, else the tracked
    release in checkpoints/<EXP_DIR>/."""
    found = latest_checkpoint(output_dir)
    if found is None:
        found = latest_checkpoint(release_dir(output_dir))
    return found


def save_release(params, output_dir: str, step: int,
                 dtype: str = 'float16', bn_state=None) -> str:
    """Write a params-only release checkpoint to checkpoints/<EXP_DIR>/.

    Float leaves are stored in ``dtype`` (default f16 — halves the tracked
    size; weights of this model fit f16's range and eval accuracy is
    unchanged, which tools/release_ckpt.py verifies by re-evaluating the
    released file). Leaves whose magnitude exceeds f16 range stay f32.
    ``bn_state`` (moving BN statistics), when given, ships inside the same
    file so the release supports ``BN_EVAL: moving`` eval.
    """
    rel_dir = release_dir(output_dir)
    os.makedirs(rel_dir, exist_ok=True)
    state = {'params': params}
    if bn_state:
        state['bn_state'] = bn_state
    flat = flatten_state(state)
    out = {}
    for k, v in flat.items():
        # bn_state stays f32: the moving variances feed rsqrt(var + 1e-3)
        # and are a few KB total — not worth any rounding
        if dtype and v.dtype == np.float32 and not k.startswith('bn_state/'):
            if not np.all(np.isfinite(v)) or np.abs(v).max() >= 6e4:
                out[k] = v
            else:
                out[k] = v.astype(dtype)
        else:
            out[k] = v
    fname = os.path.join(rel_dir, snapshot_name(step))
    tmp = fname + '.tmp'
    with open(tmp, 'wb') as f:
        np.savez_compressed(f, **out)
    os.replace(tmp, fname)
    return fname
