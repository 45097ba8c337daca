"""Three-tier config system: code defaults <- YAML file <- ``--set`` overrides.

Re-implements the semantics of the reference config
(``/root/reference/lib/lstm/config.py``): a global attribute-dict ``cfg``
holding every hyperparameter, a recursive *typed* merge from a YAML file
(unknown key -> KeyError, type mismatch -> ValueError; ``config.py:99-126``),
dotted-path CLI overrides with ``literal_eval`` type checking
(``config.py:136-156``), the charset codec (chars encoded 1..62, index 0 is
the blank/space token; ``config.py:73-81``), and output/log directory
resolution (``config.py:84-97``).

The reference keys are preserved verbatim (so the reference's ``lstm.yml``
parses unchanged); TPU-specific knobs are additive (``BUCKETS``,
``CTC_IMPL``, ``LSTM_IMPL``, ``DECODER``, ``TRAIN.DTYPE`` ...).
"""

from __future__ import annotations

import os
import os.path as osp
from ast import literal_eval
from time import localtime, strftime


class AttrDict(dict):
    """A dict whose items are also attributes (``easydict`` equivalent).

    Nested dicts assigned into an ``AttrDict`` are converted recursively so
    ``cfg.TRAIN.SOLVER`` style access works at every level.
    """

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d:
            for k, v in dict(d).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, AttrDict):
            value = AttrDict(value)
        super().__setitem__(key, value)

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        del self[key]


__C = AttrDict()
cfg = __C

# ---------------------------------------------------------------------------
# Defaults — key names and values mirror the reference
# (/root/reference/lib/lstm/config.py:13-72) so its lstm.yml merges cleanly.
# ---------------------------------------------------------------------------
__C.GPU_ID = 1                 # kept for CLI compat; device choice is JAX's
__C.GPU_USAGE = 0.9            # unused on TPU (XLA manages HBM); kept for yml compat
__C.OFFSET_TIME_STEP = -1      # conv5 VALID shrinks T by 1: T = W//4 - 1
__C.POOL_SCALE = 4             # two (2,2) pools halve width twice
__C.IMG_SHAPE = [32, 100]
__C.IMG_HEIGHT = 32
__C.MAX_CHAR_LEN = 6
__C.BLANK_TOKEN = 0
__C.CHARSET = '0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ'
__C.NCLASSES = len(__C.CHARSET) + 2    # ref quirk preserved: only 0..62 used
__C.MIN_LEN = 4
__C.MAX_LEN = 6
# The reference ships fonts/Ubuntu-M.ttf (config.py:26); we ship an
# open-licensed repo-local face (fonts/DejaVuSerif.ttf + LICENSE) and resolve
# through a fallback chain (resolve_font below) so the synth pipeline works
# on hosts without any system fonts. DejaVuSerif over Sans: Sans renders 'l'
# and 'I' as near-identical vertical bars, capping exact-match accuracy on
# the 62-char set at ~92% no matter how good the model is.
__C.FONT = 'fonts/DejaVuSerif.ttf'
__C.NCHANNELS = 1
__C.NUM_FEATURES = __C.IMG_HEIGHT * __C.NCHANNELS

__C.NET_NAME = 'lstm'

__C.TRAIN = AttrDict()
__C.TRAIN.SOLVER = 'Adam'          # Adam | RMS | Momentum (train.py:74-76)
__C.TRAIN.TXT = 'annotation_train.txt'
__C.TRAIN.WEIGHT_DECAY = 0.0005
__C.TRAIN.LEARNING_RATE = 0.01
__C.TRAIN.MOMENTUM = 0.9
__C.TRAIN.GAMMA = 0.1              # lr multiplier every STEPSIZE iters
__C.TRAIN.STEPSIZE = 50000
__C.TRAIN.DISPLAY = 10
__C.TRAIN.LOG_IMAGE_ITERS = 100
__C.TRAIN.NUM_EPOCHS = 2000
__C.TRAIN.NUM_HID = 512            # BiLSTM: 2 directions x NUM_HID//2
__C.TRAIN.NUM_LAYERS = 2
__C.TRAIN.BATCH_SIZE = 64
__C.TRAIN.SNAPSHOT_ITERS = 5000
__C.TRAIN.SNAPSHOT_PREFIX = 'lstm'
__C.TRAIN.SNAPSHOT_INFIX = ''
# --- TPU-native additions -------------------------------------------------
__C.TRAIN.GRAD_CLIP = 10.0         # ref hardcodes clip_by_global_norm(.., 10)
__C.TRAIN.DTYPE = 'bfloat16'       # compute dtype on TPU; params stay fp32
__C.TRAIN.NUM_WORKERS = 12         # host synth workers (gen.py: num_workers=12)
__C.TRAIN.LOSS_MIN_SNAPSHOT = 0.015  # snapshot when loss dips below the
                                     # tracked minimum (train.py:109,139-144)
__C.TRAIN.STEPS_PER_DISPATCH = 1   # K>1: one jit dispatch runs K optimizer
                                   # steps via lax.scan over K pre-staged
                                   # same-bucket batches — amortizes the
                                   # per-step host dispatch/tunnel round-trip
                                   # (the sustained-throughput bottleneck on
                                   # weak hosts, PERF.md host-pipeline
                                   # section). K=1 (default) is the exact
                                   # reference-parity loop; the key stream,
                                   # lr schedule and update math are
                                   # identical for any K (tests/test_multistep.py)

__C.VAL = AttrDict()
__C.VAL.TXT = 'annotation_val.txt'
__C.VAL.VAL_STEP = 1000
__C.VAL.NUM_EPOCHS = 1000
__C.VAL.BATCH_SIZE = 128
__C.VAL.PRINT_NUM = 5

__C.RNG_SEED = 3

__C.ROOT_DIR = osp.abspath(osp.join(osp.dirname(__file__), '..'))
__C.TEST = AttrDict()
__C.TEST.BATCH_SIZE = 1        # >1: bucket-grouped batched eval (TPU addition)
__C.EXP_DIR = 'default'
__C.LOG_DIR = 'default'

__C.SPACE_INDEX = 0
__C.SPACE_TOKEN = ''

# --- TPU-native additions (framework-level) --------------------------------
# Width buckets: every host batch is right-padded to the smallest bucket that
# fits, so XLA compiles one program per bucket instead of one per batch width.
__C.BUCKETS = [64, 96, 128, 160, 192, 224, 256]
__C.CTC_IMPL = 'jax'           # 'jax' (lax.scan, default) | 'pallas'.
                               # Measured on v5e at BOTH benched shapes the
                               # scan wins slightly (W=96: 16.3 vs 16.9
                               # ms/step; longline W=448/S=49: 38.7 vs 39.7
                               # — PERF.md variant tables), so it is the
                               # default; the Pallas kernel stays as an A/B.
# 'shifted' lowers the channel-heavy convs to sums of shifted matmuls
# (ops/conv.py) instead of XLA's native conv — same numerics, better MXU
# shapes at this model's tiny post-pool spatial extents. 'xla' = native conv.
__C.CONV_IMPL = 'xla'          # 'xla' | 'shifted'
__C.LSTM_IMPL = 'pallas'       # 'pallas' | 'jax'   (fused VMEM-resident scan)
__C.DECODER = 'greedy'         # 'greedy' | 'beam'
__C.BEAM_WIDTH = 16
# Reference decodes with ctc_beam_search_decoder(merge_repeated=True)
# (network.py:656): post-collapse adjacent repeats in the decoded labels.
# Off by default (it deletes legitimate double letters); on = parity mode.
__C.BEAM_MERGE_REPEATED = False
# BN statistics at eval/serving: 'batch' reproduces the reference quirk —
# tf.contrib.layers.batch_norm(is_training=True) in BOTH train and test
# graphs (reference network.py:176-178), so eval accuracy moves ±1-2 images
# with batch composition. 'moving' normalizes with EMA statistics that the
# train step accumulates as non-optimized state (or that
# tools/calibrate_bn.py estimates post-hoc for released weights), making
# eval/serving batch-composition invariant. Training always uses batch
# statistics (and always maintains the EMA) under either setting.
__C.BN_EVAL = 'batch'          # 'batch' (reference parity) | 'moving'
__C.BN_MOMENTUM = 0.99         # EMA decay of the moving mean/variance
__C.DATA_BACKEND = 'synth'     # 'synth' (beta path) | 'pool' | 'records' (dev path)
# Host->device image dtype for the bucketed TPU path: 'uint8' ships raw
# pixels and normalizes on device (x.astype(f32)/255 as the graph's first
# fused op, models/network.py:apply) — 4x less host->device traffic and a
# 4x cheaper host batch assembly (memcpy instead of astype+divide), with
# BIT-IDENTICAL numerics (the exact same f32 division runs on device
# instead of host; tests/test_data.py pins loss+grad equality). 'float32'
# reproduces the reference's host-side /255 (gen.py:63) on the wire.
__C.TRANSFER_DTYPE = 'uint8'   # 'uint8' | 'float32'
# Device-resident dataset (data/device_store.py): upload the pool/records
# rows to HBM once and gather batches ON DEVICE from per-step index
# arrays — per-step host->device payload drops ~700x (the measured
# bottleneck, PERF.md "Sustained end-to-end"). On a DP mesh the store is
# replicated per device and only the index array is sharded. 'auto'
# enables it for the pool/records backends in single-process runs when a
# store replica fits DATA_DEVICE_MAX_MB; 'on' forces (errors if the
# backend can't), 'off' always streams host batches.
__C.DATA_DEVICE = 'auto'       # 'auto' | 'on' | 'off'
__C.DATA_DEVICE_MAX_MB = 2048  # 'auto' size gate for the HBM store
# Store layout on a mesh: 'auto' replicates the store per device in
# single-process runs (global uniform sampling, zero gather traffic) and
# shards it per device on multi-host runs (each host uploads its local
# devices' partitions). 'sharded' forces per-device partitions even
# single-process — n_dev x less HBM for datasets too big to replicate,
# with distributed-loader sampling semantics (device d samples only its
# own partition; one epoch still covers every row exactly once).
__C.DATA_DEVICE_LAYOUT = 'auto'  # 'auto' | 'sharded'
# Device parallelism for the training CLI: 'auto' builds a DP mesh over every
# visible chip (largest device count dividing the batch sizes), 'off' forces
# the single-device step. The reference is single-GPU (train_net.py:59);
# multi-chip DP over ICI is the TPU-native scale-out (parallel/mesh.py).
__C.PARALLEL = 'auto'          # 'auto' | 'off'
__C.RENDERER = 'captcha'       # 'captcha' (reference parity) | 'scene' (photo-like)
                               # | 'native' (C++ hot loop, native/synth.cpp)
__C.RECORDS_PATH = './data/train_4_6.records'
# cache each record's height-resized image from first use (~0.3 GB per 100k
# captcha examples); disable for datasets too large to hold resized in RAM
__C.RECORDS_CACHE_RESIZED = True
# worker start method for the synth enqueuer: 'fork' (reference behavior,
# fast) or 'spawn' (safe under multi-threaded parents like a JAX process)
__C.MP_START = 'fork'
__C.POOL_SIZE = 20000          # pre-rendered images for the 'pool' backend
__C.POOL_REFRESH = 2           # images re-rendered per served batch

# jax.profiler trace capture (utils/profiler.py): set PROFILE_DIR to enable
__C.PROFILE_DIR = ''           # e.g. 'logs/profile'; '' disables
__C.PROFILE_START = 20         # first traced step (past compile/warmup)
__C.PROFILE_STEPS = 10         # how many steps to trace


def resolve_font(font=None):
    """Resolve ``cfg.FONT`` to an existing .ttf via a fallback chain.

    Order: the configured path as given -> relative to the repo root -> any
    repo-local ``fonts/*.ttf`` (the bundled asset, like the reference's
    ``fonts/Ubuntu-M.ttf``) -> common system DejaVu paths -> first .ttf found
    under /usr/share/fonts. Raises FileNotFoundError with the chain tried.
    """
    import glob
    font = font if font is not None else __C.FONT
    tried = []
    cand = [str(font), osp.join(__C.ROOT_DIR, str(font))]
    for p in cand:
        if osp.isfile(p):
            return osp.abspath(p)
        tried.append(p)
    # past here the EXPLICITLY configured font is missing — say so loudly
    # before substituting: font identity materially changes accuracy (the
    # sans 'l'/'I' ambiguity alone is ~5 points), and a silent swap makes
    # results incomparable (e.g. a migrated lstm.yml keeping the
    # reference's fonts/Ubuntu-M.ttf, which this repo does not ship)
    print('WARNING: configured FONT {!r} not found; falling back to a '
          'bundled/system font'.format(str(font)))
    bundled = sorted(glob.glob(osp.join(__C.ROOT_DIR, 'fonts', '*.ttf')))
    serif = [p for p in bundled if 'Serif' in osp.basename(p)]
    if serif or bundled:
        return (serif + bundled)[0]
    tried.append(osp.join(__C.ROOT_DIR, 'fonts', '*.ttf'))
    for p in ['/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf',
              '/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf']:
        if osp.isfile(p):
            return p
        tried.append(p)
    system = sorted(glob.glob('/usr/share/fonts/**/*.ttf', recursive=True))
    if system:
        return system[0]
    tried.append('/usr/share/fonts/**/*.ttf')
    raise FileNotFoundError('no usable .ttf found; tried: ' + ', '.join(tried))


def get_encode_decode_dict():
    """Char<->id maps: chars at 1..len(CHARSET), blank/space at 0.

    Mirrors /root/reference/lib/lstm/config.py:73-81.
    """
    encode_maps = {}
    decode_maps = {}
    for i, char in enumerate(__C.CHARSET, 1):
        encode_maps[char] = i
        decode_maps[i] = char
    encode_maps[__C.SPACE_TOKEN] = __C.SPACE_INDEX
    decode_maps[__C.SPACE_INDEX] = __C.SPACE_TOKEN
    return encode_maps, decode_maps


def get_output_dir(imdb, weights_filename=None):
    """Checkpoint dir ``<ROOT>/output/<EXP_DIR>[/<weights>]`` (ref config.py:84-90)."""
    outdir = osp.abspath(osp.join(__C.ROOT_DIR, 'output', __C.EXP_DIR))
    if weights_filename is not None:
        outdir = osp.join(outdir, weights_filename)
    os.makedirs(outdir, exist_ok=True)
    return outdir


def get_log_dir(imdb):
    """Timestamped TensorBoard dir ``<ROOT>/logs/<LOG_DIR>/<name>/<ts>`` (ref config.py:92-97)."""
    log_dir = osp.abspath(osp.join(
        __C.ROOT_DIR, 'logs', __C.LOG_DIR, imdb.name,
        strftime('%Y-%m-%d-%H-%M-%S', localtime())))
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def _merge_a_into_b(a, b):
    """Recursive typed merge of AttrDict ``a`` into ``b`` (ref config.py:99-126).

    Every key in ``a`` must already exist in ``b`` (KeyError otherwise) and
    carry the same type (ValueError otherwise; int->float is allowed since
    YAML writes ``1.0`` and ``1`` interchangeably for lr-style knobs).
    """
    if not isinstance(a, dict):
        return
    for k, v in a.items():
        if k not in b:
            raise KeyError('{} is not a valid config key'.format(k))
        old_type = type(b[k])
        if old_type is not type(v):
            if isinstance(b[k], float) and isinstance(v, int):
                v = float(v)
            else:
                raise ValueError('Type mismatch ({} vs. {}) for config key: {}'
                                 .format(type(b[k]), type(v), k))
        if isinstance(v, AttrDict):
            try:
                _merge_a_into_b(a[k], b[k])
            except Exception:
                print('Error under config key: {}'.format(k))
                raise
        else:
            b[k] = v


def cfg_from_file(filename):
    """Load a YAML config file and merge it into the defaults (ref config.py:128-134)."""
    import yaml
    with open(filename, 'r') as f:
        yaml_cfg = AttrDict(yaml.safe_load(f))
    _merge_a_into_b(yaml_cfg, __C)


def cfg_from_list(cfg_list):
    """Set config keys from a flat ``[K, V, K, V, ...]`` list (ref config.py:136-156)."""
    assert len(cfg_list) % 2 == 0
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = k.split('.')
        d = __C
        for subkey in key_list[:-1]:
            assert subkey in d, '{} is not a valid config key'.format(k)
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, '{} is not a valid config key'.format(k)
        try:
            value = literal_eval(v)
        except Exception:
            value = v  # plain string literal
        if isinstance(d[subkey], float) and isinstance(value, int):
            value = float(value)
        assert type(value) == type(d[subkey]), \
            'type {} does not match original type {}'.format(
                type(value), type(d[subkey]))
        d[subkey] = value
