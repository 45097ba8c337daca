"""StepProfiler: disabled by default, captures a jax.profiler trace when
cfg.PROFILE_DIR is set (works on CPU; same codepath on TPU)."""

import copy
import glob
import os

import jax
import jax.numpy as jnp
import pytest

from lstm_ctc_ocr_tpu.config import cfg
from lstm_ctc_ocr_tpu.utils.profiler import StepProfiler


@pytest.fixture(autouse=True)
def _restore_cfg():
    snapshot = copy.deepcopy(dict(cfg))
    yield
    cfg.clear()
    for k, v in snapshot.items():
        cfg[k] = v


def test_disabled_by_default():
    prof = StepProfiler()
    assert not prof.enabled
    for it in range(50):
        prof.step(it)          # must be a no-op, no trace dir created
    prof.close()
    assert not prof.active


def test_captures_trace_window(tmp_path):
    d = str(tmp_path / 'profile')
    prof = StepProfiler(trace_dir=d, start=2, num_steps=3)
    x = jnp.ones((8, 8))
    f = jax.jit(lambda x: x @ x)
    for it in range(8):
        prof.step(it)
        f(x).block_until_ready()
    assert prof.done and not prof.active
    trace_files = glob.glob(os.path.join(d, '**', '*.trace.json.gz'),
                            recursive=True) + \
        glob.glob(os.path.join(d, '**', '*.xplane.pb'), recursive=True)
    assert trace_files, 'no trace artifacts written under {}'.format(d)


def test_close_stops_open_trace(tmp_path):
    d = str(tmp_path / 'profile2')
    prof = StepProfiler(trace_dir=d, start=0, num_steps=100)
    prof.step(0)
    assert prof.active
    prof.close()               # early exit mid-window must not leak the trace
    assert not prof.active
