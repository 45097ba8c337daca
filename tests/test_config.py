"""Config system: typed merge, --set overrides, codec (SURVEY.md section 2)."""

import copy

import pytest

from lstm_ctc_ocr_tpu.config import (AttrDict, cfg, cfg_from_file,
                                     cfg_from_list, get_encode_decode_dict)


@pytest.fixture(autouse=True)
def _restore_cfg():
    snapshot = copy.deepcopy(dict(cfg))
    yield
    cfg.clear()
    for k, v in snapshot.items():
        cfg[k] = v


def test_defaults_match_reference_keys():
    # Key invariants from /root/reference/lib/lstm/config.py
    assert cfg.POOL_SCALE == 4
    assert cfg.OFFSET_TIME_STEP == -1
    assert cfg.IMG_HEIGHT == 32
    assert cfg.NCLASSES == 64
    assert cfg.BLANK_TOKEN == 0
    assert len(cfg.CHARSET) == 62
    assert cfg.NUM_FEATURES == 32
    assert cfg.TRAIN.NUM_HID == 512
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.VAL.BATCH_SIZE == 128


def test_attrdict_nested_access():
    d = AttrDict({'a': {'b': 2}})
    assert d.a.b == 2
    d.a.c = 5
    assert d['a']['c'] == 5


def test_reference_yaml_parses_unchanged(tmp_path):
    # the exact structure of the reference lstm/lstm.yml
    yml = tmp_path / 'lstm.yml'
    yml.write_text(
        'EXP_DIR: lstm_ctc\nLOG_DIR: lstm_ctc\nNET_NAME: LSTM\nGPU_ID: 0\n'
        'TRAIN:\n  SOLVER: Adam\n  DISPLAY: 100\n  SNAPSHOT_ITERS: 2000\n'
        '  LEARNING_RATE: 0.0001\n  MOMENTUM: 0.9\n  GAMMA: 1.0\n'
        '  STEPSIZE: 2000\n  WEIGHT_DECAY: 0.00001\n')
    cfg_from_file(str(yml))
    assert cfg.EXP_DIR == 'lstm_ctc'
    assert cfg.TRAIN.LEARNING_RATE == 0.0001
    assert cfg.TRAIN.GAMMA == 1.0
    assert cfg.TRAIN.STEPSIZE == 2000


def test_unknown_key_raises(tmp_path):
    yml = tmp_path / 'bad.yml'
    yml.write_text('NOT_A_KEY: 1\n')
    with pytest.raises(KeyError):
        cfg_from_file(str(yml))


def test_type_mismatch_raises(tmp_path):
    yml = tmp_path / 'bad.yml'
    yml.write_text('EXP_DIR: 3\n')
    with pytest.raises(ValueError):
        cfg_from_file(str(yml))


def test_cfg_from_list_dotted_override():
    cfg_from_list(['TRAIN.BATCH_SIZE', '8', 'EXP_DIR', 'exp1',
                   'TRAIN.LEARNING_RATE', '0.001'])
    assert cfg.TRAIN.BATCH_SIZE == 8
    assert cfg.EXP_DIR == 'exp1'
    assert cfg.TRAIN.LEARNING_RATE == 0.001


def test_cfg_from_list_rejects_bad_key():
    with pytest.raises(AssertionError):
        cfg_from_list(['NOPE.NOPE', '1'])


def test_codec_roundtrip():
    enc, dec = get_encode_decode_dict()
    assert enc['0'] == 1            # chars encoded from 1 (config.py:76)
    assert enc['9'] == 10
    assert dec[0] == ''             # blank/space at 0 (config.py:79-80)
    s = 'aB3xYz'
    ids = [enc[c] for c in s]
    assert ''.join(dec[i] for i in ids) == s
    assert 0 not in ids
    assert max(enc.values()) == 62  # NCLASSES=64 quirk: ids only reach 62


def test_resolve_font_bundled_and_fallbacks(tmp_path, monkeypatch):
    """The repo ships fonts/DejaVuSerif.ttf; resolution must work without any
    system font: configured path -> repo-local bundle -> system chain."""
    import os.path as osp
    from lstm_ctc_ocr_tpu.config import resolve_font

    # 1. explicit existing path wins
    f = tmp_path / 'x.ttf'
    f.write_bytes(b'\0')
    assert resolve_font(str(f)) == str(f)

    # 2. missing configured path falls back to the bundled font (never the
    #    system dir), so the suite passes with system DejaVu absent
    got = resolve_font('/nonexistent/dir/NoSuch.ttf')
    assert osp.isfile(got)
    assert osp.join('fonts', '') .rstrip(osp.sep) in got or 'fonts' in got
    assert got.startswith(cfg.ROOT_DIR)

    # 3. default cfg.FONT resolves to the bundled file
    got_default = resolve_font()
    assert osp.isfile(got_default)
    assert got_default.startswith(cfg.ROOT_DIR)


def test_renderer_uses_resolved_font(monkeypatch):
    """Synth rendering works when cfg.FONT points at a missing path."""
    import random
    from lstm_ctc_ocr_tpu.data import gen
    monkeypatch.setitem(cfg, 'FONT', '/nonexistent/dir/NoSuch.ttf')
    gen._renderer_cache.clear()
    img, label = gen.generate_img(random.Random(0))
    assert img.ndim == 2 and img.shape[0] > 0
    assert len(label) >= cfg.MIN_LEN
    gen._renderer_cache.clear()
