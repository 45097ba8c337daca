"""Fresh-clone eval contract: every shipped release in checkpoints/ must
restore through the release-fallback path and beat an accuracy floor on
its TRACKED val set, with output/ absent.

This is the CI twin of the reference's eval contract (restore latest and
score a labeled directory, /root/reference/lib/lstm/test.py:42-52): a
broken or missing release fails the suite instead of a user's ./test.sh.

Mechanics: each release gets a temp ROOT with an EMPTY ``output/<exp>/``
and ``checkpoints/<exp>`` symlinked to the repo's tracked release, so
``engine/checkpoint.latest_eval_checkpoint`` MUST take the release-dir
fallback (engine/checkpoint.py:209-215). Eval runs on CPU over a small
deterministic slice of the tracked val set (binomial floor set so a
genuine >=95%-accurate release passes with huge margin while a broken
restore — wrong head, f16 corruption, stale family — fails hard).
"""

import copy
import os
import shutil

import pytest

from lstm_ctc_ocr_tpu.config import cfg, cfg_from_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# exp_dir -> (config yml, tracked val dir, eval slice, accuracy floor)
#
# Floors are deliberately below the README numbers: on a 64-image slice a
# true-97% model dips below 0.86 with probability < 1e-4, while a broken
# release scores ~0. New releases MUST be added here — the completeness
# check below fails on any checkpoints/<exp> this table doesn't cover.
RELEASES = {
    'digit4': ('lstm/digit4.yml', 'data/val_digit4', 64, 0.86),
    'lstm_ctc': ('lstm/lstm.yml', 'data/val', 64, 0.86),
    'lstm_records': ('lstm/records.yml', 'data/val', 64, 0.86),
    'longline': ('lstm/longline.yml', 'data/val_longline', 48, 0.80),
    'scene': ('lstm/scene.yml', 'data/val_scene', 48, 0.86),
}


def shipped_releases():
    root = os.path.join(REPO, 'checkpoints')
    if not os.path.isdir(root):
        return []
    out = []
    for exp in sorted(os.listdir(root)):
        d = os.path.join(root, exp)
        if os.path.isdir(d) and any(f.endswith('.ckpt.npz')
                                    for f in os.listdir(d)):
            out.append(exp)
    return out


def test_every_release_is_covered():
    unknown = [e for e in shipped_releases() if e not in RELEASES]
    assert not unknown, (
        'tracked releases with no eval-contract row (add them to RELEASES '
        'in this file): {}'.format(unknown))


@pytest.fixture
def _cfg_guard():
    snapshot = copy.deepcopy(dict(cfg))
    yield
    cfg.clear()
    for k, v in snapshot.items():
        cfg[k] = v


@pytest.mark.parametrize('exp', sorted(RELEASES))
def test_release_restores_and_scores(exp, _cfg_guard, tmp_path):
    if exp not in shipped_releases():
        pytest.skip('no tracked release for {} yet'.format(exp))
    yml, val_dir, n_eval, floor = RELEASES[exp]
    val_dir = os.path.join(REPO, val_dir)
    assert os.path.isdir(val_dir), (
        'release {} exists but its val set {} is not tracked'.format(
            exp, val_dir))

    cfg_from_file(os.path.join(REPO, yml))
    # CPU-speed knobs only — the restored artifact is untouched
    cfg.TEST.BATCH_SIZE = 16
    cfg.DECODER = 'greedy'
    cfg.PARALLEL = 'off'

    # fresh-clone layout: empty output/<exp>, tracked checkpoints/<exp>
    out_dir = tmp_path / 'output' / exp
    out_dir.mkdir(parents=True)
    (tmp_path / 'checkpoints').mkdir()
    os.symlink(os.path.join(REPO, 'checkpoints', exp),
               str(tmp_path / 'checkpoints' / exp))

    from lstm_ctc_ocr_tpu.engine import checkpoint
    found = checkpoint.latest_eval_checkpoint(str(out_dir))
    assert found is not None, 'release fallback found nothing'
    assert str(tmp_path / 'checkpoints') in found[0], (
        'expected the RELEASE file, got {}'.format(found[0]))

    # deterministic slice of the val set
    names = sorted(f for f in os.listdir(val_dir)
                   if f.endswith('.png'))[:n_eval]
    sub = tmp_path / 'val'
    sub.mkdir()
    for f in names:
        shutil.copy(os.path.join(val_dir, f), str(sub / f))

    from lstm_ctc_ocr_tpu.config import AttrDict
    from lstm_ctc_ocr_tpu.engine.test import test_net
    from lstm_ctc_ocr_tpu.models.factory import get_network
    net = get_network('LSTM_test')
    acc, _ = test_net(net, AttrDict({'name': exp}), str(sub),
                      str(out_dir), None)
    assert acc >= floor, (
        'released {} weights scored {:.3f} on {} tracked val images '
        '(floor {})'.format(exp, acc, len(names), floor))
