"""Offline labeled dataset generator (reference: lib/utils/genImg.py).

Writes ``{index:08d}_{label}.png`` captcha files into a directory — the
filename-encoded label format consumed by the eval driver
(lib/lstm/test.py:82) and the records writer (lib/lstm/utils/tf_records.py:54).

The reference fans out with ``multiprocessing.Pool(12)`` (genImg.py:13,35);
we size the pool by core count and fall back to inline on 1-core hosts.
"""

from __future__ import annotations

import functools
import os
import random
from multiprocessing import Pool, cpu_count

from ..config import cfg
from .gen import _renderer, gen_rand


def generate_one(ind: int, out_dir: str = './data/val') -> str:
    # out_dir travels as a pickled argument, NOT module state: under the
    # spawn start method workers re-import this module fresh, so a global
    # set in the parent would silently revert to its default
    rng = random.Random(ind * 9176 + 11)
    chars = gen_rand(rng)
    renderer = _renderer()     # honours cfg.RENDERER (captcha or scene)
    path = os.path.join(out_dir, '{:08d}_{}.png'.format(ind, chars))
    renderer.write(chars, path, rng=rng)
    return path


def run(num: int, out_dir: str = './data/val', workers: int | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    if workers is None:
        workers = max(cpu_count() - 1, 0)
    task = functools.partial(generate_one, out_dir=out_dir)
    if workers <= 1:
        for i in range(num):
            task(i)
    else:
        with Pool(workers) as pool:
            pool.map(task, range(num))
    print('wrote {} images to {}'.format(num, out_dir))


if __name__ == '__main__':
    run(500, './data/val')
