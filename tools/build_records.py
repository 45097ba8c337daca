#!/usr/bin/env python
"""Build a serialized records dataset from a directory of labeled images.

CLI parity with the reference's TFRecord writer harness
(/root/reference/lib/lstm/utils/tf_records.py:209-210,244-247):
walks ``--img_dir``, parses ``{idx}_{label}.png`` filenames, writes
``--out``. Optionally ``--synth N`` renders N fresh captchas directly
into the records file (no intermediate PNGs).
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from lstm_ctc_ocr_tpu.data.records import (RecordsWriter,
                                           write_image_annotation_pairs_to_records)


def synth_to_records(n: int, out_path: str, seed: int = 0) -> int:
    import numpy as np
    from lstm_ctc_ocr_tpu.data.gen import generate_img
    rng = random.Random(seed)
    with RecordsWriter(out_path) as w:
        for i in range(n):
            img, label = generate_img(rng)
            w.add(label, np.asarray(img, dtype=np.uint8))
            if (i + 1) % 5000 == 0:
                print('  {}/{}'.format(i + 1, n), flush=True)
    return n


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--img_dir', default=None,
                    help='directory of {idx}_{label}.png images')
    ap.add_argument('--out', default='./data/train_4_6.records')
    ap.add_argument('--synth', type=int, default=None,
                    help='render N captchas directly instead of reading a dir')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--cfg', default=None,
                    help='experiment yml: --synth renders with ITS length/'
                         'charset/renderer (e.g. lstm/longline.yml)')
    ap.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                    default=None, help='config overrides')
    args = ap.parse_args()
    if args.cfg or args.set_cfgs:
        from lstm_ctc_ocr_tpu.config import cfg_from_file, cfg_from_list
        if args.cfg:
            cfg_from_file(args.cfg)
        if args.set_cfgs:
            cfg_from_list(args.set_cfgs)
    if args.synth:
        n = synth_to_records(args.synth, args.out, args.seed)
    else:
        assert args.img_dir, 'need --img_dir or --synth N'
        n = write_image_annotation_pairs_to_records(args.img_dir, args.out)
    print('wrote {} records to {}'.format(n, args.out))
