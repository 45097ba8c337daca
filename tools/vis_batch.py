#!/usr/bin/env python
"""Dump a labeled contact sheet of rendered training batches to a PNG.

TPU-native equivalent of the reference generator's ``vis`` debug hook
(/root/reference/lib/lstm/utils/gen.py:69,81,112 — ``get_batch(..., vis)``
pops cv2 windows showing each rendered batch). Headless hosts get a PNG
grid instead: one tile per example, the decoded label printed under it,
written to ``--out``.

The batch comes from the CONFIGURED backend — the exact stream training
consumes (synth/pool/records via engine.train.make_train_stream), or, with
``--from-store``, rows gathered BACK from the device-resident HBM store
(data/device_store.py), which doubles as an end-to-end store sanity check:
what the chip trains on is what lands on the sheet.

Usage:
    python tools/vis_batch.py                          # default synth batch
    python tools/vis_batch.py --cfg lstm/longline.yml --n 16
    python tools/vis_batch.py --set DATA_BACKEND '"pool"' --from-store
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if os.environ.get('JAX_PLATFORMS') == 'cpu':
    # the axon TPU plugin ignores the env var; route through the config API
    # so the sheet can be dumped while a training run holds the chip
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np


def batch_to_images(image, label, label_len, decode_maps):
    """[N, W, 32] width-major batch rows -> ([H, W] uint8 image, text)."""
    out = []
    image = np.asarray(image)
    if image.dtype != np.uint8:            # f32 wire format: already /255
        image = np.clip(image * 255.0, 0, 255).astype(np.uint8)
    for i in range(image.shape[0]):
        im = image[i].T                    # [32, W] height-major for viewing
        ids = np.asarray(label[i][:int(label_len[i])]).tolist()
        text = ''.join(decode_maps.get(int(c), '?') for c in ids)
        out.append((im, text))
    return out


def contact_sheet(tiles, cols, pad=6, caption_h=14):
    """Compose (image, text) tiles into one grayscale sheet with captions."""
    from PIL import Image, ImageDraw
    cols = max(1, min(cols, len(tiles)))
    rows = (len(tiles) + cols - 1) // cols
    cell_w = max(im.shape[1] for im, _ in tiles) + pad
    cell_h = max(im.shape[0] for im, _ in tiles) + caption_h + pad
    sheet = Image.new('L', (cols * cell_w + pad, rows * cell_h + pad), 32)
    draw = ImageDraw.Draw(sheet)
    for k, (im, text) in enumerate(tiles):
        r, c = divmod(k, cols)
        x, y = pad + c * cell_w, pad + r * cell_h
        sheet.paste(Image.fromarray(im), (x, y))
        draw.text((x, y + im.shape[0] + 1), text, fill=255)
    return sheet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=32, help='examples on the sheet')
    ap.add_argument('--cols', type=int, default=4)
    ap.add_argument('--out', default='batch_vis.png')
    ap.add_argument('--from-store', action='store_true',
                    help='gather the rows back from the device-resident HBM '
                         'store (requires DATA_BACKEND pool|records) instead '
                         'of taking a host batch — verifies what the gather '
                         'train step actually sees')
    ap.add_argument('--cfg', default=None, help='experiment YAML')
    ap.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                    default=None, help='cfg overrides')
    args = ap.parse_args()

    from lstm_ctc_ocr_tpu.config import (cfg, cfg_from_file, cfg_from_list,
                                         get_encode_decode_dict)
    if args.cfg:
        cfg_from_file(args.cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    _, decode_maps = get_encode_decode_dict()

    if args.from_store:
        from lstm_ctc_ocr_tpu.data.device_store import make_device_feed
        if str(cfg.DATA_DEVICE) == 'off':
            cfg.DATA_DEVICE = 'auto'
        feed = make_device_feed(args.n)
        if feed is None:
            raise SystemExit('--from-store: the device-store gate declined '
                             '(see the message above)')
        idx = np.asarray(feed.next_indices(args.n, 1)[0])
        img, lab, lab_len, _ = (np.asarray(a[idx]) for a in feed.store.arrays)
        tiles = batch_to_images(img, lab, lab_len, decode_maps)
        src = 'device store ({} backend)'.format(cfg.DATA_BACKEND)
    else:
        from lstm_ctc_ocr_tpu.engine.train import make_train_stream
        stream = make_train_stream(args.n)
        b = next(stream)
        stream.close() if hasattr(stream, 'close') else None
        tiles = batch_to_images(b.image, b.label, b.label_len, decode_maps)
        src = 'host batch ({} backend)'.format(cfg.DATA_BACKEND)

    sheet = contact_sheet(tiles, args.cols)
    sheet.save(args.out)
    print('wrote {} ({} examples, {}x{} px) from {}'.format(
        args.out, len(tiles), sheet.width, sheet.height, src))


if __name__ == '__main__':
    main()
