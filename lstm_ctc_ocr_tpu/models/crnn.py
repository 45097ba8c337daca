"""The CRNN model zoo: LSTM_train / LSTM_test.

Exact layer geometry of the reference models
(/root/reference/lib/networks/LSTM_train.py:22-38, LSTM_test.py:18-34):

    data [N, W, 32] (width-major, the width axis is CTC time)
    conv1 3x3x64  SAME -> pool1 2x2/2           [N, W/2, 16, 64]
    conv2 3x3x128 SAME -> pool  2x2/2           [N, W/4,  8, 128]
    conv3_1, conv3_2 3x3x256 -> pool 1x2        [N, W/4,  4, 256]
    conv4_1, conv4_2 3x3x512 (BN) -> pool 1x2   [N, W/4,  2, 512]
    conv5 2x2x512 VALID, no relu                [N, W/4-1, 1, 512]
    reshape_squeeze d=512                       [N, T=W/4-1, 512]
    bi_lstm(512 hid, 2) + proj 512->NCLASSES    [T, N, 64] time-major logits

Reference quirks preserved: the duplicate 'pool2' layer name
(LSTM_train.py:27,30) and the unused ``num_layers`` argument of bi_lstm.
``LSTM_test`` builds the identical graph (the reference only drops label
placeholders, which don't exist in functional JAX anyway).
"""

from __future__ import annotations


from ..config import cfg
from .network import Network


class LSTM_train(Network):
    """Training graph (reference LSTM_train.py)."""

    input_names = ('data', 'time_step_len')

    def setup(self):
        (self.feed('data')
         .conv_single(3, 3, 64, 1, 1, name='conv1', c_i=cfg.NCHANNELS)
         .max_pool(2, 2, 2, 2, padding='VALID', name='pool1')
         .conv_single(3, 3, 128, 1, 1, name='conv2')
         .max_pool(2, 2, 2, 2, padding='VALID', name='pool2')
         .conv_single(3, 3, 256, 1, 1, name='conv3_1')
         .conv_single(3, 3, 256, 1, 1, name='conv3_2')
         .max_pool(1, 2, 1, 2, padding='VALID', name='pool2')  # dup name: ref quirk
         .conv_single(3, 3, 512, 1, 1, name='conv4_1', bn=True)
         .conv_single(3, 3, 512, 1, 1, name='conv4_2', bn=True)
         .max_pool(1, 2, 1, 2, padding='VALID', name='pool3')
         .conv_single(2, 2, 512, 1, 1, padding='VALID', name='conv5', relu=False)
         .reshape_squeeze_layer(d=512, name='reshaped_layer'))
        (self.feed('reshaped_layer', 'time_step_len')
         .bi_lstm(cfg.TRAIN.NUM_HID, cfg.TRAIN.NUM_LAYERS, name='logits'))


class LSTM_test(LSTM_train):
    """Eval graph — identical topology (reference LSTM_test.py)."""
