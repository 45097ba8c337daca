"""Model factory: name -> Network instance (reference lib/networks/factory.py:13-21)."""

from __future__ import annotations

from .crnn import LSTM_test, LSTM_train

__sets = {}


def get_network(name: str):
    """Dispatch 'LSTM_train' / 'LSTM_test' like the reference factory."""
    if name.split('_')[0] == 'LSTM':
        kind = name.split('_')[1]
        if kind == 'train':
            return LSTM_train()
        if kind == 'test':
            return LSTM_test()
        raise KeyError('Unknown LSTM dataset: {}'.format(name))
    raise KeyError('Unknown network name: {}'.format(name))


def list_networks():
    return list(__sets.keys()) + ['LSTM_train', 'LSTM_test']
