"""Shared Pallas dispatch policy.

One place decides when kernels run in interpreter mode (tests and CPU
dry-runs) vs compiled Mosaic (the TPU fast path) so the TPU/CPU dispatch
rule cannot drift between the CTC and LSTM kernels.
"""

import jax


def interpret_off_tpu() -> bool:
    return jax.default_backend() != 'tpu'
