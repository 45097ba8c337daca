"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (the reference imposes no
distributed semantics; SURVEY.md section 4), and Pallas kernels run in
interpret mode off-TPU.

Note: the axon TPU-tunnel plugin ignores the JAX_PLATFORMS env var, so the
platform must be forced via jax.config before any backend initialisation.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
