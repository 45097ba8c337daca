"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (the reference imposes no
distributed semantics; SURVEY.md section 4), and kernels run in interpret
mode off-TPU. Must run before anything imports jax.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
