"""Test configuration: force a virtual 8-device CPU platform.

Mirrors the reference's CPU multi-device faking
(/root/reference/train.py:16) so chain-sharding code paths are exercised
without TPU hardware.

NOTE: the environment may pre-import jax with a TPU platform selected
(site customization), so we must override via ``jax.config`` — env vars
are read once at jax import and would be ignored here.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_threefry_partitionable', True)

assert jax.default_backend() == 'cpu', 'tests must run on the CPU platform'
assert jax.device_count() == 8, 'tests expect 8 virtual CPU devices'
