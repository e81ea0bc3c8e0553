"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so that multi-chip sharding
(`gendr_tpu.parallel`) is exercised without TPU hardware.

Note: this environment preloads jax with a TPU backend via sitecustomize and
pins JAX_PLATFORMS, so the env var alone is not enough — we also switch the
platform at runtime before any backend is initialized.
"""

import os

xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

try:
    jax.config.update('jax_platforms', 'cpu')
except Exception:
    pass


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: long-running experiment smoke tests '
        '(deselect with -m "not slow")')
