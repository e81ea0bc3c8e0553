"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so that multi-chip sharding
(`gendr_tpu.parallel`) is exercised without TPU hardware.

Note: this environment preloads jax with a TPU backend via sitecustomize and
pins JAX_PLATFORMS, so the env var alone is not enough — we also switch the
platform at runtime before any backend is initialized.
"""

import os

import pytest

xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

# persistent XLA compilation cache: reruns skip recompiles (the dominant
# test cost on this 1-core box is jit compile time, not execution)
if 'JAX_COMPILATION_CACHE_DIR' not in os.environ:
    os.environ['JAX_COMPILATION_CACHE_DIR'] = os.path.join(
        os.path.dirname(__file__), '.jax_cache')
    os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS',
                          '0.5')

import jax  # noqa: E402

try:
    jax.config.update('jax_platforms', 'cpu')
except Exception:
    pass


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: long-running experiment smoke tests '
        '(deselect with -m "not slow")')
    config.addinivalue_line(
        'markers', 'exhaustive: full cross-product parity sweeps; skipped '
        'by default to keep iteration fast — run with GENDR_EXHAUSTIVE=1 '
        '(a stratified subset of every code path stays in the default '
        'suite)')


def pytest_collection_modifyitems(config, items):
    if os.environ.get('GENDR_EXHAUSTIVE'):
        return
    skip = pytest.mark.skip(
        reason='exhaustive tier: set GENDR_EXHAUSTIVE=1 to run')
    for item in items:
        if 'exhaustive' in item.keywords:
            item.add_marker(skip)
