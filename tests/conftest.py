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
    xla_flags += ' --xla_force_host_platform_device_count=8'
# Compile-time trim for the CPU test backend: the interpret-mode Pallas
# kernels lower to very large HLO graphs whose cold jit compile dominates
# the suite's wall time on this 1-core box (~2/3 of a cold run).  Dropping
# the backend optimization level + expensive LLVM passes cuts that compile
# ~2x; execution stays in the low-ms range at test shapes.  Tests assert
# parity between two backends compiled the same way, so the lower opt
# level does not weaken any oracle.
if 'xla_backend_optimization_level' not in xla_flags:
    xla_flags += (' --xla_backend_optimization_level=0'
                  ' --xla_llvm_disable_expensive_passes=true'
                  ' --xla_cpu_enable_concurrency_optimized_scheduler=false')
os.environ['XLA_FLAGS'] = xla_flags.strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

try:
    jax.config.update('jax_platforms', 'cpu')
except Exception:
    pass

# Persistent XLA compilation cache: reruns skip recompiles.  sitecustomize
# imports jax before this file runs, so the JAX_COMPILATION_CACHE_DIR env
# var is read (as unset) before we could export it — the config must be
# updated at runtime instead.
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '.jax_cache'))
# GENDR_CACHE_READONLY=1 serves existing cache entries but suppresses new
# writes (threshold no compile can reach).  The write path serializes the
# executable through zstandard in-process and has segfaulted on this
# 1-core box under memory pressure during long exhaustive runs; reads have
# never crashed.  Use it for marathon tiers where losing the process costs
# more than re-compiling the few uncached programs.
if os.environ.get('GENDR_CACHE_READONLY'):
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1e9)
else:
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)


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
