"""jax.profiler integration.

The reference has no tracing/profiling subsystem (SURVEY.md §5: wall-clock
meters only); on TPU the XLA profiler is free — wrap any region in
``trace('/tmp/trace')`` and inspect with TensorBoard / xprof.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
