"""Profiling helpers: JAX profiler wrappers (the xprof story).

The reference relies on EXPLAIN ANALYZE; here the equivalent lens on the
device compute is the JAX/XLA profiler. ``trace(path)`` wraps
``jax.profiler.trace`` with a safe no-op fallback so library code can
always call it.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Profile the enclosed device work into `log_dir` (xprof format).

    No-op when log_dir is None or the profiler is unavailable.
    """
    if log_dir is None:
        yield
        return
    try:
        import jax

        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        yield


def annotate(name: str):
    """Named trace region for device ops (shows up in xprof timelines)."""
    try:
        import jax

        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
