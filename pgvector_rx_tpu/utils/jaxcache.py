"""Persistent XLA compilation cache setup (library-wide).

Fresh compiles of the build/serve programs cost ~45-90s each through
the dev harness's tunneled TPU backend; the persistent cache makes
repeats near-free. Importing any JAX-using module of this package
calls :func:`enable` once. ``PGV_JAX_CACHE`` overrides the directory;
``PGV_JAX_CACHE=0`` disables.
"""

from __future__ import annotations

import os

_done = False


def enable() -> None:
    global _done
    if _done:
        return
    _done = True
    cache_dir = os.environ.get("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache")
    if cache_dir in ("0", ""):
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
