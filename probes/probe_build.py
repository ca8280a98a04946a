"""Build-rate probe: device build only, phase/group timing to stderr.

Usage: PGV_BUILD_TIMING=1 python probe_build.py [N]
Env: PGV_PROBE_DIM (128). Prints total build seconds and rate.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(os.environ.get("PGV_PROBE_DIM", 128))

    import jax

    cache_dir = os.environ.get("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from bench import make_dataset, make_dataset_device
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    if os.environ.get("PGV_PROBE_DEVICE") == "1":
        data, _ = make_dataset_device(n, dim, 16)
    else:
        data, _ = make_dataset(n, dim, 16)
    t0 = time.time()
    index = HnswIndex.build(
        data, metric="l2", method="device", seed=1, host_graph=False
    )
    dt = time.time() - t0
    print(
        f"BUILD N={n} dim={dim} {dt:.1f}s = {n/dt:.0f} vec/s",
        file=sys.stderr,
        flush=True,
    )
    assert index is not None


if __name__ == "__main__":
    main()
