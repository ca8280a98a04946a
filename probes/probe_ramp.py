"""Group-1 cost attribution: build the SAME 1M corpus twice in one
process. Build #2 reuses every loaded program, so its group-1 time is
pure compute; the build-#1 minus build-#2 delta is the one-time
per-process program-load cost (CLAUDE.md: 30-45s/program through the
tunnel). Distinguishes "the ramp got slower" from "the new merged-scan
programs load slower" (bench group-1 went 18.6s r1 -> 36.2s r2).

Usage: PGV_BUILD_TIMING=1 python probe_ramp.py [N=1000000]
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
    dim = 128

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from bench import make_dataset_device
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    data, _ = make_dataset_device(n, dim, 16)
    for rep in range(2):
        t0 = time.time()
        idx = HnswIndex.build(
            data, metric="l2", method="device", seed=1, host_graph=False
        )
        dt = time.time() - t0
        print(
            f"BUILD#{rep + 1} N={n} {dt:.1f}s = {n / dt:.0f} vec/s",
            file=sys.stderr,
            flush=True,
        )
        del idx


if __name__ == "__main__":
    main()
