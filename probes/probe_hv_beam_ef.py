"""Beam ef sweep on the halfvec(1024) 1.25M ip shard (config 3 unit)
under the r5 default (beam ground at dim>=512): the approx sweep is
the headline engine there (0.998 @ 33.5k qps), but iterative scans
ride the graph — record what ef buys on this, the hardest metric/dim
shape (ip-1024 beam ef=40: ivf ground 0.846 r4, beam ground 0.884 r5).

Run (quiet host): timeout 4500 python probes/probe_hv_beam_ef.py
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import sys
import time

import numpy as np


def log(*a):
    print("[hvef]", *a, file=sys.stderr, flush=True)


def main():
    n, dim, n_q, k = 1_250_000, 1024, 4096, 10
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())

    from bench import make_dataset_device
    from pgvector_rx_tpu.graph import device as dm
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    data, queries = make_dataset_device(n, dim, n_q, seed=6, intrinsic=32)
    t0 = time.time()
    index = HnswIndex.build(
        data, metric="ip", method="device", seed=1, dtype=np.float16,
        host_graph=False, consume_input=True,
    )
    log(f"build {time.time()-t0:.1f}s ({n/(time.time()-t0):.0f}/s)")
    _, gt = dm.serve_topk(index, queries, k, engine="exact")
    for ef in (40, 100, 200, 400):
        dm.serve_topk(index, queries, k, engine="beam", ef=ef)  # warm
        t0 = time.time()
        _, ids = dm.serve_topk(index, queries, k, engine="beam", ef=ef)
        dt = time.time() - t0
        rec = float(np.mean(
            [len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)]
        ))
        log(f"beam ef={ef}: recall@10={rec:.4f} {n_q/dt:.0f} qps")


if __name__ == "__main__":
    main()
