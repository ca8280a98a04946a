"""Round-4 sweep-ceiling A/B (VERDICT r3 #6 / DESIGN 6e follow-up):
the last untried idea — larger QUERY chunks so approx_min_k's
per-dispatch fixed costs amortize over more rows of the [B, CH] score
block, with the existing corpus-chunk budget loop keeping the block
bounded (so scores still never fully materialize).

One process, back-to-back arms on the SAME resident 1M index (serving
qps across processes swings +-20%; DESIGN.md:292-296):

  chunk=1024 (current default) / 2048 / 4096 / 8192 - engine=approx
  plus exact at 1024 vs 4096 as a control.

Each arm: warm (compile) + 3 timed reps of 16384 queries through
serve_topk; recall@10 vs the exact engine on the same process.

Also builds the index with DEFAULT knobs first — which doubles as the
driver-bench cache warm for the round.

Run (quiet host): timeout 3600 python probes/probe_stream_tpu.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np

os.environ.setdefault("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["PGV_JAX_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print("[stream]", *a, file=_sys.stderr, flush=True)


def main():
    from bench import make_dataset_device
    from pgvector_rx_tpu.graph import device as dm
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    n, n_q, k = 1_000_000, 16384, 10
    log("devices:", jax.devices())
    data, queries = make_dataset_device(n, 128, n_q)
    t0 = time.time()
    index = HnswIndex.build(
        data, metric="l2", method="device", seed=1, host_graph=False
    )
    log(f"build {time.time()-t0:.1f}s = {n/(time.time()-t0):.0f}/s")

    # GT from the exact engine (chunk=1024)
    _, gt = dm.serve_topk(index, queries, k, engine="exact")

    def arm(engine, chunk):
        # warm/compile
        dm.serve_topk(index, queries, k, engine=engine, chunk=chunk)
        best = None
        for _ in range(3):
            t0 = time.time()
            d, ids = dm.serve_topk(index, queries, k, engine=engine,
                                   chunk=chunk)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rec = float(np.mean(
            [len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)]
        ))
        log(f"{engine} chunk={chunk}: {n_q/best:.0f} qps (best of 3) "
            f"recall@10={rec:.4f}")

    for chunk in (1024, 2048, 4096, 8192):
        arm("approx", chunk)
    for chunk in (1024, 4096):
        arm("exact", chunk)
    # beam: validates build-default changes (BE_K etc.) hold the 1M
    # beam recall contract (~0.983 at ef=40)
    arm("beam", 1024)
    # re-run the 1024 baseline last to bracket in-process drift
    arm("approx", 1024)


if __name__ == "__main__":
    main()
