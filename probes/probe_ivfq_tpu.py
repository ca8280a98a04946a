"""IVF ground quality sweep (round 4): stage-3 measured the default
ivf graph (probes=16, cap=64) at beam recall 0.8796 vs the beam-built
graph's 0.983 — the 16-cell member pool misses true neighbors. This
sweeps the recovery knobs on the REAL 1M corpus, one process:

  for probes in (32, 64): build ivf graph, serve beam(ef=40) recall
  (vs exact GT) + report steady build-group rates (PGV_BUILD_TIMING).

Adoption gate: beam recall >= 0.98 at a probes setting whose 10M-shape
steady rate still clears ~12k vec/s (arm base was 7.95k).

Run (quiet host): timeout 5400 python probes/probe_ivfq_tpu.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

os.environ.setdefault("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache")
os.environ["PGV_BUILD_TIMING"] = "1"

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["PGV_JAX_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print("[ivfq]", *a, file=sys.stderr, flush=True)


def main():
    from bench import make_dataset_device
    from pgvector_rx_tpu.graph import device as dm
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    n, n_q, k = 1_000_000, 16384, 10
    log("devices:", jax.devices())
    data, queries = make_dataset_device(n, 128, n_q)
    gt = None
    probes_list = [int(x) for x in os.environ.get(
        "PGV_IVFQ_PROBES", "32,64").split(",")]
    for probes in probes_list:
        os.environ["PGV_BUILD_GROUND"] = "ivf"
        os.environ["PGV_BUILD_IVF_PROBES"] = str(probes)
        t0 = time.time()
        index = HnswIndex.build(
            data, metric="l2", method="device", seed=1, host_graph=False,
        )
        dt = time.time() - t0
        log(f"probes={probes}: build {dt:.1f}s = {n/dt:.0f}/s "
            "(compile-inclusive; see steady group lines)")
        if gt is None:
            _, gt = dm.serve_topk(index, queries, k, engine="exact")
        for engine in ("beam", "approx"):
            dm.serve_topk(index, queries, k, engine=engine)  # warm
            t0 = time.time()
            _, ids = dm.serve_topk(index, queries, k, engine=engine)
            dd = time.time() - t0
            rec = float(np.mean(
                [len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)]
            ))
            log(f"probes={probes} {engine}: recall@10={rec:.4f} "
                f"qps={n_q/dd:.0f}")
        del index


if __name__ == "__main__":
    main()
