"""halfvec(1024) inner-product at 10M, sharded (BASELINE config 3 at
its measured-config scale).

A 10M x 1024-d f16 corpus cannot be served from one 16 GB v5e chip:
the f16 store alone is 20.5 GB and the serving sweep's f32 staging is
41 GB. The deployment shape is therefore a v5e-8 slice, 1.25M rows per
chip:

    f16 store          1.25M x 1024 x 2 B  = 2.6 GB
    f32 serving values 1.25M x 1024 x 4 B  = 5.1 GB
    bf16 sweep copy    1.25M x 1024 x 2 B  = 2.6 GB
    neighbors + tables                      ~ 0.3 GB
    total                                   ~10.6 GB / 16 GB chip

Build: per-shard batched device build with dtype=float16 — the scored
values round through the f16 STORE dtype first (reference semantics:
the index scores the stored halfvec value, halfvec.rs:869-880), so
recall contracts match a true halfvec index, not an f32 one.

Serving: SPMD shard_map inner-product sweep (exact, recall 1.0) or
per-shard beam, one all_gather top-k merge over ICI
(parallel/sharded.py — same path as configs/sharded_100m.py).

MEASURED on the real chip (probes/probe_hv125_tpu.py, 2026-08-21):
one 1.25M-row per-chip shard builds at 7,044 vec/s and serves exact
12,753 qps @ recall 1.000 / approx 34,135 qps @ 0.9983 over the full
shard (DeviceBeamScan init 92 ms) — the v5e-8 deployment numbers are
8 of these units behind one all_gather merge. With the f16 store
re-backed at finalize the resident serve footprint is ~3.5 GB/chip
(DESIGN.md 6m), leaving multi-query headroom.

This script validates the exact code path at a harness-executable
scale (8-device virtual CPU mesh, the same mechanism the driver's
dryrun_multichip uses). Scale knobs:

    PGV_HV10M_SCALE  corpus fraction (default 2e-4 -> 2,000 rows)
    PGV_HV10M_DIM    dimension (default 128 for the smoke; 1024 real)
    PGV_HV10M_REAL=1 use the real TPU mesh (v5e-8 slice)

Run: python configs/halfvec_10m.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    if not os.environ.get("PGV_HV10M_REAL"):
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
        except RuntimeError:
            pass
    from jax.sharding import Mesh

    from bench import make_dataset
    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.parallel import ShardedHnswIndex

    scale = float(os.environ.get("PGV_HV10M_SCALE", 2e-4))
    n = max(int(10_000_000 * scale), 1600)
    dim = int(os.environ.get("PGV_HV10M_DIM", 128))
    n_q = 64
    print(f"validating halfvec-10M config at scale {scale}: "
          f"n={n} dim={dim}", flush=True)

    data, queries = make_dataset(n, dim, n_q, seed=31)
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("shard",))

    t0 = time.time()
    idx = ShardedHnswIndex.build(
        data,
        n_shards=8,
        metric="ip",
        dtype=np.float16,
        mesh=mesh,
        method="device" if n >= 160_000 else "host",
        host_graph=n < 160_000,
    )
    print(f"sharded halfvec build: {time.time()-t0:.1f}s", flush=True)
    assert all(s.store.rows.dtype == np.float16 for s in idx.shards)

    # exact SPMD sweep: recall 1.0 vs the f16-stored ground truth
    d, tids = idx.search(queries, 10, SearchParams(ef_search=40),
                         engine="exact")
    assert d.shape == (n_q, 10)
    stored = np.concatenate(
        [np.asarray(s.store.rows[: s.count], dtype=np.float32)
         for s in idx.shards]
    )
    tid_map = np.concatenate(
        [[t[0] for t in s.heap_tids if t] for s in idx.shards]
    )
    gt_local = np.argsort(-(queries.astype(np.float32) @ stored.T),
                          axis=1, kind="stable")[:, :10]
    gt = tid_map[gt_local]
    rec = np.mean([len(set(tids[b]) & set(gt[b])) / 10
                   for b in range(n_q)])
    print(f"exact sweep recall vs f16-stored GT: {rec:.4f}", flush=True)
    assert rec >= 0.999, rec

    # beam path over the sharded sub-graphs
    d_b, tids_b = idx.search(queries, 10, SearchParams(ef_search=40),
                             engine="beam")
    rec_b = np.mean([len(set(tids_b[b]) & set(gt[b])) / 10
                     for b in range(n_q)])
    print(f"beam recall: {rec_b:.4f}", flush=True)
    assert rec_b >= 0.90, rec_b

    # iterative relaxed_order stream with max_scan_tuples
    scan = idx.scan(
        data[5],
        SearchParams(ef_search=40, iterative_scan="relaxed_order",
                     max_scan_tuples=500),
    )
    items = scan.take(10_000)
    dists = [dd for _, dd in items]
    assert dists == sorted(dists), "merged stream must be ordered"
    assert len(items) == min(500, idx.num_tuples)
    print(f"iterative scan: {len(items)} tuples, globally ordered",
          flush=True)
    print("halfvec-10M config code path validated", flush=True)


if __name__ == "__main__":
    main()
