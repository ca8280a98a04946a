"""100M-vector sharded HNSW on a v5e-8 slice (BASELINE config 5).

The real deployment target: 100M x 128-d f32 vectors partitioned
round-robin into 8 shards of 12.5M, one shard per chip of a v5e-8
slice (16 GB HBM each).

Per-chip memory budget (12.5M rows):
    values f32        12.5M x 128 x 4 B   = 6.4 GB
    values bf16 copy  12.5M x 128 x 2 B   = 3.2 GB
    neighbors0        12.5M x 32 x 4 B    = 1.6 GB
    upper layers      ~12.5M/16 x 8 x 16 x 4 B ~ 0.4 GB
    masks/tids/x2     ~0.2 GB
    total             ~11.8 GB  (fits 16 GB with serving headroom)

MEASURED on the real chip (probes/probe_shard125_tpu.py, 2026-08-21):
one full 12.5M-row shard built on-device at 9,389-9,910 vec/s
(compile-inclusive) and served over all 12.5M rows at exact 1,595 qps
@ recall 1.000 / approx 21,990 qps @ 1.000 / beam(ef=40) 17,152 @
0.924 — the per-shard claim below is measurement, not extrapolation.
The serving sweeps' chunked score transients fit next to the ~12.2 GB
resident arrays. The resumable per-shard beam scan does NOT fit
beside the full-precision f32+bf16 value pair at 12.5M rows (measured
OOM, DESIGN.md 6l) — iterative-scan deployments set
PGV_SERVE_DTYPE=bf16 PGV_SERVE_REBIND_LOSSY=1 per shard (one 3.35 GB
value array, distances exact w.r.t. the bf16-rounded store), which
the sweep engines use unchanged. The second knob acknowledges the
trade explicitly: the shard's resident store becomes the bf16-rounded
rows, so a save() of the shard persists rounded vectors (r5 ADVICE
fix — without it the f32 buffer is kept and the pair does not fit). Measured at 12.5M under bf16: build 9,188 vec/s,
DeviceBeamScan init 111 ms / next 2.4 ms / per-resume segment 95 ms
(DESIGN.md 6l).

Build: per-shard batched device build (each shard's arrays placed on
its own chip via ShardedHnswIndex.build(..., host_graph=False)); the
8 builds are independent (no cross-chip traffic until serving).

Serving: SPMD shard_map search — each chip sweeps or beams its own
partition, one all_gather of per-shard top-k over ICI, local merge
(parallel/sharded.py). The iterative relaxed_order path is
ShardedHnswIndex.scan(): per-shard exactly-ordered streams + k-way
merge, max_scan_tuples capping the merged stream.

This script validates the EXACT code path of that deployment at a
scale the current harness can execute (the dev harness exposes one
tunneled TPU chip; the mesh here is the 8-device virtual CPU mesh, the
same mechanism the driver's dryrun_multichip uses). Scale knobs:

    PGV_100M_SCALE  corpus fraction (default 2e-5 -> 2,000 rows)
    JAX devices     8 via jax.config (set before jax init)

Run: python configs/sharded_100m.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    # default: validate on the 8-device virtual CPU mesh (the backend
    # locks its platform on first query, so pin BEFORE any jax call);
    # on a real v5e-8 slice set PGV_100M_REAL=1 to use the TPU mesh
    if not os.environ.get("PGV_100M_REAL"):
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
        except RuntimeError:
            pass
    from jax.sharding import Mesh

    from bench import make_dataset
    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.parallel import ShardedHnswIndex

    scale = float(os.environ.get("PGV_100M_SCALE", 2e-5))
    n = max(int(100_000_000 * scale), 1600)
    n_q = 64
    dim = 128
    print(f"validating 100M config at scale {scale}: n={n}", flush=True)

    data, queries = make_dataset(n, dim, n_q, seed=11)
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("shard",))

    # per-shard-STREAMED input (the 100M deployment path): each shard's
    # partition is produced on demand — at full scale this would read
    # from the embedding producer / sharded files, and no process ever
    # holds the 51 GB corpus. Here the demo source is the in-memory
    # array, sliced as zero-copy strided views.
    def part(s, n_shards):
        return data[s::n_shards]

    def part_ids(s, n_shards):
        return np.arange(s, n, n_shards)

    # PGV_100M_METHOD=native: per-shard C++ build + flat serving
    # export — the engine that makes >=5M total rows executable on a
    # 1-core CPU host (the XLA-CPU device build runs ~340 rows/s total
    # there, DESIGN.md 6o); PGV_100M_CKPT=<dir>: per-shard build
    # checkpoints (a timeout leaves completed shards behind; a rerun
    # resumes from them).
    method = os.environ.get(
        "PGV_100M_METHOD",
        "device" if n >= 160_000 else "host",
    )
    t0 = time.time()
    idx = ShardedHnswIndex.build(
        part,
        n_shards=8,
        metric="l2",
        ids=part_ids,
        mesh=mesh,
        method=method,
        host_graph=method == "host",
        checkpoint_dir=os.environ.get("PGV_100M_CKPT"),
    )
    print(f"sharded build: {time.time()-t0:.1f}s", flush=True)

    # SPMD batch search (all_gather merge over the mesh)
    d, tids = idx.search(queries, 10, SearchParams(ef_search=40))
    assert d.shape == (n_q, 10)

    # recall vs chunked brute force (exact engine is recall-1.0 by
    # construction; the beam engine exercises the 100M serving path)
    gt_d = np.full((n_q, 10), np.inf, dtype=np.float32)
    gt_i = np.full((n_q, 10), -1, dtype=np.int64)
    for s0 in range(0, n, 1_000_000):
        blk = data[s0 : s0 + 1_000_000]
        d2 = (
            (queries**2).sum(1)[:, None]
            - 2.0 * queries @ blk.T
            + (blk**2).sum(1)[None, :]
        )
        cand = np.argpartition(d2, 9, axis=1)[:, :10]
        cd = np.take_along_axis(d2, cand, axis=1)
        all_d = np.concatenate([gt_d, cd], axis=1)
        all_i = np.concatenate([gt_i, cand + s0], axis=1)
        sel = np.argsort(all_d, axis=1)[:, :10]
        gt_d = np.take_along_axis(all_d, sel, axis=1)
        gt_i = np.take_along_axis(all_i, sel, axis=1)
    rec = np.mean(
        [len(set(tids[b]) & set(gt_i[b])) / 10 for b in range(n_q)]
    )
    print(f"search recall@10 vs brute force: {rec:.4f}", flush=True)
    t0 = time.time()
    _, tids_b = idx.search(
        queries, 10, SearchParams(ef_search=40), engine="beam"
    )
    rec_b = np.mean(
        [len(set(tids_b[b]) & set(gt_i[b])) / 10 for b in range(n_q)]
    )
    print(
        f"beam-engine recall@10: {rec_b:.4f} "
        f"({time.time()-t0:.1f}s for {n_q} queries)",
        flush=True,
    )
    gt_self = idx.search(data[:16], 1)[1][:, 0]
    print(f"self-hit: {(gt_self == np.arange(16)).mean():.2f}", flush=True)

    # iterative relaxed_order scan with max_scan_tuples (the filtered
    # path of BASELINE config 5)
    scan = idx.scan(
        data[5],
        SearchParams(
            ef_search=40,
            iterative_scan="relaxed_order",
            max_scan_tuples=500,
        ),
    )
    items = scan.take(10_000)
    dists = [dd for _, dd in items]
    assert dists == sorted(dists), "merged stream must be ordered"
    assert len(items) == min(500, idx.num_tuples)
    print(
        f"iterative scan: {len(items)} tuples, globally ordered; "
        f"head tid={items[0][0]}",
        flush=True,
    )
    print("100M-config code path validated", flush=True)


if __name__ == "__main__":
    main()
