"""Benchmark: QPS/chip at recall@10 >= 0.95 (BASELINE.json headline).

Builds a dense f32 L2 HNSW index on SIFT-like clustered synthetic data
(128-d; SIFT1M itself is not fetchable in this zero-egress image) with
the batched device build, then sweeps ef_search for the smallest setting
reaching recall@10 >= 0.95 against exact brute-force ground truth, and
measures steady-state batched query throughput there.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 20000 (BASELINE.md: >= 20k QPS/chip target).

Env knobs: PGV_BENCH_N (default 100000), PGV_BENCH_Q (1000 queries),
PGV_BENCH_BATCH (512), PGV_BENCH_DIM (128).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_sift_like(n, d, seed=0, n_clusters=1000):
    """Clustered synthetic data approximating SIFT's local structure."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    data = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    return data.astype(np.float32)


def brute_force_gt(data, queries, k, tile=200_000):
    import jax
    import jax.numpy as jnp

    from pgvector_rx_tpu.ops.distances import pairwise

    q = jnp.asarray(queries)
    best_d = None
    best_i = None
    for start in range(0, len(data), tile):
        chunk = jnp.asarray(data[start : start + tile])
        d = pairwise("l2", chunk, q)  # [B, tile]
        neg, idx = jax.lax.top_k(-d, k)
        d_k, i_k = -neg, idx + start
        if best_d is None:
            best_d, best_i = d_k, i_k
        else:
            cat_d = jnp.concatenate([best_d, d_k], axis=1)
            cat_i = jnp.concatenate([best_i, i_k], axis=1)
            neg, sel = jax.lax.top_k(-cat_d, k)
            best_d = -neg
            best_i = jnp.take_along_axis(cat_i, sel, axis=1)
    return np.asarray(best_i)


def main():
    n = int(os.environ.get("PGV_BENCH_N", 100_000))
    n_q = int(os.environ.get("PGV_BENCH_Q", 1000))
    batch = int(os.environ.get("PGV_BENCH_BATCH", 1024))
    dim = int(os.environ.get("PGV_BENCH_DIM", 128))
    k = 10

    import jax

    # persistent compilation cache: repeat runs skip the (minutes-long)
    # XLA compiles of the build/search programs
    cache_dir = os.environ.get("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    log(f"devices: {jax.devices()}")
    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.graph import device as device_mod
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    log(f"generating {n}x{dim} SIFT-like data...")
    data = make_sift_like(n, dim)
    queries = make_sift_like(n_q, dim, seed=99) if False else None
    # queries: perturbed database points (standard recall protocol)
    rng = np.random.default_rng(99)
    qsel = rng.integers(0, n, size=n_q)
    queries = data[qsel] + 0.3 * rng.standard_normal((n_q, dim)).astype(np.float32)

    log("computing brute-force ground truth on device...")
    t0 = time.time()
    gt = brute_force_gt(data, queries, k)
    log(f"  gt in {time.time()-t0:.1f}s")

    log("building index (batched device build)...")
    t0 = time.time()
    index = HnswIndex.build(data, metric="l2", method="device", seed=1)
    build_s = time.time() - t0
    build_rate = n / build_s
    log(f"  build: {build_s:.1f}s = {build_rate:.0f} vectors/sec")

    g = index.device_graph()
    emit_tid = np.asarray(g.emit_tid)

    expand = int(os.environ.get("PGV_BENCH_EXPAND", 4))

    def run_queries(ef):
        """Batched device search over all queries; returns (ids, qps)."""
        max_steps = 4 * ef + 32
        out = np.full((n_q, k), -1, dtype=np.int64)
        # warmup/compile
        qb = device_mod.prepare_query_matrix(index, queries[:batch])
        device_mod._search_batch(
            g, qb, ef, g.entry_level, max_steps, expand
        )[0].block_until_ready()
        t0 = time.time()
        for start in range(0, n_q, batch):
            q = queries[start : start + batch]
            if len(q) < batch:  # pad to keep one compiled shape
                q = np.concatenate([q, np.zeros((batch - len(q), dim), np.float32)])
            qb = device_mod.prepare_query_matrix(index, q)
            beam_d, beam_ids, _ = device_mod._search_batch(
                g, qb, ef, g.entry_level, max_steps, expand
            )
            ids = np.asarray(beam_ids)[: min(batch, n_q - start), :k]
            out[start : start + ids.shape[0]] = np.where(
                ids >= 0, emit_tid[np.maximum(ids, 0)], -1
            )
        dt = time.time() - t0
        return out, n_q / dt

    result = None
    for ef in (10, 20, 40, 64, 100, 150, 250, 400):
        ids, qps = run_queries(max(ef, k))
        recall = np.mean(
            [len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)]
        )
        log(f"  ef={ef}: recall@10={recall:.4f}  qps={qps:.0f}")
        if recall >= 0.95:
            result = (ef, recall, qps)
            break
    if result is None:
        result = (400, recall, qps)

    ef, recall, qps = result
    log(
        f"RESULT: N={n} ef={ef} recall@10={recall:.4f} qps/chip={qps:.0f} "
        f"build={build_rate:.0f} vec/s"
    )
    print(
        json.dumps(
            {
                "metric": f"qps_per_chip_at_recall10>=0.95 (N={n}, d={dim}, l2; "
                f"build={build_rate:.0f} vec/s, recall={recall:.4f}, ef={ef})",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 20000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
