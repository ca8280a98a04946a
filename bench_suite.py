"""Extended benchmark suite: BASELINE.json's secondary configs.

Measures, on the real chip:
1. 768-d cosine at 1M — ef_search sweep (recall/QPS curve, beam + sweeps)
2. halfvec(1024) inner-product at 1M (f16 store, bf16 MXU serving)
3. bit(256) hamming at 1M — native build + device popcount sweep
4. sparsevec CSR at 100k — native build + device merge-join sweep

(10M halfvec and the 100M sharded config need more chips than this dev
harness exposes — one v5e with a tunneled host; see parallel/ and
configs/ for the sharded design validated on the virtual CPU mesh.)

Prints one markdown table per config plus JSON lines; reuses saved
indexes under PGV_SUITE_DIR (default /tmp/pgv_suite) across runs.

Run: python bench_suite.py [config...]   (default: all)
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

from bench import make_dataset


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SUITE_DIR = Path(os.environ.get("PGV_SUITE_DIR", "/tmp/pgv_suite"))
#: scale factor for smoke runs (PGV_SUITE_SCALE=0.01 shrinks corpora 100x)
SCALE = float(os.environ.get("PGV_SUITE_SCALE", 1))


def scaled(n):
    return max(int(n * SCALE), 4096)
K = 10


def setup_jax():
    import jax

    cache = os.environ.get("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    log(f"devices: {jax.devices()}")


def recall_of(ids, gt):
    n_q = len(gt)
    return float(
        np.mean([len(set(ids[b]) & set(gt[b])) / K for b in range(n_q)])
    )


def build_or_load(name, builder):
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    # key the checkpoint by scale: a smoke run (PGV_SUITE_SCALE<1) must
    # never satisfy a later full-scale run's load, or the "1M" labels
    # would report a 5k-row index
    path = SUITE_DIR / (name if SCALE == 1 else f"{name}_s{SCALE:g}")
    if path.exists():
        log(f"[{name}] loading checkpoint")
        return HnswIndex.load(path), float("nan")
    t0 = time.time()
    index = builder()
    dt = time.time() - t0
    SUITE_DIR.mkdir(parents=True, exist_ok=True)
    index.save(path)
    return index, dt


def emit(config, rows, build_s, n):
    print(f"\n### {config}")
    print("| engine | recall@10 | qps/chip |")
    print("|---|---|---|")
    for name, rec, qps in rows:
        print(f"| {name} | {rec:.4f} | {qps:,.0f} |")
    if np.isfinite(build_s):
        print(f"build: {build_s:.1f}s = {n / build_s:,.0f} vectors/sec")
    print(
        json.dumps(
            {
                "config": config,
                "build_s": round(build_s, 1),
                "engines": [
                    {"engine": e, "recall": round(r, 4), "qps": round(q)}
                    for e, r, q in rows
                ],
            }
        ),
        flush=True,
    )


def run_cosine_768():
    import jax.numpy as jnp

    from pgvector_rx_tpu.graph import device as device_mod
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    n, dim, n_q = scaled(1_000_000), 768, 4096
    log("[cosine768] generating data...")
    data, queries = make_dataset(n, dim, n_q, seed=5, intrinsic=24)
    index, build_s = build_or_load(
        "cosine768_1m",
        lambda: HnswIndex.build(
            data, metric="cosine", method="device", seed=1, host_graph=False
        ),
    )
    queries_dev = device_mod.prepare_queries(index, jnp.asarray(queries))

    _, gt = device_mod.serve_topk(index, queries_dev, K, engine="exact")
    rows = [("exact", 1.0, measure(index, queries_dev, "exact", gt)[1])]
    rec, qps = measure(index, queries_dev, "approx", gt)
    rows.append(("approx", rec, qps))
    for ef in (10, 40, 100, 400):
        rec, qps = measure(index, queries_dev, "beam", gt, ef=ef)
        rows.append((f"beam(ef={ef})", rec, qps))
    emit("768-d cosine, 1M (BASELINE config 2)", rows, build_s, n)


def measure(index, queries_dev, engine, gt, ef=40):
    from pgvector_rx_tpu.graph import device as device_mod

    device_mod.serve_topk(index, queries_dev, K, engine=engine, ef=ef)  # warm
    t0 = time.time()
    _, ids = device_mod.serve_topk(index, queries_dev, K, engine=engine, ef=ef)
    dt = time.time() - t0
    return recall_of(ids, gt), len(gt) / dt


def run_halfvec_1024():
    import jax.numpy as jnp

    from pgvector_rx_tpu.graph import device as device_mod
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    n, dim, n_q = scaled(1_000_000), 1024, 4096
    log("[halfvec1024] generating data...")
    data, queries = make_dataset(n, dim, n_q, seed=6, intrinsic=32)
    index, build_s = build_or_load(
        "halfvec1024_1m_ip",
        lambda: HnswIndex.build(
            data,
            metric="ip",
            method="device",
            seed=1,
            dtype=np.float16,
            host_graph=False,
        ),
    )
    queries_dev = jnp.asarray(queries)
    from pgvector_rx_tpu.graph.device import serve_topk

    _, gt = serve_topk(index, queries_dev, K, engine="exact")
    rows = [("exact", 1.0, measure(index, queries_dev, "exact", gt)[1])]
    rec, qps = measure(index, queries_dev, "approx", gt)
    rows.append(("approx", rec, qps))
    rec, qps = measure(index, queries_dev, "beam", gt, ef=40)
    rows.append(("beam(ef=40)", rec, qps))
    emit("halfvec(1024) f16 inner-product, 1M (BASELINE config 3)", rows, build_s, n)


def run_bit_256():
    import jax
    import jax.numpy as jnp

    from pgvector_rx_tpu.graph import device as device_mod
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    n, nbits, n_q = scaled(1_000_000), 256, 4096
    log("[bit256] generating data...")
    # binary-quantized embeddings: sign bits of manifold data
    dense, dq = make_dataset(n, nbits, n_q, seed=7, intrinsic=24)
    bits = (dense > 0).astype(np.uint8)
    qbits = (dq > 0).astype(np.uint8)
    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.ops.bits import pack_bits

    qwords = jnp.asarray(pack_bits(qbits))
    for metric in ("hamming", "jaccard"):
        index, build_s = build_or_load(
            f"bit256_1m_{metric}",
            lambda: HnswIndex.build(bits, metric=metric, seed=1),
        )
        g = index.device_graph()
        # exact MXU bit sweep (unpack + matmul; the serving engine for bit)
        d, gt_ids = device_mod._exact_search_bits(g, qwords, K)
        gt = np.asarray(gt_ids)
        rows = []
        for engine, approx in (("exact MXU sweep", False),
                               ("approx (approx_min_k select)", True)):
            d, ids = device_mod._exact_search_bits(g, qwords, K, approx=approx)
            np.asarray(ids)  # warm compile
            t0 = time.time()
            d, ids = device_mod._exact_search_bits(g, qwords, K, approx=approx)
            ids = np.asarray(ids)
            dt = time.time() - t0
            rows.append((engine, recall_of(ids, gt), n_q / dt))
        # HNSW beam over the (device-built) bit graph
        nq_b = min(n_q, 1024)
        params = SearchParams(ef_search=40)
        index.search(qbits[:nq_b], K, params, method="device")  # warm
        t0 = time.time()
        d, tids = index.search(qbits[:nq_b], K, params, method="device")
        dt = time.time() - t0
        rows.append(
            ("beam(ef=40)", recall_of(np.asarray(tids), gt[:nq_b]), nq_b / dt)
        )
        emit(f"bit(256) {metric}, 1M (BASELINE config 4a)", rows, build_s, n)


def run_sparse():
    import jax.numpy as jnp

    from pgvector_rx_tpu.graph import device as device_mod
    from pgvector_rx_tpu.index.hnsw import HnswIndex
    from pgvector_rx_tpu.types import SparseVec

    n, dim, n_q, nnz = scaled(100_000), 30_000, 1024, 64
    log("[sparse] generating power-law data...")
    rng = np.random.default_rng(9)
    # power-law index popularity (BM25/SPLADE-like overlap structure)
    pop = (1.0 / np.arange(1, dim + 1)) ** 0.7
    pop /= pop.sum()
    rows = []
    for _ in range(n):
        ii = np.unique(rng.choice(dim, size=nnz, p=pop)).astype(np.int32)
        rows.append(
            SparseVec(dim, ii, rng.random(len(ii)).astype(np.float32) + 0.1)
        )
    queries = rows[:n_q]
    index, build_s = build_or_load(
        "sparse_100k", lambda: HnswIndex.build(rows, metric="l2", seed=1)
    )
    g = index.device_graph()
    qp = device_mod.prepare_queries(index, queries)
    d, gt_ids = device_mod._exact_search_sparse(g, qp[0], qp[1], K, dim=dim)
    gt = np.asarray(gt_ids)
    t0 = time.time()
    d, ids = device_mod._exact_search_sparse(g, qp[0], qp[1], K, dim=dim)
    ids = np.asarray(ids)
    dt = time.time() - t0
    rows_out = [
        ("exact sweep (densified-corpus MXU)", recall_of(ids, gt), n_q / dt)
    ]
    d, ids = device_mod._exact_search_sparse(
        g, qp[0], qp[1], K, dim=dim, approx=True
    )  # warm
    t0 = time.time()
    d, ids = device_mod._exact_search_sparse(
        g, qp[0], qp[1], K, dim=dim, approx=True
    )
    ids = np.asarray(ids)
    dt = time.time() - t0
    rows_out.append(("approx sweep (bf16 MXU)", recall_of(ids, gt), n_q / dt))
    # graph path (host scan parity at serving scale is the device beam)
    from pgvector_rx_tpu.config import SearchParams

    t0 = time.time()
    dd, tids = index.search(
        queries[:256], K, SearchParams(ef_search=40), method="device"
    )
    dt = time.time() - t0
    rows_out.append(
        ("hnsw beam (sparse)", recall_of(np.asarray(tids), gt[:256]), 256 / dt)
    )
    emit("sparsevec CSR l2, 100k x 30k-d (BASELINE config 4b)", rows_out, build_s, n)


ALL = {
    "cosine768": run_cosine_768,
    "halfvec1024": run_halfvec_1024,
    "bit256": run_bit_256,
    "sparse": run_sparse,
}

if __name__ == "__main__":
    setup_jax()
    which = sys.argv[1:] or list(ALL)
    for name in which:
        t0 = time.time()
        ALL[name]()
        log(f"[{name}] done in {time.time()-t0:.0f}s")
