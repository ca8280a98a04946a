"""Measure DeviceBeamScan 044-contract recall vs internal beam width.

Round-3 diagnosis: at 50k rows with selective filters the device beam
scan missed the 044 >=0.99 bar (strict 0.9325-0.985, relaxed-l2-c50
0.985) while the host scan passed. Hypothesis: an internal beam of
exactly ef evicts boundary candidates unexpanded, so later segments
discover nearer items than ones already emitted — strict_order drops
them (scan.rs:801-806) and coverage leaks. A wider internal beam
(emit top-ef only) is the device analog of Algorithm 2's unbounded
to-expand heap.

Run: python probes/probe_beamscan_width.py  (CPU-pinned, ~10 min)
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgvector_rx_tpu.config import SearchParams  # noqa: E402
from pgvector_rx_tpu.index.hnsw import HnswIndex  # noqa: E402

N, NQ, K = 50_000, 20, 20


def expected_sets(data, queries, metric, mask):
    rows = np.flatnonzero(mask)
    d = data[rows].astype(np.float64)
    q = queries.astype(np.float64)
    if metric == "l2":
        dist = np.sqrt(((q[:, None, :] - d[None, :, :]) ** 2).sum(-1))
    else:
        dn = d / np.linalg.norm(d, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        dist = 1.0 - qn @ dn.T
    kth = np.sort(dist, axis=1)[:, K - 1]
    return [set(rows[dist[b] <= kth[b] + 1e-9].tolist()) for b in range(len(q))]


def scan_recall(idx, queries, mask, expected, mode):
    params = SearchParams(ef_search=40, iterative_scan=mode)
    correct = 0
    for b in range(NQ):
        scan = idx.scan(queries[b], params, method="beam", filter_mask=mask)
        got = [tid for tid, _ in scan.take(K)]
        correct += sum(1 for t in got if t in expected[b])
    return correct / (NQ * K)


def main():
    rng = np.random.default_rng(44)
    data = rng.random((N, 3)).astype(np.float32)
    queries = rng.random((NQ, 3)).astype(np.float32)
    t0 = time.time()
    indexes = {
        m: HnswIndex.build(data, metric=m, method="device", seed=45)
        for m in ("l2", "cosine")
    }
    print(f"built 2x50k in {time.time()-t0:.0f}s", flush=True)

    cases = [("l2", 50), ("l2", 500), ("cosine", 50)]
    for mult in (1, 2, 4):
        os.environ["PGV_BEAM_SCAN_WIDTH_MULT"] = str(mult)
        t0 = time.time()
        for metric, c in cases:
            mask = (np.arange(N) % c) == 0
            exp = expected_sets(data, queries, metric, mask)
            for mode in ("strict_order", "relaxed_order"):
                r = scan_recall(indexes[metric], queries, mask, exp, mode)
                flag = "" if r >= 0.99 else "  <-- MISS"
                print(
                    f"width={mult}x {metric} c={c} {mode}: {r:.4f}{flag}",
                    flush=True,
                )
        print(f"  [{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
