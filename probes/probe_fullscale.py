"""Diagnose the two red full-scale suites (VERDICT r2 ask #1).

ip @ 3-d: beam 0.945 < 0.97       (exact passes)
sparse @ nnz 5-12: beam 0.71 < 0.95 (exact passes)

Splits "bad graph" from "bad device walk": host Algorithm-5 scan over
the SAME graph vs the device beam, plus seed/ef ablations.
Run on CPU (pins platform before any jax use).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex
from pgvector_rx_tpu.types import SparseVec

import sys
sys.path.insert(
    0,
    _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "tests",
    ),
)
from test_index import brute_force, recall_at_k  # noqa: E402

N, NQ, K = 10_000, 20, 20


def rec(idx, queries, gt, method, ef=40):
    params = SearchParams(ef_search=ef)
    _, ids = idx.search(queries, K, params, method=method)
    return recall_at_k(ids, gt, K)


def case_ip():
    rng = np.random.default_rng(101)
    data = rng.random((N, 3)).astype(np.float32)
    queries = rng.random((NQ, 3)).astype(np.float32)
    idx = HnswIndex.build(data, metric="ip", method="device", seed=102)
    gt = brute_force(data, queries, "ip", K)
    print("ip beam  ef=40 :", rec(idx, queries, gt, "device"))
    print("ip beam  ef=80 :", rec(idx, queries, gt, "device", ef=80))
    print("ip host  ef=40 :", rec(idx, queries, gt, "host"))
    # descent seeding needs a fresh process normally; clear caches here
    os.environ["PGV_BEAM_SEED"] = "descent"
    jax.clear_caches()
    print("ip beam descent:", rec(idx, queries, gt, "device"))
    del os.environ["PGV_BEAM_SEED"]
    jax.clear_caches()


def case_sparse():
    rng = np.random.default_rng(107)
    dim = 1000
    rows = []
    dense = np.zeros((N, dim), dtype=np.float32)
    for i in range(N):
        nnz = int(rng.integers(5, 12))
        ii = np.sort(rng.choice(dim, size=nnz, replace=False)).astype(np.int32)
        vv = (rng.random(nnz) + 0.1).astype(np.float32)
        dense[i, ii] = vv
        rows.append(SparseVec(dim, ii, vv))
    queries = [rows[int(i)] for i in rng.integers(0, N, NQ)]
    qdense = np.stack([r.to_dense() for r in queries])
    idx = HnswIndex.build(rows, metric="l2", seed=108)
    gt = brute_force(dense, qdense, "l2", K)
    print("sp beam  ef=40 :", rec(idx, queries, gt, "device"))
    print("sp beam  ef=80 :", rec(idx, queries, gt, "device", ef=80))
    print("sp host  ef=40 :", rec(idx, queries, gt, "host"))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("ip", "both"):
        case_ip()
    if which in ("sparse", "both"):
        case_sparse()
