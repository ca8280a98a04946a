"""Filtered search (attribute-filtering analog).

The reference gets attribute filtering from the PostgreSQL executor:
the AM streams candidates (iterative scan re-entering the graph when
results run dry, scan.rs:538-577) and the executor drops non-matching
tuples; recall under selective filters is contract-tested by
tests/t/043 (max_scan_tuples budgeting) and tests/t/044 (filtered
recall >= 0.99 strict & relaxed).

Here the filter is first-class: ``search(filter_mask=...)``.
- device exact/approx engines apply the mask INSIDE the MXU sweep
  (pre-filtering: recall 1.0 over the subset at any selectivity);
- the host scan path and the device beam post-filter emissions under
  the same tuple budget as the reference.
"""

import numpy as np
import pytest

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex
from pgvector_rx_tpu.types import SparseVec

from test_index import brute_force, recall_at_k


def filtered_gt(data, queries, metric, k, mask):
    """Exact top-k restricted to mask-True rows (global row ids)."""
    rows = np.flatnonzero(mask)
    gt_local = brute_force(data[rows], queries, metric, k)
    return rows[gt_local]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    data = rng.random((1500, 12)).astype(np.float32)
    queries = rng.random((20, 12)).astype(np.float32)
    idx = HnswIndex.build(data, metric="l2", method="host", seed=3)
    return idx, data, queries


def test_exact_filter_recall_1(corpus):
    idx, data, queries = corpus
    mask = (np.arange(len(data)) % 7) == 0
    k = 5
    _, ids = idx.search(queries, k, method="exact", filter_mask=mask)
    gt = filtered_gt(data, queries, "l2", k, mask)
    assert recall_at_k(ids, gt, k) == 1.0
    assert all(mask[i] for row in ids for i in row if i >= 0)


def test_approx_filter_subset(corpus):
    idx, data, queries = corpus
    mask = (np.arange(len(data)) % 3) == 1
    _, ids = idx.search(queries, 5, method="approx", filter_mask=mask)
    assert all(mask[i] for row in ids for i in row if i >= 0)
    gt = filtered_gt(data, queries, "l2", 5, mask)
    assert recall_at_k(ids, gt, 5) >= 0.9


def test_host_scan_filter_iterative_recall(corpus):
    """044 analog: selective filter + relaxed iterative scan, recall>=0.99."""
    idx, data, queries = corpus
    mask = (np.arange(len(data)) % 10) == 0  # 10% selectivity
    k = 5
    params = SearchParams(ef_search=40, iterative_scan="relaxed_order")
    _, ids = idx.search(
        queries, k, params, method="host", filter_mask=mask
    )
    gt = filtered_gt(data, queries, "l2", k, mask)
    assert recall_at_k(ids, gt, k) >= 0.99
    assert all(mask[i] for row in ids for i in row if i >= 0)


def test_host_scan_filter_strict_order(corpus):
    idx, data, queries = corpus
    mask = (np.arange(len(data)) % 10) == 3
    params = SearchParams(ef_search=40, iterative_scan="strict_order")
    dists, ids = idx.search(
        queries, 5, params, method="host", filter_mask=mask
    )
    for b in range(len(queries)):
        d = dists[b][np.isfinite(dists[b])]
        assert (np.diff(d) >= -1e-12).all()  # monotone emission
        assert all(mask[i] for i in ids[b] if i >= 0)


def test_filter_max_scan_tuples_budget(corpus):
    """043 analog: the tuple budget is AM-side — masked elements consume
    it, so a selective filter yields ~max_scan_tuples * selectivity."""
    idx, data, queries = corpus
    mask = (np.arange(len(data)) % 500) == 0  # 3 matching rows
    params = SearchParams(
        ef_search=10,
        iterative_scan="relaxed_order",
        max_scan_tuples=100,
    )
    scan = idx.scan(queries[0], params, method="host", filter_mask=mask)
    out = scan.take(50)
    # budget: <= max_scan_tuples emitted AM-side, plus the one-at-a-time
    # discarded drain after the cap (scan.rs:828-841)
    assert len(out) <= int(mask.sum())
    assert all(mask[tid] for tid, _ in out)


def test_no_filter_unchanged(corpus):
    idx, data, queries = corpus
    d0, i0 = idx.search(queries, 5, method="exact")
    d1, i1 = idx.search(queries, 5, method="exact", filter_mask=None)
    assert (i0 == i1).all()


def test_beam_filter_subset(corpus):
    idx, data, queries = corpus
    mask = (np.arange(len(data)) % 2) == 0  # permissive: beam post-filter
    params = SearchParams(ef_search=60)
    _, ids = idx.search(
        queries, 5, params, method="device", filter_mask=mask
    )
    assert all(mask[i] for row in ids for i in row if i >= 0)
    gt = filtered_gt(data, queries, "l2", 5, mask)
    assert recall_at_k(ids, gt, 5) >= 0.9


def test_serve_topk_filter(corpus):
    import jax.numpy as jnp

    from pgvector_rx_tpu.graph import device as device_mod

    idx, data, queries = corpus
    mask = (np.arange(len(data)) % 5) == 0
    qd = jnp.asarray(queries)
    for engine in ("exact", "approx"):
        _, ids = device_mod.serve_topk(
            idx, qd, 5, engine=engine, filter_mask=mask
        )
        assert all(mask[i] for row in ids for i in row if i >= 0)
    gt = filtered_gt(data, queries, "l2", 5, mask)
    _, ids = device_mod.serve_topk(idx, qd, 5, engine="exact", filter_mask=mask)
    assert recall_at_k(ids, gt, 5) == 1.0


def test_bit_filter():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, size=(400, 64)).astype(np.uint8)
    queries = bits[rng.integers(0, 400, size=8)]
    idx = HnswIndex.build(bits, metric="hamming", method="host", seed=2)
    mask = (np.arange(400) % 4) == 0
    _, ids = idx.search(queries, 5, method="exact", filter_mask=mask)
    assert all(mask[i] for row in ids for i in row if i >= 0)
    gt = filtered_gt(bits, queries, "hamming", 5, mask)
    # hamming has massive distance ties; subset membership + high overlap
    assert recall_at_k(ids, gt, 5) >= 0.6


def test_sharded_filter_exact_and_beam():
    """Filtered SPMD search: tid-keyed mask, pre-filtered exact sweep
    (recall 1.0 over the subset) + post-filtered beam."""
    from pgvector_rx_tpu.parallel import ShardedHnswIndex

    rng = np.random.default_rng(21)
    data = rng.random((800, 12)).astype(np.float32)
    queries = rng.random((10, 12)).astype(np.float32)
    sharded = ShardedHnswIndex.build(
        data, n_shards=4, metric="l2", method="host", seed=5
    )
    mask = (np.arange(len(data)) % 6) == 0
    k = 5
    _, ids = sharded.search(queries, k, engine="exact", filter_mask=mask)
    gt = filtered_gt(data, queries, "l2", k, mask)
    assert recall_at_k(ids, gt, k) == 1.0
    assert all(mask[i] for row in ids for i in row if i >= 0)

    params = SearchParams(ef_search=60)
    _, ids_b = sharded.search(
        queries, k, params, engine="beam", filter_mask=mask
    )
    assert all(mask[i] for row in ids_b for i in row if i >= 0)
    # unfiltered still works after a filtered call (separate program)
    _, ids_u = sharded.search(queries, k, engine="exact")
    gt_u = brute_force(data, queries, "l2", k)
    assert recall_at_k(ids_u, gt_u, k) == 1.0


def test_sparse_filter():
    rng = np.random.default_rng(9)
    dim, n = 300, 300
    rows = []
    for _ in range(n):
        nnz = rng.integers(3, 9)
        ii = np.sort(rng.choice(dim, size=nnz, replace=False)).astype(np.int32)
        vv = rng.random(nnz).astype(np.float32) + 0.1
        rows.append(SparseVec(dim, ii, vv))
    idx = HnswIndex.build(rows, metric="l2", method="host", seed=4)
    mask = (np.arange(n) % 3) == 0
    q = rows[:6]
    _, ids = idx.search(q, 4, method="exact", filter_mask=mask)
    assert all(mask[i] for row in ids for i in row if i >= 0)
