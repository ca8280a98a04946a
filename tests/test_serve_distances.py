"""Device-sweep distance-value parity per metric.

The serving sweeps compute penalty-folded ORDER scores (graph/device.py
_exact_scores) and restore true operator distances only on the final
[B, k] columns (_true_dists). These tests pin that reconstruction per
metric against float64 brute force — including the chunked l1 path and
deleted-row sentinels (vacuum'd elements must stay inf/-1, not leak a
clamped finite cosine distance).

Reference behavior: scan.rs:794-815 emission of true operator
distances; vacuum.rs:655-793 deleted elements never surface.
"""

import numpy as np
import pytest

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex

from test_index import brute_force


def _dist_matrix(data, queries, metric):
    d = data.astype(np.float64)
    q = queries.astype(np.float64)
    if metric == "l2":
        return ((q[:, None, :] - d[None, :, :]) ** 2).sum(-1)
    if metric == "ip":
        return -(q @ d.T)
    if metric == "cosine":
        dn = d / np.linalg.norm(d, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        return 1.0 - qn @ dn.T
    return np.abs(q[:, None, :] - d[None, :, :]).sum(-1)  # l1


def _build(metric, n=600, dim=8, seed=11):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HnswIndex.build(data, metric=metric, method="host", seed=seed)
    queries = rng.standard_normal((8, dim)).astype(np.float32)
    return idx, data, queries


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "l1"])
@pytest.mark.parametrize("engine", ["exact", "approx"])
def test_device_sweep_true_distances(metric, engine):
    idx, data, queries = _build(metric)
    gt = brute_force(data, queries, metric, 5)
    d, ids = idx.search(
        queries, 5, SearchParams(ef_search=40), method=engine,
    )
    # ids exactness only for the exact engine; distances checked for
    # whichever ids came back
    if engine == "exact":
        assert np.mean(
            [len(set(ids[b]) & set(gt[b])) / 5 for b in range(len(gt))]
        ) == 1.0
    ref = _dist_matrix(data, queries, metric)
    for b in range(len(queries)):
        for j in range(5):
            true = ref[b, ids[b, j]]
            if metric == "l2":  # operator domain: true euclidean
                true = np.sqrt(max(true, 0.0))
            assert d[b, j] == pytest.approx(true, rel=1e-4, abs=1e-5)


def test_l1_chunked_path_distances():
    # l1 direct-difference scoring chunks above 2048 rows — cover the
    # chunked merge + _true_dists passthrough
    idx, data, queries = _build("l1", n=2100, dim=4, seed=3)
    d, ids = idx.search(queries, 5, method="exact")
    ref = _dist_matrix(data, queries, "l1")
    for b in range(len(queries)):
        for j in range(5):
            assert d[b, j] == pytest.approx(
                ref[b, ids[b, j]], rel=1e-4, abs=1e-5
            )
    gt = brute_force(data, queries, "l1", 5)
    assert np.mean(
        [len(set(ids[b]) & set(gt[b])) / 5 for b in range(len(gt))]
    ) == 1.0


def test_cosine_deleted_rows_stay_hidden():
    # cosine's _true_dists clamps via 1-clip(-s): an inf dead-row
    # sentinel must survive (not become a finite 2.0) so deleted
    # elements never surface
    idx, data, queries = _build("cosine", n=40, dim=6, seed=5)
    q = data[7:8]
    # delete everything except 3 rows, then ask for more than remain
    keep = {2, 9, 17}
    idx.delete([t for t in range(40) if t not in keep])
    idx.vacuum()
    d, ids = idx.search(q, 10, method="exact")
    got = {int(t) for t in ids[0] if t >= 0}
    assert got == keep
    pad = ids[0] < 0
    assert pad.sum() == 7
    assert np.all(np.isinf(d[0][pad]))
    assert np.all(d[0][~pad] < 2.0 + 1e-6)
