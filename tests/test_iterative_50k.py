"""Iterative-scan filtered recall at reference scale — the tests/t/044
contract: 50,000 uniform random 3-d rows, 20 uniform queries, filters
`i % c = 0` for c in (50, 500) (2% and 0.2% selectivity), LIMIT 20,
ef_search=40, recall >= 0.99 for BOTH strict_order and relaxed_order
(`tests/t/044_hnsw_iterative_scan_recall.pl:11-13,111-112`), l2 and
cosine opclasses.

Expected sets are tie-aware exactly like the reference's (044:99-104):
every row whose distance <= the 20th-nearest filtered distance counts.

Engines: the host scan (HnswScan — reference Algorithm-5 + resume
semantics) runs the full 044 matrix; the resumable device beam scan
(DeviceBeamScan, the >4M-rows/chip iterative engine) is held to the
same contract on both selectivities for l2 and at 2% for cosine.

Marked slow; deselect with `-m "not slow"`.
"""

import numpy as np
import pytest

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex

N, NQ, K = 50_000, 20, 20

pytestmark = pytest.mark.slow


def _expected_sets(data, queries, metric, mask):
    """Reference 044 GT: all mask rows with distance <= the k-th
    nearest filtered distance (044:99-104's MAX(distance) form)."""
    rows = np.flatnonzero(mask)
    d = data[rows].astype(np.float64)
    q = queries.astype(np.float64)
    if metric == "l2":
        dist = np.sqrt(((q[:, None, :] - d[None, :, :]) ** 2).sum(-1))
    elif metric == "cosine":
        dn = d / np.linalg.norm(d, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        dist = 1.0 - qn @ dn.T
    else:
        raise ValueError(metric)
    kth = np.sort(dist, axis=1)[:, K - 1]
    return [
        set(rows[dist[b] <= kth[b] + 1e-9].tolist()) for b in range(len(q))
    ]


def _scan_recall(idx, queries, mask, expected, mode, method):
    params = SearchParams(ef_search=40, iterative_scan=mode)
    correct = 0
    for b in range(NQ):
        scan = idx.scan(queries[b], params, method=method, filter_mask=mask)
        got = [tid for tid, _ in scan.take(K)]
        correct += sum(1 for t in got if t in expected[b])
    return correct / (NQ * K)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(44)
    data = rng.random((N, 3)).astype(np.float32)  # 044: random() x 3
    queries = rng.random((NQ, 3)).astype(np.float32)
    indexes = {
        m: HnswIndex.build(data, metric=m, method="device", seed=45)
        for m in ("l2", "cosine")
    }
    return indexes, data, queries


class TestIterative044:
    @pytest.mark.parametrize("metric", ["l2", "cosine"])
    @pytest.mark.parametrize("c", [50, 500])
    @pytest.mark.parametrize("mode", ["strict_order", "relaxed_order"])
    def test_host_scan(self, corpus, metric, c, mode):
        indexes, data, queries = corpus
        mask = (np.arange(N) % c) == 0
        expected = _expected_sets(data, queries, metric, mask)
        r = _scan_recall(indexes[metric], queries, mask, expected, mode,
                         "host")
        assert r >= 0.99, f"host {metric} c={c} {mode}: {r}"

    @pytest.mark.parametrize(
        "metric,c",
        [("l2", 50), ("l2", 500), ("cosine", 50)],
    )
    @pytest.mark.parametrize("mode", ["strict_order", "relaxed_order"])
    def test_device_beam_scan(self, corpus, metric, c, mode):
        indexes, data, queries = corpus
        mask = (np.arange(N) % c) == 0
        expected = _expected_sets(data, queries, metric, mask)
        r = _scan_recall(indexes[metric], queries, mask, expected, mode,
                         "beam")
        assert r >= 0.99, f"beam {metric} c={c} {mode}: {r}"
