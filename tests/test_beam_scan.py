"""Resumable device beam scan (DeviceBeamScan) tests.

The scan.rs:538-577 analog for beam-scale corpora: spilled candidates
seed each resume, an on-device exclusion mask replaces the shared
visited set, and the spill buffer plays the discarded heap's role
(drained one-at-a-time after max_scan_tuples, scan.rs:828-841).
"""

import numpy as np
import pytest

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex

from test_filter import filtered_gt
from test_index import brute_force, recall_at_k


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(51)
    data = rng.random((3000, 12)).astype(np.float32)
    idx = HnswIndex.build(data, metric="l2", method="device", seed=52)
    return idx, data


class TestDeviceBeamScan:
    def test_head_matches_beam_search(self, corpus):
        idx, data = corpus
        q = data[17] + 0.003
        scan = idx.scan(q, SearchParams(ef_search=40), method="beam")
        head = scan.take(10)
        assert head[0][0] == 17
        dists = [d for _, d in head]
        assert dists == sorted(dists)
        gt = brute_force(data, q[None], "l2", 10)
        got = np.array([[t for t, _ in head]])
        assert recall_at_k(got, gt, 10) >= 0.9

    def test_resume_digs_past_ef(self, corpus):
        """take() far past ef forces spilled-candidate resumes; the
        union must keep covering true neighbors (no re-sweep involved:
        each resume is O(ef) device traffic)."""
        idx, data = corpus
        q = data[99]
        params = SearchParams(ef_search=16, iterative_scan="relaxed_order")
        scan = idx.scan(q, params, method="beam")
        out = scan.take(200)
        assert len(out) == 200
        assert scan.scan_stats.resumes >= 1
        tids = {t for t, _ in out}
        assert len(tids) == 200  # exactly-once emission
        gt = brute_force(data, q[None], "l2", 100)[0]
        hit = len(tids & set(gt.tolist())) / 100
        assert hit >= 0.95

    def test_exhausts_everything(self):
        rng = np.random.default_rng(53)
        data = rng.random((600, 8)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="device", seed=54)
        params = SearchParams(
            ef_search=24, iterative_scan="relaxed_order",
            max_scan_tuples=100_000,
        )
        scan = idx.scan(data[5], params, method="beam")
        items = scan.take(10**6)
        tids = [t for t, _ in items]
        assert len(set(tids)) == len(tids)
        # reachability-bounded completeness: HNSW graphs may strand a
        # few elements (the reference tolerates 3/1000, t/016:70)
        assert len(items) >= 0.995 * idx.num_tuples

    def test_strict_order_monotone(self, corpus):
        idx, data = corpus
        params = SearchParams(ef_search=12, iterative_scan="strict_order")
        scan = idx.scan(data[7], params, method="beam")
        out = scan.take(60)
        d = [dd for _, dd in out]
        assert all(b >= a - 1e-12 for a, b in zip(d, d[1:]))

    def test_filtered_iterative_recall(self, corpus):
        """044 analog at the beam engine: selective filter + relaxed
        iterative scan, recall >= 0.99 over 20 queries."""
        idx, data = corpus
        rng = np.random.default_rng(55)
        queries = data[rng.integers(0, len(data), 20)] + 0.002
        mask = (np.arange(len(data)) % 10) == 0
        k = 5
        params = SearchParams(ef_search=40, iterative_scan="relaxed_order")
        got = np.full((20, k), -1, dtype=np.int64)
        for b, q in enumerate(queries):
            scan = idx.scan(q, params, method="beam", filter_mask=mask)
            for j, (tid, _) in enumerate(scan.take(k)):
                got[b, j] = tid
        gt = filtered_gt(data, queries, "l2", k, mask)
        assert recall_at_k(got, gt, k) >= 0.99
        assert all(mask[t] for row in got for t in row if t >= 0)

    def test_budget_accuracy_beam(self, corpus):
        """043 analog at the beam engine: tuple budget is AM-side, so a
        selective filter emits <= matching rows and stops resuming at
        the cap (spill drains one-at-a-time after)."""
        idx, data = corpus
        mask = (np.arange(len(data)) % 500) == 0
        params = SearchParams(
            ef_search=10, iterative_scan="relaxed_order",
            max_scan_tuples=100,
        )
        scan = idx.scan(data[0], params, method="beam", filter_mask=mask)
        out = scan.take(50)
        assert len(out) <= int(mask.sum())
        assert all(mask[t] for t, _ in out)

    def test_serving_only_auto_dispatch(self, monkeypatch):
        """Past the exact cutover a serving-only index's scan(auto)
        must pick the beam scan (the only iterative device engine
        there) — pinned by shrinking the cutover."""
        from pgvector_rx_tpu.graph import device as dm
        from pgvector_rx_tpu.index.scan import DeviceBeamScan

        rng = np.random.default_rng(56)
        data = rng.random((800, 8)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="l2", method="device", host_graph=False, seed=57
        )
        monkeypatch.setattr(dm, "EXACT_ENGINE_MAX_ROWS", 100)
        scan = idx.scan(data[3], SearchParams(ef_search=20))
        assert isinstance(scan, DeviceBeamScan)
        out = scan.take(5)
        assert out[0][0] == 3

    def test_duplicate_tid_emission(self):
        """Duplicate elements emit every absorbed heap TID (10-cap)."""
        rng = np.random.default_rng(58)
        data = rng.random((300, 8)).astype(np.float32)
        data[50:56] = data[42]  # 7 identical rows inc. the original
        idx = HnswIndex.build(data, metric="l2", method="device", seed=59)
        scan = idx.scan(data[42], SearchParams(ef_search=20), method="beam")
        out = scan.take(7)
        zero_tids = {t for t, d in out if d < 1e-6}
        assert zero_tids == {42, 50, 51, 52, 53, 54, 55}
