"""ScanStats wiring tests (EXPLAIN ANALYZE / pgstat-counters analog).

The reference's observable surface is pgstat scan counting
(scan.rs:718-729); SURVEY §5 asks for distances computed / nodes
visited / resume count. These tests pin that the counters are actually
populated on every scan engine.
"""

import numpy as np
import pytest

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.constants import HNSW_ITERATIVE_SCAN_RELAXED
from pgvector_rx_tpu.index.hnsw import HnswIndex


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(7)
    data = rng.standard_normal((400, 8)).astype(np.float32)
    idx = HnswIndex.build(data, metric="l2", method="host")
    return idx, data


class TestHostScanStats:
    def test_basic_scan_counts(self, small_index):
        idx, data = small_index
        scan = idx.scan(data[3], SearchParams(ef_search=16), method="host")
        out = scan.take(10)
        assert len(out) == 10
        st = scan.scan_stats
        assert st.tuples_returned == 10
        assert st.distances_computed > 0
        assert st.nodes_visited > 0
        assert st.resumes == 0

    def test_iterative_resume_counts(self, small_index):
        idx, data = small_index
        params = SearchParams(
            ef_search=4, iterative_scan=HNSW_ITERATIVE_SCAN_RELAXED,
            max_scan_tuples=100,
        )
        scan = idx.scan(data[3], params, method="host")
        out = scan.take(60)  # far past ef=4: forces resume re-entries
        assert len(out) == 60
        assert scan.scan_stats.resumes >= 1
        assert scan.scan_stats.nodes_visited > 4

    def test_batch_search_aggregates(self, small_index):
        idx, data = small_index
        idx.search(data[:3], 5, SearchParams(), method="host")
        st = idx.last_scan_stats
        assert st is not None
        assert st.tuples_returned == 15
        assert st.distances_computed > 0


class TestDeviceScanStats:
    def test_device_scan_counts(self, small_index):
        idx, data = small_index
        scan = idx.scan(data[5], SearchParams(ef_search=8), method="device")
        out = scan.take(40)  # past the first block: forces a refetch
        assert len(out) == 40
        st = scan.scan_stats
        assert st.tuples_returned == 40
        # every exact block sweeps all stored rows
        assert st.distances_computed >= idx.store.count
        assert st.resumes >= 1

    def test_device_search_stats_gated(self, small_index, monkeypatch):
        idx, data = small_index
        idx.last_scan_stats = None
        monkeypatch.setenv("PGV_SCAN_STATS", "0")
        idx.search(data[:4], 5, SearchParams(), method="exact")
        assert idx.last_scan_stats is None  # gated off by default

        monkeypatch.setenv("PGV_SCAN_STATS", "1")
        idx.search(data[:4], 5, SearchParams(), method="exact")
        st = idx.last_scan_stats
        assert st is not None
        assert st.distances_computed == 4 * len(idx.elements)

    def test_device_beam_steps(self, small_index, monkeypatch):
        idx, data = small_index
        monkeypatch.setenv("PGV_SCAN_STATS", "1")
        idx.search(data[:4], 5, SearchParams(ef_search=12), method="device")
        st = idx.last_scan_stats
        assert st is not None
        assert st.beam_steps > 0
        assert st.distances_computed > 0
