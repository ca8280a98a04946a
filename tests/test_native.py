"""Native (C++) host engine tests: parity with the Python engine."""

import numpy as np
import pytest

from pgvector_rx_tpu import native
from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex

from test_index import brute_force, recall_at_k

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable (no g++?)"
)


class TestNativeParity:
    def test_bitexact_graph_on_integer_data(self):
        """Integer-valued f32 sums are exact, so the two engines must
        produce identical graphs (same RNG seed => same levels)."""
        rng = np.random.default_rng(7)
        data = rng.integers(0, 50, size=(400, 8)).astype(np.float32)
        a = HnswIndex.build(data, metric="l2", method="host", seed=7)
        b = HnswIndex.build(data, metric="l2", method="native", seed=7)
        assert a.entry == b.entry
        assert a.heap_tids == b.heap_tids
        for ae, be in zip(a.elements, b.elements):
            assert ae.level == be.level
            assert ae.neighbors == be.neighbors

    def test_native_vacuum_parity_on_integer_data(self, monkeypatch):
        """Native vacuum repair must produce the same graph as the
        Python repair (integer data -> exact f32 distances)."""
        rng = np.random.default_rng(11)
        data = rng.integers(0, 50, size=(400, 8)).astype(np.float32)
        dead = list(range(0, 400, 3))

        a = HnswIndex.build(data, metric="l2", method="host", seed=9)
        monkeypatch.setenv("PGV_DISABLE_NATIVE", "1")
        a.delete(dead)
        monkeypatch.delenv("PGV_DISABLE_NATIVE")

        b = HnswIndex.build(data, metric="l2", method="host", seed=9)
        b.delete(dead)  # native repair path

        assert a.entry == b.entry
        for i, (ae, be) in enumerate(zip(a.elements, b.elements)):
            assert ae.deleted == be.deleted, i
            assert ae.neighbors == be.neighbors, i
        # graph still works
        gt = brute_force(
            np.delete(data, dead, axis=0), data[1:2], "l2", 5
        )
        _, ids = b.search(data[1:2], 5, SearchParams(ef_search=40),
                          method="host")
        live = [t for t in ids[0] if t >= 0]
        assert len(live) == 5

    def test_native_vacuum_delete_all_but_one(self):
        rng = np.random.default_rng(12)
        data = rng.integers(0, 50, size=(120, 6)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=13)
        idx.delete(list(range(1, 120)))
        _, ids = idx.search(data[0], 1, SearchParams(ef_search=10),
                            method="host")
        assert np.asarray(ids).ravel()[0] == 0

    @pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "l1"])
    def test_recall(self, metric):
        rng = np.random.default_rng(80)
        data = rng.standard_normal((1500, 16)).astype(np.float32)
        idx = HnswIndex.build(data, metric=metric, method="native", seed=81)
        q = rng.standard_normal((20, 16)).astype(np.float32)
        gt = brute_force(data, q, metric, 10)
        _, ids = idx.search(q, 10, SearchParams(ef_search=64), method="host")
        assert recall_at_k(ids, gt, 10) >= 0.93

    def test_duplicates(self):
        data = np.tile(np.array([[1.0, 2.0, 3.0]], dtype=np.float32), (20, 1))
        idx = HnswIndex.build(data, metric="l2", method="native")
        counts = sorted((len(t) for t in idx.heap_tids if t), reverse=True)
        assert counts[0] == 10
        assert idx.num_tuples == 20

    def test_native_search_matches_host_scan(self):
        rng = np.random.default_rng(82)
        data = rng.integers(0, 100, size=(500, 8)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="native", seed=83)
        g = native.NativeGraph(8, idx.params.m, idx.params.ef_construction, "l2")
        # rebuild native graph from same inputs for search comparison
        levels = np.array([e.level for e in idx.elements], dtype=np.int32)
        tids = np.array([t[0] for t in idx.heap_tids], dtype=np.int64)
        g.bulk_insert(idx.store.rows[: len(levels)].astype(np.float32), levels, tids)
        for qi in (3, 77, 123):
            q = data[qi].astype(np.float32)
            nd, nids = g.search(q, 10)
            hd, hids = idx.search(q, 10, SearchParams(ef_search=10), method="host")
            # native returns element ids/order distances; host returns
            # heap tids/operator distances
            np.testing.assert_allclose(np.sqrt(nd), hd[: len(nd)], rtol=1e-5)

    def test_mutation_after_native_build(self):
        rng = np.random.default_rng(84)
        data = rng.random((300, 8)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="native", seed=85)
        idx.insert(rng.random(8).astype(np.float32), 777)
        idx.delete([0, 1])
        _, ids = idx.search(data[10], 5, method="host")
        assert 10 in set(ids)
        assert not ({0, 1} & set(ids))


class TestNativeBitSparse:
    """Native engine parity for bit and sparse kinds."""

    def test_bit_graph_matches_host(self):
        """Hamming distances are integer-exact, so the graphs must be
        identical between engines at equal seeds."""
        rng = np.random.default_rng(17)
        bits = rng.integers(0, 2, size=(400, 64)).astype(np.uint8)
        a = HnswIndex.build(bits, metric="hamming", method="host", seed=5)
        b = HnswIndex.build(bits, metric="hamming", method="native", seed=5)
        assert a.entry == b.entry
        assert a.heap_tids == b.heap_tids
        for ae, be in zip(a.elements, b.elements):
            assert ae.level == be.level
            assert ae.neighbors == be.neighbors

    @pytest.mark.parametrize("metric", ["hamming", "jaccard"])
    def test_bit_recall(self, metric):
        rng = np.random.default_rng(18)
        bits = rng.integers(0, 2, size=(1200, 128)).astype(np.uint8)
        idx = HnswIndex.build(bits, metric=metric, method="native", seed=6)
        gt = brute_force(bits, bits[:20], metric, 10)
        _, ids = idx.search(bits[:20], 10, SearchParams(ef_search=64),
                            method="host")
        assert recall_at_k(ids, gt, 10) >= 0.9

    def test_bit_duplicates_fold(self):
        bits = np.tile(
            np.array([[1, 0, 1, 0, 1, 1, 0, 0]], dtype=np.uint8), (15, 1)
        )
        idx = HnswIndex.build(bits, metric="hamming", method="native")
        counts = sorted((len(t) for t in idx.heap_tids if t), reverse=True)
        assert counts[0] == 10
        assert idx.num_tuples == 15

    def test_sparse_recall_and_parity(self):
        from pgvector_rx_tpu.types.sparsevec import SparseVec

        rng = np.random.default_rng(19)
        rows = []
        for _ in range(600):
            nnz = rng.integers(3, 12)
            ii = np.sort(rng.choice(100, size=nnz, replace=False)).astype(
                np.int32
            )
            vv = rng.standard_normal(nnz).astype(np.float32)
            rows.append(SparseVec(100, ii, vv))
        a = HnswIndex.build(rows, metric="l2", method="host", seed=3)
        b = HnswIndex.build(rows, metric="l2", method="native", seed=3)
        # identical queries through the same host scan path
        for qi in (0, 7, 99):
            da, ia = a.search(rows[qi], 5, SearchParams(ef_search=40),
                              method="host")
            db, ib = b.search(rows[qi], 5, SearchParams(ef_search=40),
                              method="host")
            assert int(ia[0]) == int(ib[0]) == qi
            assert np.allclose(np.asarray(da), np.asarray(db), atol=1e-4)

    def test_auto_routes_bit_to_native(self):
        rng = np.random.default_rng(20)
        bits = rng.integers(0, 2, size=(300, 32)).astype(np.uint8)
        idx = HnswIndex.build(bits, metric="hamming")  # method="auto"
        gt = brute_force(bits, bits[:10], "hamming", 5)
        _, ids = idx.search(bits[:10], 5, SearchParams(ef_search=40),
                            method="host")
        assert recall_at_k(ids, gt, 5) >= 0.9


class TestNativeServingExport:
    """Flat serving export: native build -> DeviceGraph without
    per-element Python objects (the >2M materialization answer)."""

    def test_serving_matches_host_graph_build(self):
        rng = np.random.default_rng(90)
        data = rng.integers(0, 60, size=(900, 12)).astype(np.float32)
        a = HnswIndex.build(
            data, metric="l2", method="native", seed=9, host_graph=True
        )
        b = HnswIndex.build(
            data, metric="l2", method="native", seed=9, host_graph=False
        )
        assert b.serving_only and not b.elements
        assert b.entry == a.entry
        assert b.heap_tids == a.heap_tids
        ga, gb = a.device_graph(), b.device_graph()
        assert np.array_equal(
            np.asarray(ga.neighbors0), np.asarray(gb.neighbors0)
        )
        assert np.array_equal(
            np.asarray(ga.upper_neighbors), np.asarray(gb.upper_neighbors)
        )
        assert np.array_equal(
            np.asarray(ga.upper_slot), np.asarray(gb.upper_slot)
        )
        assert np.array_equal(np.asarray(ga.levels), np.asarray(gb.levels))
        q = rng.integers(0, 60, size=(16, 12)).astype(np.float32)
        da, ia = a.search(q, 5, SearchParams(ef_search=40))
        db, ib = b.search(q, 5, SearchParams(ef_search=40))
        assert np.array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-5)

    def test_serving_duplicate_fold_and_mutation_guard(self):
        data = np.tile(np.array([[4.0, 5.0]], dtype=np.float32), (25, 1))
        idx = HnswIndex.build(
            data, metric="l2", method="native", host_graph=False
        )
        counts = sorted((len(t) for t in idx.heap_tids if t), reverse=True)
        assert counts[0] == 10  # HNSW_HEAPTIDS cap
        with pytest.raises(RuntimeError):
            idx.insert(np.array([1.0, 2.0], dtype=np.float32), 999)

    def test_serving_cosine_normalizes(self):
        rng = np.random.default_rng(91)
        data = rng.standard_normal((600, 10)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="cosine", method="native", seed=4,
            host_graph=False,
        )
        q = rng.standard_normal((10, 10)).astype(np.float32)
        gt = brute_force(data, q, "cosine", 5)
        _, ids = idx.search(q, 5, SearchParams(ef_search=64))
        assert recall_at_k(ids, gt, 5) >= 0.93

    def test_serving_bit_kind(self):
        rng = np.random.default_rng(92)
        bits = rng.integers(0, 2, size=(500, 48)).astype(np.uint8)
        idx = HnswIndex.build(
            bits, metric="hamming", method="native", host_graph=False
        )
        assert idx.serving_only
        gt = brute_force(bits, bits[:10], "hamming", 5)
        _, ids = idx.search(bits[:10], 5, SearchParams(ef_search=40))
        assert recall_at_k(ids, gt, 5) >= 0.9
