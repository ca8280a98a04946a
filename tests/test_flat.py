"""FlatIndex (exact seqscan analog) tests."""

import numpy as np
import pytest

from pgvector_rx_tpu.index.flat import FlatIndex


class TestFlat:
    def test_exact_l2(self, rng):
        data = rng.random((500, 16)).astype(np.float32)
        idx = FlatIndex.build(data, metric="l2")
        q = data[123]
        d, ids = idx.search(q, 5)
        assert ids[0] == 123
        assert d[0] == pytest.approx(0.0, abs=1e-6)
        # matches numpy exact ordering
        true = np.argsort(((data - q) ** 2).sum(1))[:5]
        assert set(ids) == set(true)

    def test_delete(self, rng):
        data = rng.random((50, 8)).astype(np.float32)
        idx = FlatIndex.build(data, metric="l2")
        idx.delete([10])
        _, ids = idx.search(data[10], 1)
        assert ids[0] != 10

    def test_sparse_flat(self, rng):
        from pgvector_rx_tpu.types import SparseVec

        dim = 1000
        rows = []
        for _ in range(80):
            dense = rng.standard_normal(dim).astype(np.float32)
            dense[rng.random(dim) < 0.95] = 0.0
            rows.append(SparseVec.from_dense(dense))
        idx = FlatIndex.build(rows, metric="l2", kind="sparse")
        d, ids = idx.search(rows[11], 3)
        assert ids[0] == 11
        assert d[0] == pytest.approx(0.0, abs=1e-5)
        # matches the dense exact ordering
        densified = np.stack([r.to_dense() for r in rows])
        qd = densified[11]
        true = np.argsort(((densified - qd) ** 2).sum(1))[:3]
        assert set(ids) == set(true)

    def test_sparse_flat_cosine(self, rng):
        from pgvector_rx_tpu.types import SparseVec

        dim = 64
        rows = []
        for _ in range(40):
            dense = rng.standard_normal(dim).astype(np.float32)
            dense[rng.random(dim) < 0.7] = 0.0
            rows.append(SparseVec.from_dense(dense))
        idx = FlatIndex.build(rows, metric="cosine", kind="sparse")
        d, ids = idx.search(rows[5], 2)
        assert ids[0] == 5
        assert d[0] == pytest.approx(0.0, abs=1e-5)

    def test_bit_flat(self, rng):
        bits = rng.integers(0, 2, size=(100, 32)).astype(np.uint8)
        idx = FlatIndex.build(bits, metric="hamming", kind="bit")
        d, ids = idx.search(bits[7], 1)
        assert ids[0] == 7 and d[0] == 0.0

    def test_planner_integration(self, rng):
        """Cost model picks flat for tiny corpora, index for large."""
        from pgvector_rx_tpu.index import cost
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        small = HnswIndex(4, metric="l2")
        small.add_batch(rng.random((20, 4)).astype(np.float32))
        # ratio = 1 for tiny corpora -> no index advantage
        assert not cost.should_use_index(small, True, 40)


def test_bench_steady_build_rate():
    """steady excludes groups under half the weighted-median rate and
    reports their excess time (bench.py capture robustness, r5)."""
    import bench

    # five steady groups at 1000 el/s + one cold window group
    stats = [(0, 10000, 10.0)] * 5 + [(0, 10000, 55.0)]
    steady, cold = bench.steady_build_rate(stats)
    assert abs(steady - 1000.0) < 1e-6
    assert abs(cold - 45.0) < 1e-6
    # uniform groups: nothing excluded
    steady, cold = bench.steady_build_rate([(0, 500, 1.0)] * 4)
    assert abs(steady - 500.0) < 1e-6 and cold == 0.0
    # empty stats -> nan, 0
    steady, cold = bench.steady_build_rate([])
    assert steady != steady and cold == 0.0
