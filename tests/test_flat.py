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
