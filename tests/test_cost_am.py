"""Cost model + access-method facade tests (039/017 analogs)."""

import math

import numpy as np
import pytest

from pgvector_rx_tpu.index import access_method, cost
from pgvector_rx_tpu.index.hnsw import HnswIndex


class TestCost:
    @pytest.fixture(scope="class")
    def idx(self):
        rng = np.random.default_rng(0)
        i = HnswIndex(8, metric="l2")
        i.add_batch(rng.random((200, 8)).astype(np.float32))
        return i

    def test_no_order_by_infinite(self, idx):
        c = cost.estimate(idx, has_order_by=False, ef_search=40)
        assert math.isinf(c.total_cost)
        assert c.selectivity == 0.0

    def test_ratio_bounds(self, idx):
        r = cost.traversal_ratio(float(idx.num_tuples), 16, 40)
        assert 0.0 < r <= 1.0
        # larger corpora -> smaller visited fraction (039 spirit)
        assert cost.traversal_ratio(1e6, 16, 40) < cost.traversal_ratio(1e3, 16, 40)

    def test_index_beats_seqscan_when_large(self):
        big = HnswIndex(8, metric="l2")
        big.elements = []  # fake: just need num_tuples large
        big.heap_tids = [[i] for i in range(100000)]
        assert cost.should_use_index(big, True, 40)

    def test_empty_index_full_ratio(self):
        assert cost.traversal_ratio(0.0, 16, 40) == 1.0


class TestAccessMethod:
    def test_capability_flags(self):
        caps = access_method.AM_CAPABILITIES
        assert caps["amcanorderbyop"] is True
        assert caps["amcanparallel"] is False
        assert caps["amgetbitmap"] is False

    def test_all_14_opclasses_registered(self):
        # 4 vector + 4 halfvec + 4 sparsevec + 2 bit (the reference's set)
        assert len(access_method.OPERATOR_CLASSES) == 14
        assert access_method.validate_opclass("vector_cosine_ops")
        assert not access_method.validate_opclass("nonexistent_ops")

    def test_cosine_opclasses_have_norm_proc(self):
        for name, oc in access_method.OPERATOR_CLASSES.items():
            assert oc.has_norm_proc == ("cosine" in name)

    def test_create_from_opclass(self):
        idx = access_method.create_index_for_opclass("halfvec_ip_ops", 16)
        assert idx.metric == "ip"
        assert idx.dtype == np.float16
        idx2 = access_method.create_index_for_opclass("bit_jaccard_ops", 64)
        assert idx2.kind == "bit"

    def test_phase_name(self):
        assert access_method.build_phase_name(2) == "loading tuples"
        assert access_method.build_phase_name(1) is None
