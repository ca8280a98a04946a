"""Options/config tests: GUC + reloption range parity (options.rs:260-359)."""

import pytest

from pgvector_rx_tpu import constants as C
from pgvector_rx_tpu.config import IndexParams, SearchParams


class TestIndexParams:
    def test_defaults(self):
        p = IndexParams()
        assert p.m == 16
        assert p.ef_construction == 64

    @pytest.mark.parametrize("m", [1, 0, 101, -5])
    def test_m_range(self, m):
        with pytest.raises(ValueError, match='out of bounds for option "m"'):
            IndexParams(m=m)

    @pytest.mark.parametrize("efc", [3, 1001])
    def test_efc_range(self, efc):
        with pytest.raises(ValueError, match='"ef_construction"'):
            IndexParams(ef_construction=efc)

    def test_bounds_inclusive(self):
        IndexParams(m=2, ef_construction=4).validate_for_build()
        IndexParams(m=100, ef_construction=1000)

    def test_efc_must_be_2m(self):
        p = IndexParams(m=32, ef_construction=63)
        with pytest.raises(ValueError, match="greater than or equal to 2 \\* m"):
            p.validate_for_build()


class TestSearchParams:
    def test_defaults(self):
        p = SearchParams()
        assert p.ef_search == 40
        assert p.iterative_scan == "off"
        assert p.max_scan_tuples == 20000
        assert p.scan_mem_multiplier == 1.0

    @pytest.mark.parametrize("ef", [0, 1001])
    def test_ef_search_range(self, ef):
        with pytest.raises(ValueError, match='"hnsw.ef_search"'):
            SearchParams(ef_search=ef)

    def test_iterative_enum(self):
        SearchParams(iterative_scan="relaxed_order")
        SearchParams(iterative_scan="strict_order")
        with pytest.raises(ValueError, match='invalid value for parameter'):
            SearchParams(iterative_scan="sometimes")

    def test_scan_mem_multiplier_range(self):
        SearchParams(scan_mem_multiplier=1000.0)
        with pytest.raises(ValueError, match='"hnsw.scan_mem_multiplier"'):
            SearchParams(scan_mem_multiplier=0.5)

    def test_max_scan_tuples_positive(self):
        with pytest.raises(ValueError, match='"hnsw.max_scan_tuples"'):
            SearchParams(max_scan_tuples=0)


class TestConstants:
    """hnsw_constants.rs:136-164 parity tests."""

    def test_values(self):
        assert C.HNSW_MAX_DIM == 2000
        assert C.HNSW_MAGIC_NUMBER == 0xA953A953
        assert C.HNSW_PAGE_ID == 0xFF90
        assert C.HNSW_DEFAULT_M == 16
        assert C.HNSW_DEFAULT_EF_CONSTRUCTION == 64
        assert C.HNSW_DEFAULT_EF_SEARCH == 40
        assert C.HNSW_HEAPTIDS == 10

    def test_layer_m(self):
        assert C.hnsw_get_layer_m(16, 0) == 32
        assert C.hnsw_get_layer_m(16, 1) == 16
        assert C.hnsw_get_layer_m(16, 5) == 16

    def test_ml(self):
        assert abs(C.hnsw_get_ml(16) - 0.3607) < 0.001

    def test_max_level(self):
        # page-size-derived cap (types/hnsw.rs:337-349): m=16 -> 82
        assert C.hnsw_get_max_level(16) == 82
        assert C.hnsw_get_max_level(2) <= 255

    def test_maxalign(self):
        # types/hnsw.rs maxalign tests (:356-362)
        assert [C.maxalign(x) for x in (0, 1, 7, 8, 9)] == [0, 8, 8, 8, 16]

    def test_tuple_sizes(self):
        # types/hnsw.rs:405-417: sizes MAXALIGN'd; header layout parity
        assert C.hnsw_element_tuple_size(16) % 8 == 0
        # 72-byte element header (4 flags + 10 TIDs + neighbortid + pad)
        assert C.hnsw_element_tuple_size(0) == 72
        assert C.hnsw_neighbor_tuple_size(0, 16) % 8 == 0
        # level=0, m=16 -> 4B header + 32 * 6B TIDs, maxaligned
        assert C.hnsw_neighbor_tuple_size(0, 16) == C.maxalign(4 + 32 * 6)

    def test_hnsw_max_size(self):
        # types/hnsw.rs:420-426
        assert 4000 < C.hnsw_max_size() < C.BLCKSZ


def test_scan_mem_multiplier_caps_iterative_state():
    import numpy as np

    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    rng = np.random.default_rng(31)
    data = rng.standard_normal((2000, 8)).astype(np.float32)
    index = HnswIndex.build(data, metric="l2", method="host", seed=0)

    # tiny memory budget: the scan must stop resuming early but still
    # produce results by draining its discarded heap
    tight = SearchParams(
        ef_search=4,
        iterative_scan="relaxed_order",
        work_mem_bytes=1024,
    )
    scan = index.scan(data[0], tight)
    got_tight = len(scan.take(2000))
    resumes_tight = index.stats["resumes"]

    loose = SearchParams(ef_search=4, iterative_scan="relaxed_order")
    scan2 = index.scan(data[0], loose)
    got_loose = len(scan2.take(2000))
    assert index.stats["resumes"] > resumes_tight
    assert got_loose >= got_tight > 0
