"""Golden-output tests (pg_regress analog, SURVEY.md §4 Tier 3a).

Deterministic seeded datasets with exact expected outputs, mirroring the
reference's tests/pg_regress suites: integer-valued data makes every f32
distance exact, and the fixed level RNG seed makes the whole graph (and
therefore result order) reproducible bit for bit. Any change to the
build/search semantics shows up as a golden diff.
"""

import numpy as np
import pytest

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex
from pgvector_rx_tpu.types import BitVec, SparseVec, Vector


@pytest.fixture(scope="module")
def golden_index():
    rng = np.random.default_rng(1234)
    data = rng.integers(0, 100, size=(200, 4)).astype(np.float32)
    idx = HnswIndex.build(data, metric="l2", method="host", seed=99)
    return idx, data


class TestGoldenGraph:
    def test_level_distribution(self, golden_index):
        idx, _ = golden_index
        lv = [e.level for e in idx.elements]
        assert np.bincount(lv).tolist() == [193, 6, 1]
        assert idx.entry == 162
        assert idx.elements[idx.entry].level == 2

    def test_search_results_exact(self, golden_index):
        idx, _ = golden_index
        q = np.array([50.0, 50.0, 50.0, 50.0], dtype=np.float32)
        d, ids = idx.search(q, 5, SearchParams(ef_search=20), method="host")
        assert ids.tolist() == [13, 75, 199, 52, 164]
        np.testing.assert_allclose(
            d, [13.5277, 19.9249, 22.0907, 27.1662, 27.7489], atol=1e-4
        )

    def test_strict_scan_order_exact(self, golden_index):
        idx, _ = golden_index
        q = np.array([50.0, 50.0, 50.0, 50.0], dtype=np.float32)
        scan = idx.scan(q, SearchParams(ef_search=8, iterative_scan="strict_order"))
        assert [t for t, _ in scan.take(8)] == [13, 75, 199, 52, 164, 5, 54, 127]

    def test_native_build_identical(self, golden_index):
        from pgvector_rx_tpu import native

        if not native.available():
            pytest.skip("no native engine")
        idx, data = golden_index
        nidx = HnswIndex.build(data, metric="l2", method="native", seed=99)
        assert nidx.entry == idx.entry
        for ae, be in zip(idx.elements, nidx.elements):
            assert ae.level == be.level
            assert ae.neighbors == be.neighbors


class TestGoldenTypeIO:
    """Text I/O goldens (pg_regress hnsw_vector/sparsevec/bit .out parity)."""

    def test_vector_out(self):
        cases = {
            "[1,2,3]": "[1,2,3]",
            "[ 1.5 , -0.25 , 4e2 ]": "[1.5,-0.25,400]",
            "[0.30000000000000004]": "[0.3]",  # f32 shortest round-trip
            "[12345678]": "[12345678]",
            "[-0.0]": "[-0]",
        }
        for inp, out in cases.items():
            assert Vector.from_text(inp).to_text() == out

    def test_sparsevec_out(self):
        cases = {
            "{1:1,3:2}/5": "{1:1,3:2}/5",
            "{ 2 : 1.5 }/4": "{2:1.5}/4",
            "{3:0,1:7}/3": "{1:7}/3",
            "{}/100": "{}/100",
        }
        for inp, out in cases.items():
            assert SparseVec.from_text(inp).to_text() == out

    def test_bit_roundtrip(self):
        assert BitVec.from_text("10110").to_text() == "10110"


class TestGoldenHalfvec:
    """The pg_regress hnsw_halfvec.out scenarios, value for value
    (`/root/reference/tests/pg_regress/expected/hnsw_halfvec.out`):
    build an index over ['[0,0,0]','[1,2,3]','[1,1,1]'] (the NULL row
    has no analog — NULLs are never indexed), insert '[1,2,4]', then
    scan by distance to '[3,3,3]' and compare the full emitted order.
    Cosine omits the zero-norm row (build.rs:426-438 skip)."""

    EXPECTED = {
        "l2": ["[1,2,3]", "[1,2,4]", "[1,1,1]", "[0,0,0]"],
        "ip": ["[1,2,4]", "[1,2,3]", "[1,1,1]", "[0,0,0]"],
        "cosine": ["[1,1,1]", "[1,2,3]", "[1,2,4]"],
        "l1": ["[1,2,3]", "[1,2,4]", "[1,1,1]", "[0,0,0]"],
    }

    @pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "l1"])
    def test_halfvec_out(self, metric):
        from pgvector_rx_tpu.types import HalfVec

        texts = ["[0,0,0]", "[1,2,3]", "[1,1,1]"]
        rows = np.stack(
            [HalfVec.from_text(t).data for t in texts]
        ).astype(np.float16)
        idx = HnswIndex.build(
            rows, metric=metric, dtype=np.float16, method="host", seed=5
        )
        ins = idx.insert(HalfVec.from_text("[1,2,4]").data, tid=3)
        assert ins is not None
        values = texts + ["[1,2,4]"]
        q = HalfVec.from_text("[3,3,3]").data
        scan = idx.scan(
            q, SearchParams(ef_search=40, iterative_scan="strict_order")
        )
        got = [values[t] for t, _ in scan.take(10)]
        assert got == self.EXPECTED[metric]


class TestGoldenDistances:
    """Exact operator values on the pg_regress-style fixtures."""

    def test_vector_operators(self):
        from pgvector_rx_tpu.types import vector as v

        a, b = [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]
        assert v.l2_distance(a, b) == pytest.approx(5.196152422706632)
        assert v.inner_product(a, b) == 32.0
        assert v.cosine_distance(a, b) == pytest.approx(0.025368153802923787)
        assert v.l1_distance(a, b) == 9.0

    def test_bit_operators(self):
        from pgvector_rx_tpu.types import bitvec

        assert bitvec.hamming_distance(
            BitVec.from_text("11011"), BitVec.from_text("10101")
        ) == 3.0
        assert bitvec.jaccard_distance(
            BitVec.from_text("1101"), BitVec.from_text("1001")
        ) == pytest.approx(1 - 2 / 3)
