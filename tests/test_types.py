"""Type I/O and distance-function tests.

Mirrors reference Tier-2 pg_test suites: vector.rs:871-1171,
halfvec.rs:1083-1113, sparsevec tests, bitvec tests — same inputs, same
expected outputs/errors.
"""

import math

import numpy as np
import pytest

from pgvector_rx_tpu.types import BitVec, HalfVec, SparseVec, Vector
from pgvector_rx_tpu.types import bitvec, halfvec, sparsevec, vector


# ---------------------------------------------------------------------------
# vector
# ---------------------------------------------------------------------------


class TestVectorIO:
    def test_roundtrip(self):
        v = Vector.from_text("[1,2,3]")
        assert v.dim == 3
        assert v.to_text() == "[1,2,3]"

    def test_whitespace(self):
        assert Vector.from_text(" [ 1 , 2 , 3 ] ").to_text() == "[1,2,3]"

    def test_floats(self):
        assert Vector.from_text("[1.5,0.25,-0.5]").to_text() == "[1.5,0.25,-0.5]"

    def test_shortest_float(self):
        # f32 shortest round-trip formatting (ryu parity)
        assert Vector.from_text("[0.1]").to_text() == "[0.1]"
        assert Vector.from_text("[1.0]").to_text() == "[1]"
        assert Vector.from_text("[-0.0]").to_text() == "[-0]"

    def test_scientific_input(self):
        assert Vector.from_text("[1e1,2E-1]").to_text() == "[10,0.2]"

    @pytest.mark.parametrize(
        "bad",
        ["", "[", "]", "1,2,3", "[1,2,3", "[1,,3]", "[1 2 3,4]", "[abc]",
         "[1,2,3]x", "[1,2,]"],
    )
    def test_invalid_syntax(self, bad):
        with pytest.raises(ValueError, match="invalid input syntax for type vector"):
            Vector.from_text(bad)

    def test_empty(self):
        with pytest.raises(ValueError, match="at least 1 dimension"):
            Vector.from_text("[]")

    def test_nan_inf(self):
        with pytest.raises(ValueError, match="NaN not allowed in vector"):
            Vector.from_text("[nan]")
        with pytest.raises(ValueError, match="infinite value not allowed in vector"):
            Vector.from_text("[inf]")
        with pytest.raises(ValueError, match="infinite value not allowed in vector"):
            Vector.from_text("[-Infinity]")
        # f32 overflow -> inf -> rejected
        with pytest.raises(ValueError, match="infinite value not allowed in vector"):
            Vector.from_text("[1e40]")

    def test_typmod(self):
        Vector.from_text("[1,2,3]", typmod=3)
        with pytest.raises(ValueError, match="expected 4 dimensions, not 3"):
            Vector.from_text("[1,2,3]", typmod=4)

    def test_max_dim(self):
        with pytest.raises(ValueError, match="cannot have more than 16000 dimensions"):
            Vector(np.zeros(16001, dtype=np.float32))

    def test_binary_roundtrip(self):
        v = Vector([1.25, -2.5, 3.0])
        assert Vector.from_binary(v.to_binary()) == v

    def test_array_cast(self):
        v = Vector.from_array([1, 2, 3])
        assert v.to_text() == "[1,2,3]"
        with pytest.raises(ValueError, match="array must not contain nulls"):
            Vector.from_array(np.array([1, None, 3], dtype=object))

    def test_numeric_array_cast(self):
        from decimal import Decimal

        v = Vector.from_numeric_array([Decimal("1.5"), Decimal("-2"), 3])
        assert v.to_text() == "[1.5,-2,3]"
        back = v.to_numeric_array()
        assert back == [Decimal("1.5"), Decimal("-2"), Decimal("3")]
        with pytest.raises(ValueError, match="nulls"):
            Vector.from_numeric_array([Decimal("1"), None])
        with pytest.raises(ValueError):
            Vector.from_numeric_array([Decimal("NaN")])
        # round-trip at f32 precision (shortest-decimal rendering)
        w = Vector.from_numeric_array(
            Vector([0.1, 2.0e-7, 12345.678]).to_numeric_array()
        )
        assert w == Vector([0.1, 2.0e-7, 12345.678])

    def test_norm_and_normalize(self):
        v = Vector([3.0, 4.0])
        assert v.norm() == pytest.approx(5.0)
        n = v.l2_normalize()
        assert n.data == pytest.approx([0.6, 0.8])
        z = Vector([0.0, 0.0]).l2_normalize()
        assert np.array_equal(z.data, np.zeros(2, dtype=np.float32))


class TestVectorDistances:
    A = [1.0, 2.0, 3.0]
    B = [4.0, 6.0, 8.0]

    def test_l2(self):
        assert vector.l2_distance(self.A, self.B) == pytest.approx(math.sqrt(50.0))
        assert vector.l2_squared_distance(self.A, self.B) == pytest.approx(50.0)

    def test_ip(self):
        assert vector.inner_product(self.A, self.B) == pytest.approx(40.0)
        assert vector.negative_inner_product(self.A, self.B) == pytest.approx(-40.0)

    def test_cosine(self):
        d = vector.cosine_distance([1.0, 0.0], [0.0, 1.0])
        assert d == pytest.approx(1.0)
        assert vector.cosine_distance([1.0, 1.0], [1.0, 1.0]) == pytest.approx(0.0)
        assert vector.cosine_distance([1.0, 0.0], [-1.0, 0.0]) == pytest.approx(2.0)

    def test_l1(self):
        assert vector.l1_distance(self.A, self.B) == pytest.approx(12.0)

    def test_dim_mismatch(self):
        with pytest.raises(ValueError, match="different vector dimensions 2 and 3"):
            vector.l2_distance([1.0, 2.0], [1.0, 2.0, 3.0])


# ---------------------------------------------------------------------------
# halfvec
# ---------------------------------------------------------------------------


class TestHalfVec:
    def test_roundtrip(self):
        v = HalfVec.from_text("[1,2,3]")
        assert v.to_text() == "[1,2,3]"

    def test_f16_rounding(self):
        # round-to-nearest-even at f16 precision (halfvec.rs:1083-1113 model)
        v = HalfVec([1.0009765625])  # exactly representable
        assert float(v.data[0]) == 1.0009765625
        # 1 + 2^-12 rounds to nearest even = 1.0
        v2 = HalfVec([1.0 + 2.0**-12])
        assert float(v2.data[0]) == 1.0

    def test_denormals(self):
        tiny = 2.0**-24  # smallest f16 denormal
        assert float(HalfVec([tiny]).data[0]) == tiny
        assert float(HalfVec([tiny / 4]).data[0]) == 0.0

    def test_overflow(self):
        with pytest.raises(ValueError, match="out of range for type halfvec"):
            HalfVec.from_text("[65520]")
        with pytest.raises(ValueError, match="out of range for type halfvec"):
            HalfVec([70000.0])

    def test_nan_inf(self):
        with pytest.raises(ValueError, match="NaN not allowed in halfvec"):
            HalfVec.from_text("[NaN]")
        with pytest.raises(ValueError, match="infinite value not allowed in halfvec"):
            HalfVec.from_text("[Infinity]")

    def test_binary_roundtrip(self):
        v = HalfVec([1.5, -0.25, 64.0])
        assert HalfVec.from_binary(v.to_binary()) == v

    def test_distances(self):
        assert halfvec.l2_distance([1, 2], [4, 6]) == pytest.approx(5.0)
        assert halfvec.inner_product([1, 2], [3, 4]) == pytest.approx(11.0)
        assert halfvec.l1_distance([1, 2], [4, 6]) == pytest.approx(7.0)

    def test_normalize_overflow(self):
        # max f16 / tiny norm can overflow — mirrors halfvec.rs:225-231
        v = HalfVec([65504.0, 2.0**-24])
        n = v.l2_normalize()  # fine: values shrink
        assert float(n.data[0]) == pytest.approx(1.0, abs=1e-3)

    def test_to_vector(self):
        assert halfvec.HalfVec([1.5]).to_vector().to_text() == "[1.5]"


# ---------------------------------------------------------------------------
# sparsevec
# ---------------------------------------------------------------------------


class TestSparseVec:
    def test_roundtrip(self):
        s = SparseVec.from_text("{1:1.5,3:2,5:3}/6")
        assert s.to_text() == "{1:1.5,3:2,5:3}/6"
        assert s.nnz == 3
        assert s.dim == 6
        # 0-based storage
        assert s.indices.tolist() == [0, 2, 4]

    def test_empty(self):
        s = SparseVec.from_text("{}/5")
        assert s.nnz == 0
        assert s.to_text() == "{}/5"

    def test_zero_dropped(self):
        s = SparseVec.from_text("{1:0,2:1}/3")
        assert s.nnz == 1
        assert s.to_text() == "{2:1}/3"

    def test_unsorted_input_sorted(self):
        s = SparseVec.from_text("{3:1,1:2}/4")
        assert s.to_text() == "{1:2,3:1}/4"

    def test_duplicate_indices(self):
        with pytest.raises(ValueError, match="must not contain duplicates"):
            SparseVec.from_text("{2:1,2:2}/4")

    def test_index_out_of_bounds(self):
        with pytest.raises(ValueError, match="index out of bounds"):
            SparseVec.from_text("{5:1}/4")
        with pytest.raises(ValueError, match="index out of bounds"):
            SparseVec.from_text("{0:1}/4")  # SQL is 1-based

    @pytest.mark.parametrize("bad", ["", "{", "{1:1}", "{1:1}/", "{1:1/4",
                                     "{1 :1}/4x", "(1:1)/4", "{1:}/4", "{:1}/4"])
    def test_invalid_syntax(self, bad):
        with pytest.raises(ValueError, match="invalid input syntax for type sparsevec"):
            SparseVec.from_text(bad)

    def test_nan_inf(self):
        with pytest.raises(ValueError, match="NaN not allowed in sparsevec"):
            SparseVec.from_text("{1:NaN}/4")
        with pytest.raises(ValueError, match="infinite value not allowed"):
            SparseVec.from_text("{1:inf}/4")

    def test_dense_roundtrip(self):
        s = SparseVec.from_dense([0.0, 1.0, 0.0, 2.0])
        assert s.to_text() == "{2:1,4:2}/4"
        assert s.to_dense().tolist() == [0.0, 1.0, 0.0, 2.0]

    def test_binary_roundtrip(self):
        s = SparseVec.from_text("{1:1.5,3:-2}/10")
        assert SparseVec.from_binary(s.to_binary()) == s

    def test_distances_match_dense(self, rng):
        for _ in range(10):
            da = rng.random(20).astype(np.float32)
            db = rng.random(20).astype(np.float32)
            da[rng.random(20) < 0.6] = 0.0
            db[rng.random(20) < 0.6] = 0.0
            sa, sb = SparseVec.from_dense(da), SparseVec.from_dense(db)
            assert sparsevec.l2_distance(sa, sb) == pytest.approx(
                vector.l2_distance(da, db), rel=1e-5
            )
            assert sparsevec.inner_product(sa, sb) == pytest.approx(
                vector.inner_product(da, db), rel=1e-5
            )
            assert sparsevec.l1_distance(sa, sb) == pytest.approx(
                vector.l1_distance(da, db), rel=1e-4
            )
            if da.any() and db.any():
                assert sparsevec.cosine_distance(sa, sb) == pytest.approx(
                    vector.cosine_distance(da, db), rel=1e-4
                )

    def test_normalize_compacts_zeros(self):
        s = SparseVec(10, [0, 5], [1e-8, 1e38])
        n = s.l2_normalize()
        # 1e-8/1e38 underflows to zero at f32 and is re-compacted
        assert n.nnz == 1
        assert n.indices.tolist() == [5]

    def test_compare_total_order(self):
        a = SparseVec.from_text("{1:1}/3")
        b = SparseVec.from_text("{1:2}/3")
        c = SparseVec.from_text("{2:1}/3")
        assert a < b
        # dense order: {1:1} = [1,0,0] > [0,1,0] = {2:1}
        assert c < a
        assert a.compare(a) == 0
        # negative value before a gap sorts first
        d = SparseVec.from_text("{1:-1}/3")
        assert d < a


# ---------------------------------------------------------------------------
# bit
# ---------------------------------------------------------------------------


class TestBitVec:
    def test_roundtrip(self):
        b = BitVec.from_text("10101")
        assert b.to_text() == "10101"
        assert len(b) == 5

    def test_hamming(self):
        assert bitvec.hamming_distance(
            BitVec.from_text("111"), BitVec.from_text("010")
        ) == 2.0
        assert bitvec.hamming_distance(
            BitVec.from_text("0000"), BitVec.from_text("0000")
        ) == 0.0

    def test_jaccard(self):
        a = BitVec.from_text("1100")
        b = BitVec.from_text("1010")
        # intersection=1, union=3
        assert bitvec.jaccard_distance(a, b) == pytest.approx(1 - 1 / 3)
        # empty intersection -> 1.0 (bitvec.rs:128)
        assert bitvec.jaccard_distance(
            BitVec.from_text("00"), BitVec.from_text("00")
        ) == 1.0

    def test_length_mismatch(self):
        with pytest.raises(ValueError, match="different bit lengths 3 and 4"):
            bitvec.hamming_distance(BitVec.from_text("111"), BitVec.from_text("1111"))

    def test_long_strings(self, rng):
        bits_a = rng.integers(0, 2, 999)
        bits_b = rng.integers(0, 2, 999)
        a, b = BitVec.from_bits(bits_a), BitVec.from_bits(bits_b)
        assert bitvec.hamming_distance(a, b) == float(np.sum(bits_a != bits_b))


# ---------------------------------------------------------------------------
# cross-type casts (sparsevec.rs:585-731, halfvec.rs:617-672; test parity:
# sparsevec.rs test_{vector,halfvec}_to_sparsevec_cast and inverses)
# ---------------------------------------------------------------------------


class TestCrossTypeCasts:
    def test_vector_to_sparsevec_drops_zeros(self):
        sv = Vector.from_text("[1,0,2]").to_sparsevec()
        assert sv.to_text() == "{1:1,3:2}/3"

    def test_sparsevec_to_vector(self):
        v = SparseVec.from_text("{1:1,3:2}/3").to_vector()
        assert v.to_text() == "[1,0,2]"

    def test_halfvec_to_sparsevec(self):
        sv = HalfVec.from_text("[1,0,2]").to_sparsevec()
        assert sv.to_text() == "{1:1,3:2}/3"

    def test_sparsevec_to_halfvec(self):
        hv = SparseVec.from_text("{1:1,3:2}/3").to_halfvec()
        assert hv.to_text() == "[1,0,2]"

    def test_vector_to_halfvec_rounds_rne(self):
        hv = Vector([1.0, 2.5, 0.1]).to_halfvec()
        assert hv.data.dtype == np.float16
        assert hv.data[1] == np.float16(2.5)

    def test_vector_to_halfvec_overflow_errors(self):
        # 1e30 is finite in f32 but overflows f16 (halfvec.rs:661-666)
        with pytest.raises(ValueError, match="out of range for type halfvec"):
            Vector([1e30]).to_halfvec()

    def test_sparsevec_to_halfvec_silent_overflow(self):
        # the reference's sparsevec->halfvec applies f32_to_half with NO
        # overflow check (sparsevec.rs:700-731): value becomes inf
        hv = SparseVec(1, [0], [1e30]).to_halfvec()
        assert np.isinf(hv.data[0])

    def test_halfvec_to_vector_typmod(self):
        with pytest.raises(ValueError, match="expected 4 dimensions, not 3"):
            HalfVec([1, 2, 3]).to_vector(typmod=4)

    def test_sparsevec_to_vector_dim_cap(self):
        big = SparseVec(20000, [0], [1.0])
        with pytest.raises(ValueError, match="more than 16000 dimensions"):
            big.to_vector()

    def test_cast_roundtrip_random(self, rng):
        a = rng.standard_normal(64).astype(np.float32)
        a[rng.integers(0, 64, 20)] = 0.0
        v = Vector(a)
        assert np.array_equal(v.to_sparsevec().to_vector().data, a)
        hv = v.to_halfvec()
        assert np.array_equal(
            hv.to_sparsevec().to_halfvec().data, hv.data
        )
