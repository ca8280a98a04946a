"""Device distance-kernel tests: batched kernels vs scalar type functions."""

import jax.numpy as jnp
import numpy as np
import pytest

from pgvector_rx_tpu.ops import bits, distances, sparse
from pgvector_rx_tpu.types import SparseVec, bitvec, vector


class TestDenseDistances:
    @pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "l1"])
    def test_pairwise_matches_scalar(self, metric, rng):
        base = rng.standard_normal((50, 16)).astype(np.float32)
        queries = rng.standard_normal((7, 16)).astype(np.float32)
        if metric == "cosine":
            base = base / np.linalg.norm(base, axis=1, keepdims=True)
            queries = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        got = np.asarray(distances.pairwise(metric, base, queries))
        scalar = {
            "l2": vector.l2_squared_distance,
            "ip": vector.negative_inner_product,
            "cosine": vector.cosine_distance,
            "l1": vector.l1_distance,
        }[metric]
        # pairwise l2 uses the MXU expansion formula -> looser tolerance
        rel = 2e-3 if metric == "l2" else 1e-4
        for b in range(7):
            for n in range(0, 50, 7):
                assert got[b, n] == pytest.approx(
                    scalar(queries[b], base[n]), rel=rel, abs=1e-5
                )

    @pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "l1"])
    def test_gathered_matches_pairwise(self, metric, rng):
        base = rng.standard_normal((50, 16)).astype(np.float32)
        queries = rng.standard_normal((4, 16)).astype(np.float32)
        if metric == "cosine":
            base = base / np.linalg.norm(base, axis=1, keepdims=True)
            queries = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        ids = rng.integers(0, 50, size=(4, 9)).astype(np.int32)
        got = np.asarray(distances.gathered(metric, base, ids, queries))
        scalar = {
            "l2": vector.l2_squared_distance,
            "ip": vector.negative_inner_product,
            "cosine": vector.cosine_distance,
            "l1": vector.l1_distance,
        }[metric]
        for b in range(4):
            for k in range(9):
                assert got[b, k] == pytest.approx(
                    scalar(queries[b], base[ids[b, k]]), rel=1e-5, abs=1e-6
                )


class TestBitDistances:
    @pytest.mark.parametrize("metric", ["hamming", "jaccard"])
    def test_matches_scalar(self, metric, rng):
        nbits = 77
        base_bits = rng.integers(0, 2, size=(30, nbits))
        query_bits = rng.integers(0, 2, size=(5, nbits))
        bw = bits.pack_bits(base_bits)
        qw = bits.pack_bits(query_bits)
        got = np.asarray(bits.pairwise(metric, bw, qw))
        scalar = bitvec.hamming_distance if metric == "hamming" else bitvec.jaccard_distance
        for b in range(5):
            for n in range(0, 30, 7):
                assert got[b, n] == pytest.approx(scalar(query_bits[b], base_bits[n]))

    def test_pack_roundtrip(self, rng):
        b = rng.integers(0, 2, size=(3, 100))
        assert np.array_equal(bits.unpack_bits(bits.pack_bits(b), 100), b)

    def test_gathered(self, rng):
        base_bits = rng.integers(0, 2, size=(30, 64))
        query_bits = rng.integers(0, 2, size=(4, 64))
        bw, qw = bits.pack_bits(base_bits), bits.pack_bits(query_bits)
        ids = rng.integers(0, 30, size=(4, 6)).astype(np.int32)
        allp = np.asarray(bits.pairwise("jaccard", bw, qw))
        got = np.asarray(bits.gathered("jaccard", bw, ids, qw))
        np.testing.assert_allclose(got, np.take_along_axis(allp, ids, axis=1), rtol=1e-6)


class TestSparseDistances:
    @pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "l1"])
    def test_matches_scalar(self, metric, rng):
        dim, budget = 200, 32
        rows = []
        for _ in range(20):
            dense = rng.standard_normal(dim).astype(np.float32)
            dense[rng.random(dim) < 0.9] = 0.0
            rows.append(SparseVec.from_dense(dense))
        bi, bv = sparse.pad_rows(rows, budget)
        qi, qv = sparse.pad_rows(rows[:4], budget)
        got = np.asarray(sparse.pairwise(metric, bi, bv, qi, qv))
        from pgvector_rx_tpu.types import sparsevec as sv

        scalar = {
            "l2": sv.l2_squared_distance,
            "ip": sv.negative_inner_product,
            "cosine": sv.cosine_distance,
            "l1": sv.l1_distance,
        }[metric]
        for b in range(4):
            for n in range(0, 20, 3):
                assert got[b, n] == pytest.approx(
                    scalar(rows[b], rows[n]), rel=1e-4, abs=1e-5
                )

    def test_gathered_matches_pairwise(self, rng):
        dim, budget = 100, 16
        rows = []
        for _ in range(15):
            dense = rng.standard_normal(dim).astype(np.float32)
            dense[rng.random(dim) < 0.9] = 0.0
            rows.append(SparseVec.from_dense(dense))
        bi, bv = sparse.pad_rows(rows, budget)
        qi, qv = sparse.pad_rows(rows[:3], budget)
        ids = rng.integers(0, 15, size=(3, 5)).astype(np.int32)
        allp = np.asarray(sparse.pairwise("l2", bi, bv, qi, qv))
        got = np.asarray(sparse.gathered("l2", bi, bv, ids, qi, qv))
        np.testing.assert_allclose(got, np.take_along_axis(allp, ids, axis=1), rtol=1e-5)


class TestSparseDenseQ:
    """pairwise_dense_q must match the merge-join pairwise exactly in
    ranking and within float tolerance in values, for all metrics."""

    @pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "l1"])
    def test_matches_merge_join(self, metric):
        from pgvector_rx_tpu.ops import sparse as sp

        rng = np.random.default_rng(33)
        dim, P, N, B = 500, 12, 64, 8
        def rows(n):
            ii = np.full((n, P), sp.PAD_INDEX, dtype=np.int32)
            vv = np.zeros((n, P), dtype=np.float32)
            for r in range(n):
                k = rng.integers(1, P)
                ii[r, :k] = np.sort(rng.choice(dim, size=k, replace=False))
                vv[r, :k] = rng.standard_normal(k)
            return jnp.asarray(ii), jnp.asarray(vv)

        bi, bv = rows(N)
        qi, qv = rows(B)
        ref = np.asarray(sp.pairwise(metric, bi, bv, qi, qv))
        got = np.asarray(sp.pairwise_dense_q(metric, dim, bi, bv, qi, qv))
        assert np.allclose(ref, got, atol=1e-4), (
            np.abs(ref - got).max()
        )


class TestSparseMatmulSweep:
    """Densified-corpus MXU formulation of the sparse exact sweep
    (device.py _exact_search_sparse) must match the merge-join scores."""

    def _graph(self, rng, n, dim, P):
        import jax.numpy as jnp

        from pgvector_rx_tpu.graph.device import DeviceGraph

        si = np.full((n + 1, P), np.int32(2**31 - 1), np.int32)
        sv = np.zeros((n + 1, P), np.float32)
        for i in range(n):
            nz = rng.integers(1, P + 1)
            idx = np.sort(rng.choice(dim, size=nz, replace=False))
            si[i, :nz] = idx
            sv[i, :nz] = rng.random(nz).astype(np.float32) + 0.1
        return DeviceGraph(
            kind="sparse", metric="l2", cap=n, m=16, entry=0, entry_level=0,
            neighbors0=jnp.full((n + 1, 32), -1, jnp.int32),
            upper_neighbors=jnp.full((1, 16), -1, jnp.int32),
            upper_slot=jnp.full(n + 1, -1, jnp.int32),
            levels=jnp.zeros(n + 1, jnp.int32),
            traversable=jnp.ones(n + 1, bool).at[n].set(False),
            emit_tid=jnp.arange(n + 1, dtype=jnp.int32),
            tid_count=jnp.ones(n + 1, jnp.int32),
            sp_indices=jnp.asarray(si), sp_values=jnp.asarray(sv),
        ), si, sv

    def test_matmul_matches_merge_join(self, rng):
        import dataclasses

        import jax.numpy as jnp

        from pgvector_rx_tpu.graph import device as dev
        from pgvector_rx_tpu.ops import sparse as sparse_ops

        n, dim, P, B, k = 500, 300, 8, 6, 5
        for metric in ("l2", "ip", "cosine"):
            g, si, sv = self._graph(rng, n, dim, P)
            g = dataclasses.replace(g, metric=metric)
            qi = jnp.asarray(si[:B])
            qv = jnp.asarray(sv[:B])
            # dim <= factor*P -> matmul formulation
            d, ids = dev._exact_search_sparse(g, qi, qv, k, dim=dim)
            ref = np.array(
                sparse_ops.pairwise(metric, g.sp_indices, g.sp_values, qi, qv)
            )
            ref[:, n:] = np.inf  # sentinel row masked
            gt_d = np.sort(ref, axis=1)[:, :k]
            np.testing.assert_allclose(np.asarray(d), gt_d, rtol=1e-4,
                                       atol=1e-5)

    def test_approx_variant_recall(self, rng):
        import jax.numpy as jnp

        from pgvector_rx_tpu.graph import device as dev

        n, dim, P, B, k = 800, 300, 8, 6, 5
        g, si, sv = self._graph(rng, n, dim, P)
        qi = jnp.asarray(si[:B])
        qv = jnp.asarray(sv[:B])
        d_e, ids_e = dev._exact_search_sparse(g, qi, qv, k, dim=dim)
        d_a, ids_a = dev._exact_search_sparse(g, qi, qv, k, dim=dim,
                                              approx=True)
        ids_e, ids_a = np.asarray(ids_e), np.asarray(ids_a)
        rec = np.mean(
            [len(set(ids_a[b]) & set(ids_e[b])) / k for b in range(B)]
        )
        assert rec >= 0.8, rec
