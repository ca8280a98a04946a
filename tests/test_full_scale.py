"""Full-scale build-recall suites — the tests/t/012 family at reference
scale and with the REFERENCE'S OWN data distributions, on the device
engines.

The reference's CI contract (10k rows x 20 queries, LIMIT 20, default
m=16 / ef_construction=64):

- 012 vector(3):    coords = random()*random(), uniform queries,
                    ef_search=40, recall >= 0.99 (>= 0.97 for ip)
                    (`tests/t/012_hnsw_vector_build_recall.pl:11,94`)
- 024 halfvec(10):  coords = 2*random()*random(), uniform queries,
                    ef_search=40, recall >= 0.98 all four metrics
                    (`tests/t/024:11-12,97`)
- 020 bit(52):      rows = (random()*2^52)::bigint bits, like queries,
                    **ef_search=100**, hamming >= 0.98, jaccard >= 0.95
                    (`tests/t/020:11,22,102`)
- 028 sparsevec(3): DENSE 3-d rows cast to sparsevec (nnz <= 3),
                    ef_search=40, recall >= 0.99 (>= 0.97 for ip)
                    (`tests/t/028:11,56-59,94`)

Round-2's version of this file invented its own data (uniform coords;
1000-d sparse vectors at nnz 5-12; bit at ef=40) and was red at HEAD.
Diagnosis (probe_fullscale.py): the HOST Algorithm-5 scan — the
reference-parity path, bit-exact against graph/mod.rs semantics —
scored the SAME failing recall (sparse 0.71, ip 0.9325) over the same
graphs, so the misses were properties of the invented geometries for
reference-semantics HNSW itself (high-dim low-nnz sparse data is a
no-overlap tie swamp where graph descent is blind), not device-engine
bugs. The reference never tests those geometries; these suites now
assert exactly what its CI asserts.

Bit recall is tie-aware: 52-bit hamming distances tie massively, and
set recall vs one arbitrary ground-truth tie-break punishes returning
a DIFFERENT-but-equidistant id. A returned id counts as correct iff
its true distance <= the k-th ground-truth distance — the exact
equivalence class the reference's arbitrary seqscan tie-break samples
from. This is tight: a beam regression returning farther rows fails it.

Marked slow; deselect with `-m "not slow"`.
"""

import numpy as np
import pytest

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex
from pgvector_rx_tpu.types import SparseVec

from test_index import brute_force, recall_at_k

N, NQ, K = 10_000, 20, 20

pytestmark = pytest.mark.slow

VECTOR_THRESH = {"l2": 0.99, "cosine": 0.99, "l1": 0.99, "ip": 0.97}


def _engine_recalls(idx, queries, gt, ef=40):
    params = SearchParams(ef_search=ef)
    _, ids_beam = idx.search(queries, K, params, method="device")
    _, ids_x = idx.search(queries, K, params, method="exact")
    return recall_at_k(ids_beam, gt, K), recall_at_k(ids_x, gt, K)


class TestVector012:
    @pytest.mark.parametrize("metric", ["l2", "cosine", "ip", "l1"])
    def test_build_recall_10k(self, metric):
        rng = np.random.default_rng(101)
        # 012: ARRAY[random()*random(), ...] vector(3)
        data = (rng.random((N, 3)) * rng.random((N, 3))).astype(np.float32)
        queries = rng.random((NQ, 3)).astype(np.float32)
        idx = HnswIndex.build(data, metric=metric, method="device", seed=102)
        gt = brute_force(data, queries, metric, K)
        r_beam, r_exact = _engine_recalls(idx, queries, gt)
        want = VECTOR_THRESH[metric]
        assert r_exact >= want, f"exact {metric}: {r_exact}"
        assert r_beam >= want, f"beam {metric}: {r_beam}"


class TestHalfvec024:
    @pytest.mark.parametrize("metric", ["l2", "cosine", "ip", "l1"])
    def test_build_recall_10k(self, metric):
        rng = np.random.default_rng(103)
        # 024: 2*random()*random() halfvec(10), uniform queries
        data = (2.0 * rng.random((N, 10)) * rng.random((N, 10))).astype(
            np.float32
        )
        queries = rng.random((NQ, 10)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric=metric, method="device", dtype=np.float16, seed=104
        )
        # GT against the f16-STORED values (halfvec semantics: f16
        # storage, f32 arithmetic — halfvec.rs:687-733)
        stored = data.astype(np.float16).astype(np.float32)
        if metric == "cosine":
            # index stores normalize-then-round rows
            nrm = np.linalg.norm(data.astype(np.float64), axis=1,
                                 keepdims=True)
            stored = (
                (data / np.maximum(nrm, 1e-30))
                .astype(np.float16)
                .astype(np.float32)
            )
        gt = brute_force(stored, queries, metric, K)
        r_beam, r_exact = _engine_recalls(idx, queries, gt)
        assert r_exact >= 0.98, f"exact {metric}: {r_exact}"
        assert r_beam >= 0.98, f"beam {metric}: {r_beam}"


class TestBit020:
    @pytest.mark.parametrize("metric", ["hamming", "jaccard"])
    def test_build_recall_10k(self, metric):
        rng = np.random.default_rng(105)
        # 020: (random() * 2^52)::bigint::bit(52) — uniform random bits
        bits = rng.integers(0, 2, size=(N, 52)).astype(np.uint8)
        queries = rng.integers(0, 2, size=(NQ, 52)).astype(np.uint8)
        idx = HnswIndex.build(bits, metric=metric, method="device", seed=106)

        def bit_dist(q, row):
            if metric == "hamming":
                return float((q != row).sum())
            inter = float((q & row).sum())
            union = float((q | row).sum())
            return 1.0 if inter == 0 else 1.0 - inter / max(union, 1.0)

        d_all = np.stack(
            [
                np.array([bit_dist(q, row) for row in bits])
                for q in queries
            ]
        )  # [NQ, N] true distances
        kth = np.sort(d_all, axis=1)[:, K - 1]  # [NQ] k-th GT distance

        def tie_aware_recall(ids):
            # a returned id is correct iff its true distance is within
            # the ground-truth k-th distance (the tie equivalence class
            # the reference's arbitrary seqscan tie-break samples from)
            hits = 0
            for b in range(NQ):
                got = [g for g in ids[b] if g >= 0]
                hits += sum(
                    1 for g in got if d_all[b, g] <= kth[b] + 1e-9
                )
            return hits / (NQ * K)

        # 020 runs at ef_search=100 (tests/t/020:22,31)
        params = SearchParams(ef_search=100)
        want = 0.98 if metric == "hamming" else 0.95
        _, ids_x = idx.search(queries, K, params, method="exact")
        assert tie_aware_recall(ids_x) >= 0.999, "exact engine"
        _, ids_b = idx.search(queries, K, params, method="device")
        r_beam = tie_aware_recall(ids_b)
        assert r_beam >= want, f"beam {metric}: {r_beam}"


class TestSparse028:
    @pytest.mark.parametrize("metric", ["l2", "cosine", "ip", "l1"])
    def test_build_recall_10k(self, metric):
        rng = np.random.default_rng(107)
        # 028: vector(3) rows (random()*random() coords) CAST to
        # sparsevec — 3-dim sparse vectors, nnz <= 3 (zero coords drop)
        dim = 3
        dense = (rng.random((N, dim)) * rng.random((N, dim))).astype(
            np.float32
        )
        rows = []
        for i in range(N):
            ii = np.nonzero(dense[i])[0].astype(np.int32)
            rows.append(SparseVec(dim, ii, dense[i, ii]))
        qdense = rng.random((NQ, dim)).astype(np.float32)
        queries = [
            SparseVec(
                dim,
                np.nonzero(q)[0].astype(np.int32),
                q[np.nonzero(q)[0]],
            )
            for q in qdense
        ]
        idx = HnswIndex.build(rows, metric=metric, seed=108)
        gt = brute_force(dense, qdense, metric, K)
        params = SearchParams(ef_search=40)
        want = VECTOR_THRESH[metric]
        _, ids = idx.search(queries, K, params, method="exact")
        assert recall_at_k(ids, gt, K) >= want, "exact engine"
        _, ids_b = idx.search(queries, K, params, method="device")
        r_beam = recall_at_k(ids_b, gt, K)
        assert r_beam >= want, f"beam {metric}: {r_beam}"
