"""dtype-native device serving (VERDICT r1 #6).

halfvec indexes store ONE f16 value array on device (2 B/dim instead
of the 6 B/dim f32+bf16 pair) — the reference scores the f16-STORED
value (halfvec.rs: f32 arithmetic over f16 storage), so f32 math over
the f16 array is exactly its semantics. PGV_SERVE_DTYPE=bf16 opts any
dense index into a single bf16 array (the 10M halfvec(1024) enabler).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex

from test_index import brute_force, recall_at_k


def _mem_bytes(g):
    total = 0
    for a in (g.values, g.values_bf16):
        if a is not None:
            total += a.size * a.dtype.itemsize
    return total


class TestServeDtype:
    def test_halfvec_stores_one_f16_array(self, rng):
        data = rng.standard_normal((500, 16)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="l2", method="host", dtype=np.float16, seed=40
        )
        g = idx.device_graph()
        assert g.values.dtype == jnp.float16
        assert g.values_bf16 is None
        # memory flag: one 2-byte array vs the f32 index's 6 B/dim pair
        idx32 = HnswIndex.build(data, metric="l2", method="host", seed=40)
        g32 = idx32.device_graph()
        assert _mem_bytes(g) * 2 < _mem_bytes(g32)

    def test_halfvec_distances_match_f16_stored_semantics(self, rng):
        data = rng.standard_normal((400, 12)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="l2", method="host", dtype=np.float16, seed=41
        )
        q = rng.standard_normal((8, 12)).astype(np.float32)
        d, ids = idx.search(q, 5, SearchParams(), method="exact")
        # reference semantics: distance to the f16-ROUNDED stored value
        stored = data.astype(np.float16).astype(np.float32)
        for b in range(8):
            for j in range(5):
                true = np.sqrt(((stored[ids[b, j]] - q[b]) ** 2).sum())
                assert d[b, j] == pytest.approx(true, rel=1e-4)
        gt = brute_force(stored, q, "l2", 5)
        assert recall_at_k(ids, gt, 5) == 1.0

    def test_halfvec_device_build_compact(self, rng):
        data = rng.standard_normal((2000, 16)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="l2", method="device", dtype=np.float16,
            host_graph=False, seed=42,
        )
        g = idx.device_graph()
        assert g.values.dtype == jnp.float16
        assert g.values_bf16 is None
        q = rng.standard_normal((8, 16)).astype(np.float32)
        stored = data.astype(np.float16).astype(np.float32)
        gt = brute_force(stored, q, "l2", 5)
        _, ids = idx.search(q, 5, SearchParams(), method="exact")
        assert recall_at_k(ids, gt, 5) == 1.0
        # approx + beam engines serve from the compact store too
        _, ids_a = idx.search(q, 5, SearchParams(), method="approx")
        assert recall_at_k(ids_a, gt, 5) >= 0.9
        _, ids_b = idx.search(q, 5, SearchParams(ef_search=40),
                              method="device")
        assert recall_at_k(ids_b, gt, 5) >= 0.9

    def test_bf16_compact_opt_in(self, rng, monkeypatch):
        monkeypatch.setenv("PGV_SERVE_DTYPE", "bf16")
        data = rng.standard_normal((600, 16)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=43)
        g = idx.device_graph()
        assert g.values.dtype == jnp.bfloat16
        assert g.values_bf16 is None
        q = rng.standard_normal((6, 16)).astype(np.float32)
        stored = np.asarray(
            jnp.asarray(data).astype(jnp.bfloat16).astype(jnp.float32)
        )
        gt = brute_force(stored, q, "l2", 5)
        _, ids = idx.search(q, 5, SearchParams(), method="exact")
        assert recall_at_k(ids, gt, 5) >= 0.95  # bf16 rounding ties

    def test_sharded_compact_values(self, rng, monkeypatch):
        """Compact dtype survives the sharded stack (values stay 2 B
        across the mesh)."""
        from pgvector_rx_tpu.parallel import ShardedHnswIndex

        monkeypatch.setenv("PGV_SERVE_DTYPE", "bf16")
        data = rng.standard_normal((800, 12)).astype(np.float32)
        idx = ShardedHnswIndex.build(
            data, n_shards=4, metric="l2", method="host", seed=44
        )
        st = idx._stack()
        assert st["values"].dtype == jnp.bfloat16
        _, tids = idx.search(data[9], 5, SearchParams(ef_search=40))
        assert tids[0] == 9


class TestServeTopkBit:
    """serve_topk on bit indexes: the bulk serving fast path must route
    packed-word queries to the bits sweep — it previously crashed on
    `g.values.shape` (dense-only assumption; found by
    probes/probe_bitbeam.py on 2026-08-21)."""

    @pytest.mark.parametrize("metric", ["hamming", "jaccard"])
    def test_all_engines(self, metric):
        import jax.numpy as jnp

        from pgvector_rx_tpu.graph import device as dm
        from pgvector_rx_tpu.ops.bits import pack_bits

        rng = np.random.default_rng(77)
        bits = rng.integers(0, 2, size=(2000, 64), dtype=np.uint8)
        idx = HnswIndex.build(bits, metric=metric, method="host", seed=1)
        q = jnp.asarray(pack_bits(bits[:32]))
        for eng in ("exact", "approx", "beam"):
            _, ids = dm.serve_topk(idx, q, 5, engine=eng, chunk=32)
            hit = float((ids[:, 0] == np.arange(32)).mean())
            assert hit >= 0.9, (eng, hit)
