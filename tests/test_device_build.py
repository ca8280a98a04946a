"""Batched device build tests: recall and semantics parity vs host build."""

import numpy as np
import pytest

from pgvector_rx_tpu.config import IndexParams, SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex

from test_index import brute_force, recall_at_k


class TestDeviceBuild:
    def test_recall_l2(self):
        rng = np.random.default_rng(50)
        data = rng.standard_normal((1200, 12)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="device", seed=51)
        q = rng.standard_normal((20, 12)).astype(np.float32)
        gt = brute_force(data, q, "l2", 10)
        _, ids = idx.search(q, 10, SearchParams(ef_search=40), method="host")
        assert recall_at_k(ids, gt, 10) >= 0.98

    @pytest.mark.parametrize("metric", ["cosine", "ip"])
    def test_recall_other_metrics(self, metric):
        rng = np.random.default_rng(52)
        data = rng.standard_normal((800, 10)).astype(np.float32)
        idx = HnswIndex.build(data, metric=metric, method="device", seed=53)
        q = rng.standard_normal((15, 10)).astype(np.float32)
        gt = brute_force(data, q, metric, 10)
        _, ids = idx.search(q, 10, SearchParams(ef_search=40), method="host")
        assert recall_at_k(ids, gt, 10) >= 0.93

    def test_duplicate_folding(self):
        data = np.tile(np.array([[1.0, 2.0, 3.0]], dtype=np.float32), (20, 1))
        idx = HnswIndex.build(data, metric="l2", method="device")
        counts = sorted((len(t) for t in idx.heap_tids if t), reverse=True)
        assert counts[0] == 10
        assert idx.num_tuples == 20

    def test_cosine_zero_norm_skipped(self):
        data = np.array([[1, 0], [0, 0], [0, 1], [1, 1]], dtype=np.float32)
        idx = HnswIndex.build(data, metric="cosine", method="device")
        assert idx.num_tuples == 3

    def test_built_index_supports_mutation(self):
        """Device-built indexes must feed the same insert/delete paths."""
        rng = np.random.default_rng(54)
        data = rng.random((300, 8)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="device", seed=55)
        idx.insert(rng.random(8).astype(np.float32), 999)
        idx.delete([0, 1, 2])
        _, ids = idx.search(data[5], 5, method="host")
        assert 5 in set(ids)
        assert not ({0, 1, 2} & set(ids))

    def test_layer_degree_bounds(self):
        rng = np.random.default_rng(56)
        data = rng.random((500, 6)).astype(np.float32)
        m = 8
        idx = HnswIndex.build(
            data, metric="l2", method="device",
            params=IndexParams(m=m, ef_construction=32), seed=57,
        )
        for e in idx.elements:
            assert len(e.neighbors[0]) <= 2 * m
            for lc in range(1, e.level + 1):
                assert len(e.neighbors[lc]) <= m

    def test_entry_is_max_level(self):
        rng = np.random.default_rng(58)
        data = rng.random((400, 6)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="device", seed=59)
        assert idx.elements[idx.entry].level == max(e.level for e in idx.elements)


class TestServingOnlyBuild:
    def test_host_graph_false_serves_and_guards(self):
        import numpy as np
        import pytest

        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(11)
        data = rng.standard_normal((400, 24)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="l2", method="device", seed=0, host_graph=False
        )
        assert idx.serving_only
        q = data[:50]
        d, ids = idx.search(q, 5, SearchParams(), method="exact")
        assert (ids[:, 0] == np.arange(50)).mean() > 0.99
        d2, ids2 = idx.search(q, 5, SearchParams(ef_search=40), method="device")
        assert (ids2[:, 0] == np.arange(50)).mean() > 0.9
        with pytest.raises(RuntimeError):
            idx.insert(data[0], 1000)
        with pytest.raises(RuntimeError):
            idx.delete([3])

    def test_cosine_bulk_prepare_skips_zero_rows(self):
        import numpy as np

        from pgvector_rx_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(12)
        data = rng.standard_normal((100, 8)).astype(np.float32)
        data[7] = 0.0  # zero-norm row must be skipped (build.rs:426-438)
        idx = HnswIndex.build(data, metric="cosine", method="device", seed=0)
        assert idx.num_tuples == 99
        tids = {t for tl in idx.heap_tids for t in tl}
        assert 7 not in tids

    def test_serving_only_save_load_roundtrip(self, tmp_path):
        import numpy as np

        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(13)
        data = rng.standard_normal((300, 16)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="l2", method="device", seed=0, host_graph=False
        )
        q = data[:24]
        d0, i0 = idx.search(q, 5, SearchParams(ef_search=32), method="device")
        idx.save(tmp_path / "ck")
        idx2 = HnswIndex.load(tmp_path / "ck")
        assert idx2.serving_only
        d1, i1 = idx2.search(q, 5, SearchParams(ef_search=32), method="device")
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(d0, d1, rtol=1e-5)
        d2, i2 = idx2.search(q, 5, SearchParams(), method="exact")
        assert (i2[:, 0] == np.arange(24)).all()


class TestBulkInsert:
    """Batched device insert into an existing index (insert_bulk)."""

    def test_insert_recall(self):
        rng = np.random.default_rng(60)
        base = rng.standard_normal((1000, 12)).astype(np.float32)
        extra = rng.standard_normal((1000, 12)).astype(np.float32)
        idx = HnswIndex.build(base, metric="l2", method="device", seed=61)
        added = idx.insert_bulk(extra)
        assert added == 1000
        assert len(idx.elements) == 2000
        data = np.concatenate([base, extra])
        q = rng.standard_normal((20, 12)).astype(np.float32)
        gt = brute_force(data, q, "l2", 10)
        _, ids = idx.search(q, 10, SearchParams(ef_search=40), method="host")
        assert recall_at_k(ids, gt, 10) >= 0.97

    def test_new_rows_reachable_from_old_graph(self):
        rng = np.random.default_rng(62)
        base = rng.standard_normal((600, 8)).astype(np.float32)
        extra = rng.standard_normal((200, 8)).astype(np.float32) + 3.0
        idx = HnswIndex.build(base, metric="l2", method="device", seed=63)
        idx.insert_bulk(extra, tids=range(600, 800))
        # every inserted row finds itself through the graph scan
        _, ids = idx.search(extra[:20], 1, SearchParams(ef_search=40),
                            method="host")
        got = np.asarray(ids).ravel()
        assert (got == np.arange(600, 620)).mean() >= 0.9

    def test_duplicate_folding_into_existing(self):
        rng = np.random.default_rng(64)
        base = rng.standard_normal((300, 6)).astype(np.float32)
        idx = HnswIndex.build(base, metric="l2", method="device", seed=65)
        n0 = len(idx.elements)
        # re-insert copies of existing rows: TIDs fold, no new elements
        added = idx.insert_bulk(base[:40].copy(), tids=range(1000, 1040))
        assert added == 0
        assert idx.num_tuples == 340
        counts = [len(t) for t in idx.heap_tids[:40]]
        assert all(c == 2 for c in counts)

    def test_entry_promotion_and_empty_index(self):
        rng = np.random.default_rng(66)
        idx = HnswIndex(8, metric="l2")
        idx.insert_bulk(rng.standard_normal((500, 8)).astype(np.float32))
        assert idx.entry is not None
        assert idx.count == 500
        lev = max(e.level for e in idx.elements)
        assert idx.elements[idx.entry].level == lev

    def test_after_delete_not_candidates(self):
        rng = np.random.default_rng(67)
        base = rng.standard_normal((400, 8)).astype(np.float32)
        idx = HnswIndex.build(base, metric="l2", method="device", seed=68)
        idx.delete(range(200))
        extra = rng.standard_normal((100, 8)).astype(np.float32)
        idx.insert_bulk(extra, tids=range(400, 500))
        _, ids = idx.search(extra[:10], 3, SearchParams(ef_search=40),
                            method="host")
        flat = np.asarray(ids).ravel()
        assert not set(flat.tolist()) & set(range(200))

    def test_serving_only_bulk_insert(self):
        rng = np.random.default_rng(69)
        base = rng.standard_normal((500, 8)).astype(np.float32)
        idx = HnswIndex.build(base, metric="l2", method="device",
                              host_graph=False)
        extra = rng.standard_normal((100, 8)).astype(np.float32)
        idx.insert_bulk(extra, tids=range(500, 600))
        data = np.concatenate([base, extra])
        q = extra[:10]
        gt = brute_force(data, q, "l2", 5)
        _, ids = idx.search(q, 5, SearchParams(ef_search=40))
        assert recall_at_k(ids, gt, 5) >= 0.95


def test_stream_upload_build_identical(monkeypatch):
    """Chunk-streamed corpus upload must produce a graph identical to
    the single-upload build (same programs, same data — only the
    transfer mechanics differ)."""
    from pgvector_rx_tpu.graph import device_build

    rng = np.random.default_rng(71)
    # > 2 chunks: the chunk floor is 4096 rows, so 12k rows -> 3 chunks
    data = rng.standard_normal((12000, 16)).astype(np.float32)

    monkeypatch.setattr(device_build, "_STREAM_MIN_BYTES", 1 << 40)  # off
    ref = HnswIndex.build(data, metric="l2", method="device", seed=72)

    monkeypatch.setattr(device_build, "_STREAM_MIN_BYTES", 0)  # on
    monkeypatch.setattr(device_build, "_STREAM_CHUNK_BYTES", 1)
    got = HnswIndex.build(data, metric="l2", method="device", seed=72)

    assert got.entry == ref.entry
    for a, b in zip(got.elements, ref.elements):
        assert a.level == b.level
        assert [n for _, n in a.neighbors[0]] == [n for _, n in b.neighbors[0]]


def test_stream_upload_bulk_insert(monkeypatch):
    """Streaming stays correct through the transplant path (existing
    rows must be resident before edge-distance recompute)."""
    from pgvector_rx_tpu.graph import device_build

    monkeypatch.setattr(device_build, "_STREAM_MIN_BYTES", 0)
    monkeypatch.setattr(device_build, "_STREAM_CHUNK_BYTES", 1)
    rng = np.random.default_rng(73)
    base = rng.standard_normal((6000, 16)).astype(np.float32)
    extra = rng.standard_normal((3000, 16)).astype(np.float32)
    idx = HnswIndex.build(base, metric="l2", method="device", seed=74)
    idx.insert_bulk(extra)
    data = np.concatenate([base, extra])
    q = rng.standard_normal((20, 16)).astype(np.float32)
    gt = brute_force(data, q, "l2", 10)
    _, ids = idx.search(q, 10, SearchParams(ef_search=40), method="host")
    assert recall_at_k(ids, gt, 10) >= 0.95


def test_ivf_ground_candidates_build(monkeypatch):
    """PGV_BUILD_GROUND=ivf: descent-regime candidates from the member
    table (all-MXU) instead of beam descent; recall must hold."""
    from pgvector_rx_tpu.graph import device_build

    monkeypatch.setattr(device_build, "_DESCENT_MIN_WIDTH", 2048)
    monkeypatch.setenv("PGV_BUILD_GROUND", "ivf")
    rng = np.random.default_rng(13)
    data = rng.standard_normal((6000, 10)).astype(np.float32)
    idx = HnswIndex.build(data, metric="l2", method="device", seed=3)
    assert idx.num_tuples == 6000
    q = rng.standard_normal((30, 10)).astype(np.float32)
    gt = brute_force(data, q, "l2", 10)
    _, ids = idx.search(q, 10, SearchParams(ef_search=40), method="host")
    assert recall_at_k(ids, gt, 10) >= 0.95
    # late rows (inserted through the ivf path) reachable via the graph
    _, sids = idx.search(data[5800:5820], 1, SearchParams(ef_search=40),
                         method="host")
    got = np.asarray(sids).ravel()
    assert (got == np.arange(5800, 5820)).mean() >= 0.9


def test_descent_build_small_efc(monkeypatch):
    """Regression: efc<=16 made the descent beam's seed count equal its
    width and overflow the init scatter (S+1 > W trace crash)."""
    from pgvector_rx_tpu.graph import device_build

    # the env knob is read at import time; patch the module constant
    monkeypatch.setattr(device_build, "_DESCENT_MIN_WIDTH", 2048)
    rng = np.random.default_rng(12)
    data = rng.standard_normal((4100, 8)).astype(np.float32)
    idx = HnswIndex.build(
        data, metric="l2", method="device",
        params=IndexParams(m=8, ef_construction=16), seed=2,
    )
    assert idx.num_tuples == 4100
    d, ids = idx.search(
        data[:8], 3, SearchParams(ef_search=4), method="device"
    )
    # small ef through the coarse-seeded beam (regression: 8 seeds
    # overflowed an ef<8 beam)
    assert (np.asarray(ids)[:, 0] == np.arange(8)).all()


def test_beam_merge_rank_matches_sort(monkeypatch):
    """The rank-merge descent beam (pairwise-comparison ranking over a
    sorted-beam invariant) must produce bit-identical candidates to the
    lax.sort merge on tie-free data — same dedup semantics, same
    expansion choices, step for step."""
    import jax.numpy as jnp

    from pgvector_rx_tpu.graph import device_build
    from pgvector_rx_tpu.graph.device_build import (
        DeviceBuilder,
        batch_schedule,
    )

    monkeypatch.setattr(device_build, "_DESCENT_MIN_WIDTH", 2048)
    rng = np.random.default_rng(5)
    n = 5000
    dim = 16
    data = rng.standard_normal((n, dim)).astype(np.float32)
    ml = 1.0 / np.log(8)
    levels = np.minimum(
        np.floor(-np.log(rng.random(n)) * ml).astype(np.int32), 30
    )
    b = DeviceBuilder("l2", data, levels, 8, 32)
    b.seed_first(0)
    sched = batch_schedule(n, b.batch_max)
    cut = [i for i, (s, z) in enumerate(sched) if s + 1 > b.descent_min]
    b.run_all(sched[: cut[0] + 1])
    start = sched[cut[0] + 1][0]

    B = b.batch_max
    qi = rng.integers(0, start, size=B)
    q_rows = jnp.asarray(data[qi])
    S = 8
    seed_ids = rng.permutation(start)[:S][None, :].repeat(B, axis=0)
    d = ((data[qi][:, None, :] - data[seed_ids[0]][None]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)
    seed_d = jnp.asarray(np.take_along_axis(d, order, 1))
    seed_ids = jnp.asarray(np.take_along_axis(seed_ids, order, 1))

    outs = {}
    for merge in ("sort", "rank"):
        bd, bids = b._beam_ground_candidates(
            b.data, b.arrays.nb0c, b.arrays.alive, b.arrays.entry,
            q_rows, seed_d, seed_ids, steps=8, expand=4, dedup=True,
            merge=merge,
        )
        outs[merge] = (np.asarray(bd), np.asarray(bids))
    np.testing.assert_array_equal(outs["sort"][1], outs["rank"][1])
    np.testing.assert_array_equal(outs["sort"][0], outs["rank"][0])


def test_packed_adjacency_roundtrip():
    """The combined id+bf16-dist layout (one scatter per graph mutation)
    must round-trip bit-exactly, including the odd-m upper padding."""
    import jax.numpy as jnp

    from pgvector_rx_tpu.graph.device_build import (
        _pack_nbrc, _split_nbrc, _upper_pack, _upper_unpack,
    )

    rng = np.random.default_rng(7)
    # ground layer: k = 2m, always even
    k = 12
    ids = rng.integers(-1, 5000, (9, k)).astype(np.int32)
    d = rng.random((9, k)).astype(np.float32)
    d[ids < 0] = np.inf
    comb = _pack_nbrc(jnp.asarray(ids), jnp.asarray(d))
    assert comb.shape == (9, k + k // 2)
    r_ids, r_d = _split_nbrc(comb, k)
    np.testing.assert_array_equal(np.asarray(r_ids), ids)
    np.testing.assert_array_equal(
        np.asarray(r_d), d.astype(jnp.bfloat16)
    )

    # upper layers: odd m pads one inf bf16 slot per layer
    for m in (5, 8):
        mp2 = (m + 1) // 2
        L = 3
        uids = rng.integers(-1, 5000, (7, L * m)).astype(np.int32)
        ud = rng.random((7, L * m)).astype(np.float32)
        ud[uids < 0] = np.inf
        ucomb = _upper_pack(jnp.asarray(uids), jnp.asarray(ud), m, mp2)
        assert ucomb.shape == (7, L * (m + mp2))
        ru_ids, ru_d = _upper_unpack(ucomb, m, mp2)
        np.testing.assert_array_equal(np.asarray(ru_ids), uids)
        np.testing.assert_array_equal(
            np.asarray(ru_d), ud.astype(jnp.bfloat16)
        )


def test_device_build_odd_m_recall():
    """Odd m exercises the padded upper-layer dist packing end to end."""
    rng = np.random.default_rng(31)
    data = rng.standard_normal((3000, 16)).astype(np.float32)
    idx = HnswIndex.build(
        data, metric="l2", method="device",
        params=IndexParams(m=5, ef_construction=32), seed=3,
    )
    q = rng.standard_normal((30, 16)).astype(np.float32)
    gt = brute_force(data, q, "l2", 10)
    _, ids = idx.search(q, 10, SearchParams(ef_search=60), method="host")
    assert recall_at_k(ids, gt, 10) >= 0.9


class TestBitDeviceBuild:
    """Bit-hamming rides the dense device builder on unpacked {0,1}
    rows (hamming == squared l2); the serving graph packs back to
    words on device."""

    @staticmethod
    def _data(rng, n, nbits):
        return (rng.random((n, nbits)) < 0.5).astype(np.uint8)

    def test_build_recall_and_store(self, rng):
        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        bits = self._data(rng, 600, 64)
        idx = HnswIndex.build(bits, metric="hamming", method="device",
                              seed=3)
        assert idx.kind == "bit"
        assert idx.store.rows.dtype == np.uint8
        assert idx.store.rows.shape[1] == 8  # packed bytes
        # exact engine over the device graph: recall 1.0 vs numpy GT
        q = bits[:20]
        d, tids = idx.search(q, 10, SearchParams(ef_search=40),
                             method="device")
        ham = (q[:, None, :] != bits[None, :, :]).sum(-1)
        gt_d = np.sort(ham, axis=1)[:, :10]
        np.testing.assert_allclose(d, gt_d, atol=1e-6)
        # beam engine walks the built graph
        from pgvector_rx_tpu.graph import device as dev

        d_b, tids_b = dev.search(idx, q, 10, SearchParams(ef_search=40),
                                 engine="beam")
        rec = np.mean([
            len(set(tids_b[b]) & set(np.argsort(ham[b],
                kind="stable")[:10])) / 10
            for b in range(20)
        ])
        assert rec >= 0.8, rec

    def test_duplicate_folding_caps_at_10(self, rng):
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        row = (rng.random(64) < 0.5).astype(np.uint8)
        bits = np.concatenate(
            [np.tile(row, (25, 1)), self._data(rng, 200, 64)]
        )
        idx = HnswIndex.build(bits, metric="hamming", method="device",
                              seed=3, host_graph=False)
        counts = sorted(
            (len(t) for t in idx.heap_tids if t), reverse=True
        )
        # 25 identical rows -> one 10-TID element + spill elements
        assert counts[0] == 10
        assert sum(c for c in counts if c) == 225

    def test_host_graph_build_supports_mutation(self, rng):
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        bits = self._data(rng, 300, 32)
        idx = HnswIndex.build(bits, metric="hamming", method="device",
                              seed=3, host_graph=True)
        assert len(idx.elements) > 0
        n0 = idx.num_tuples
        idx.insert((rng.random(32) < 0.5).astype(np.uint8), tid=10_000)
        assert idx.num_tuples == n0 + 1
        assert idx.delete([0]) == 1
        idx.vacuum()

    def test_serving_only_save_load_equivalence(self, rng, tmp_path):
        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        bits = self._data(rng, 400, 64)
        idx = HnswIndex.build(bits, metric="hamming", method="device",
                              seed=3, host_graph=False)
        idx.save(tmp_path / "bitidx")
        idx2 = HnswIndex.load(tmp_path / "bitidx")
        q = bits[:8]
        d1, t1 = idx.search(q, 5, SearchParams())
        d2, t2 = idx2.search(q, 5, SearchParams())
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_allclose(d1, d2)

    def test_jaccard_device_build(self, rng):
        """Jaccard rides the dense builder too: jac = 2·l2²/(qpop+
        rowpop+l2²) over unpacked {0,1} rows (device_build._l2_to_jaccard),
        exact in f32. Exact engine matches numpy GT distances; the beam
        walks a graph built under true jaccard ordering."""
        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.graph import device as dev
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        bits = self._data(rng, 600, 64)
        bits[0] = 0  # zero row: jaccard 1.0 to everything incl. itself
        bits[1] = 0  # identical zero rows must NOT duplicate-fold
        idx = HnswIndex.build(bits, metric="jaccard", method="device",
                              seed=3)
        assert idx.kind == "bit"
        assert all(len(t) == 1 for t in idx.heap_tids[:2])
        q = bits[2:22]
        inter = (q[:, None, :] & bits[None, :, :]).sum(-1)
        union = (q[:, None, :] | bits[None, :, :]).sum(-1)
        jac = np.where(inter == 0, 1.0, 1.0 - inter / np.maximum(union, 1))
        d, tids = idx.search(q, 10, SearchParams(ef_search=40),
                             method="device")
        gt_d = np.sort(jac, axis=1)[:, :10]
        np.testing.assert_allclose(d, gt_d, atol=1e-6)
        d_b, tids_b = dev.search(idx, q, 10, SearchParams(ef_search=40),
                                 engine="beam")
        rec = np.mean([
            len(set(tids_b[b]) & set(np.argsort(jac[b],
                kind="stable")[:10])) / 10
            for b in range(20)
        ])
        assert rec >= 0.8, rec


def test_ground_auto_is_dim_aware(monkeypatch):
    """auto ground: ivf for MXU metrics below 512 dims, beam descent
    at high dim (r5 arms: 768-d cosine ivf-hop tops out at 0.924
    beam-serving recall vs the 0.95 bar; beam ground reads 0.961 —
    DESIGN.md 6p) and for non-MXU metrics at any dim."""
    from pgvector_rx_tpu.graph.device_build import DeviceBuilder

    monkeypatch.delenv("PGV_BUILD_GROUND", raising=False)
    rng = np.random.default_rng(0)

    def builder(metric, dim):
        vecs = rng.standard_normal((64, dim)).astype(np.float32)
        levels = np.zeros(64, dtype=np.int32)
        return DeviceBuilder(metric, vecs, levels, 16, 64)

    assert builder("l2", 128).ivf is True
    assert builder("cosine", 128).ivf is True
    assert builder("cosine", 768).ivf is False
    assert builder("ip", 1024).ivf is False
    assert builder("l1", 128).ivf is False


def test_shape_floors_match_builder(monkeypatch):
    """shape_floors_for must predict the EXACT upper-table pads a
    DeviceBuilder picks for the same level draws — the invariant that
    keeps bench.py's warmup build compiling the main build's program
    set (a missed pad bucket re-pays a 45-171s compile INSIDE the
    timed build; DESIGN.md 6t)."""
    from pgvector_rx_tpu.graph import device_build as db
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    for env in ("PGV_BUILD_UPPER_FLOOR", "PGV_BUILD_SUB_FLOORS",
                "PGV_BUILD_CAP_FLOOR"):
        monkeypatch.delenv(env, raising=False)
    n, dim = 5000, 8
    idx = HnswIndex(dim, metric="l2", seed=3)
    lv = idx.random_levels(n)
    uf, subs = db.shape_floors_for(n, idx.params.m, lv)
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    b = db.DeviceBuilder("l2", vecs, lv.copy(), idx.params.m,
                         idx.params.ef_construction)
    assert b.data.upper_vectors.shape[0] == uf, (
        b.data.upper_vectors.shape, uf
    )
    sub_pads = [int(x) for x in subs.split(",") if x]
    assert len(sub_pads) == len(b.data.upper_sub)
    for want, (ids_l, _, _) in zip(sub_pads, b.data.upper_sub):
        assert ids_l.shape[0] == want, (ids_l.shape, want)
