"""Index behavior tests.

Mirrors the reference's TAP-test categories (tests/t/*.pl):
- build recall    (012/020/024/028) — ground truth via brute force
- insert recall   (013)
- duplicates      (015) — 10-TID cap, ef_search=1 visibility
- vacuum          (011/014) — delete/repair recall, reinsert stability
- iterative scan  (043/044) — strict/relaxed, max_scan_tuples
- WAL analog      (010) — checkpoint + log replay equivalence

Scaled down (1-2k rows vs 10k) to keep the host reference path fast;
the full-size sweeps run in bench.py on device.
"""

import os

import numpy as np
import pytest

from pgvector_rx_tpu.config import IndexParams, SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex
from pgvector_rx_tpu.types import SparseVec


def brute_force(data, queries, metric, k):
    d = data.astype(np.float64)
    q = queries.astype(np.float64)
    if metric == "l2":
        dist = ((q[:, None, :] - d[None, :, :]) ** 2).sum(-1)
    elif metric == "ip":
        dist = -(q @ d.T)
    elif metric == "cosine":
        dn = d / np.linalg.norm(d, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        dist = 1.0 - qn @ dn.T
    elif metric == "l1":
        dist = np.abs(q[:, None, :] - d[None, :, :]).sum(-1)
    elif metric == "hamming":
        dist = (q[:, None, :] != d[None, :, :]).sum(-1).astype(np.float64)
    elif metric == "jaccard":
        inter = ((q[:, None, :] > 0) & (d[None, :, :] > 0)).sum(-1)
        union = ((q[:, None, :] > 0) | (d[None, :, :] > 0)).sum(-1)
        dist = np.where(
            inter == 0, 1.0, 1.0 - inter / np.maximum(union, 1)
        )
    return np.argsort(dist, axis=1, kind="stable")[:, :k]


def recall_at_k(ids, gt, k):
    return np.mean(
        [len(set(ids[b][ids[b] >= 0]) & set(gt[b])) / k for b in range(len(gt))]
    )


@pytest.fixture(scope="module")
def l2_index_and_data():
    rng = np.random.default_rng(7)
    data = rng.random((600, 10)).astype(np.float32)
    idx = HnswIndex.build(data, metric="l2", method="host", seed=1)
    return idx, data


class TestBuildRecall:
    """012_hnsw_vector_build_recall analog (threshold >=0.99, >=0.97 IP)."""

    @pytest.mark.parametrize("metric", ["l2", "cosine", "l1", "ip"])
    def test_recall(self, metric):
        rng = np.random.default_rng(3)
        data = rng.standard_normal((600, 8)).astype(np.float32)
        idx = HnswIndex.build(data, metric=metric, method="host", seed=2)
        queries = rng.standard_normal((20, 8)).astype(np.float32)
        gt = brute_force(data, queries, metric, 10)
        _, ids = idx.search(queries, 10, SearchParams(ef_search=40), method="host")
        threshold = 0.97 if metric == "ip" else 0.99
        assert recall_at_k(ids, gt, 10) >= threshold

    def test_low_dim_exact(self, l2_index_and_data):
        idx, data = l2_index_and_data
        queries = data[:20]
        gt = brute_force(data, queries, "l2", 5)
        dists, ids = idx.search(queries, 5, method="host")
        assert recall_at_k(ids, gt, 5) >= 0.99
        # nearest is the point itself at distance 0
        assert np.allclose(dists[:, 0], 0.0)

    def test_operator_distances_are_euclidean(self, l2_index_and_data):
        idx, data = l2_index_and_data
        q = data[3] + 0.01
        dists, ids = idx.search(q, 3, method="host")
        for d, i in zip(dists, ids):
            true = np.sqrt(((data[i] - q) ** 2).sum())
            assert d == pytest.approx(true, rel=1e-5)

    def test_device_matches_host(self, l2_index_and_data):
        idx, data = l2_index_and_data
        rng = np.random.default_rng(5)
        queries = rng.random((8, 10)).astype(np.float32)
        dh, ih = idx.search(queries, 10, method="host")
        dd, idv = idx.search(queries, 10, method="device")
        assert np.array_equal(ih, idv)
        np.testing.assert_allclose(dh, dd, rtol=1e-5)

    def test_empty_index(self):
        idx = HnswIndex(4, metric="l2")
        dists, ids = idx.search(np.zeros(4, dtype=np.float32), 5, method="host")
        assert (ids == -1).all()

    def test_null_like_skip_cosine_zero(self):
        # build.rs:426-438: zero-norm rows skipped under cosine
        data = np.array([[1, 0], [0, 0], [0, 1]], dtype=np.float32)
        idx = HnswIndex.build(data, metric="cosine", method="host")
        assert idx.num_tuples == 2

    def test_ef_construction_rule(self):
        with pytest.raises(ValueError, match="greater than or equal to 2"):
            HnswIndex(4, params=IndexParams(m=16, ef_construction=16))

    def test_dim_cap(self):
        with pytest.raises(ValueError, match="more than 2000 dimensions"):
            HnswIndex(2001, metric="l2")
        # halfvec cap is 4000
        HnswIndex(2001, metric="l2", dtype=np.float16)
        with pytest.raises(ValueError, match="more than 4000 dimensions"):
            HnswIndex(4001, metric="l2", dtype=np.float16)


class TestInsertRecall:
    """013_hnsw_vector_insert_recall analog: rows added via aminsert."""

    def test_insert_after_create(self):
        rng = np.random.default_rng(11)
        data = rng.random((400, 8)).astype(np.float32)
        idx = HnswIndex(8, metric="l2", seed=3)
        for i, row in enumerate(data):
            idx.insert(row, i)
        queries = rng.random((20, 8)).astype(np.float32)
        gt = brute_force(data, queries, "l2", 10)
        _, ids = idx.search(queries, 10, SearchParams(ef_search=40), method="host")
        assert recall_at_k(ids, gt, 10) >= 0.99

    def test_inserted_rows_all_reachable(self):
        """016_hnsw_inserts analog: every inserted row must stay
        reachable through the graph (the reference tolerates >=997/1000
        under 20-client races, 016:63-70; our batched-deterministic
        insert path must not lose any)."""
        rng = np.random.default_rng(16)
        base = rng.random((200, 8)).astype(np.float32)
        idx = HnswIndex.build(base, metric="l2", method="host", seed=4)
        for i in range(1000):
            idx.insert(rng.random(8).astype(np.float32), 200 + i)
        scan = idx.scan(
            base[0],
            SearchParams(
                ef_search=40,
                iterative_scan="relaxed_order",
                max_scan_tuples=10**6,
            ),
        )
        seen = {tid for tid, _ in iter(scan.next, None)}
        assert len(seen) == 1200

    def test_entry_promotion(self):
        idx = HnswIndex(4, metric="l2", seed=0)
        rng = np.random.default_rng(0)
        for i in range(200):
            idx.insert(rng.random(4).astype(np.float32), i)
        entry_level = idx.elements[idx.entry].level
        assert entry_level == max(e.level for e in idx.elements)


class TestDuplicates:
    """015_hnsw_vector_duplicates analog."""

    def test_cap_10_tids(self):
        # 20 identical vectors -> 1 element with 10 TIDs + extra elements
        data = np.tile(np.array([[1.0, 2.0, 3.0]], dtype=np.float32), (20, 1))
        idx = HnswIndex.build(data, metric="l2", method="host")
        counts = sorted((len(t) for t in idx.heap_tids if t), reverse=True)
        assert counts[0] == 10
        # with ef_search=1 exactly 10 rows are visible (015:26-32)
        dists, ids = idx.search(
            np.array([1.0, 2.0, 3.0], dtype=np.float32),
            20,
            SearchParams(ef_search=1),
            method="host",
        )
        assert (ids >= 0).sum() == 10

    def test_duplicate_is_byte_equal_not_distance_zero(self):
        # ip distance can be 0 for non-identical vectors; they must NOT
        # be folded as duplicates (build.rs:480-482)
        data = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 2.0]], dtype=np.float32)
        idx = HnswIndex.build(data, metric="ip", method="host")
        assert sum(1 for t in idx.heap_tids if t) == 3


class TestVacuum:
    """011/014 analogs: delete-all + reinsert, vacuum repair recall."""

    def test_delete_all_and_reinsert_reuses_slots(self):
        rng = np.random.default_rng(4)
        data = rng.random((300, 6)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=5)
        n_slots = len(idx.elements)
        idx.delete(range(300))
        assert idx.num_tuples == 0
        assert idx.entry is None
        idx.add_batch(data, range(300, 600))
        # slot reuse: the arena must not grow more than ~2% (011:43)
        assert len(idx.elements) <= int(n_slots * 1.02) + 1
        _, ids = idx.search(data[7], 1, method="host")
        assert ids[0] == 307

    def test_vacuum_repair_recall(self):
        # 014: m=4/efc=8, delete 75%, recall must recover post-repair
        rng = np.random.default_rng(9)
        data = rng.random((400, 6)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="l2", params=IndexParams(m=4, ef_construction=8),
            method="host", seed=6,
        )
        keep = np.arange(400) % 4 == 0  # keep 25%
        idx.delete(np.nonzero(~keep)[0])
        kept_data = data[keep]
        kept_ids = np.nonzero(keep)[0]
        queries = rng.random((15, 6)).astype(np.float32)
        gt_local = brute_force(kept_data, queries, "l2", 10)
        gt = kept_ids[gt_local]
        _, ids = idx.search(queries, 10, SearchParams(ef_search=40), method="host")
        assert recall_at_k(ids, gt, 10) >= 0.95

    def test_delete_one_leaves_rest(self):
        data = np.array([[0.0], [1.0], [2.0]], dtype=np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host")
        idx.delete([1])
        _, ids = idx.search(np.array([1.1], dtype=np.float32), 3, method="host")
        assert set(ids[ids >= 0]) == {0, 2}

    def test_version_bump_and_wrap(self):
        data = np.array([[0.0], [1.0]], dtype=np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host")
        idx.delete([1])
        dead = [i for i, e in enumerate(idx.elements) if e.deleted][0]
        assert idx.elements[dead].version == 2
        idx.elements[dead].version = 15
        from pgvector_rx_tpu.index import vacuum as vac

        vac._mark_deleted(idx, {dead})
        assert idx.elements[dead].version == 1  # 15 -> 1 wrap


class TestMixedWorkload:
    """016_hnsw_inserts analog: the reference stresses 10-20 concurrent
    backends inserting 1000 rows and tolerates >= 997/1000 reachable
    (elements may lose all in-edges under concurrent pruning,
    016:63-70). Here the concurrency story is batched device inserts
    with deterministic conflict resolution, so the analog interleaves
    insert_bulk / delete / vacuum / scans and holds the same bar."""

    def test_interleaved_bulk_insert_reachability(self):
        rng = np.random.default_rng(160)
        data0 = rng.standard_normal((200, 8)).astype(np.float32)
        idx = HnswIndex.build(data0, metric="l2", method="host", seed=161)
        all_rows = {i: data0[i] for i in range(200)}
        next_tid = 200
        for round_ in range(5):
            batch = rng.standard_normal((200, 8)).astype(np.float32)
            tids = list(range(next_tid, next_tid + 200))
            idx.insert_bulk(batch, tids=tids)
            for t, row in zip(tids, batch):
                all_rows[t] = row
            next_tid += 200
            # interleave deletes + vacuum repair every other round
            if round_ % 2 == 1:
                dead = rng.choice(sorted(all_rows), size=40, replace=False)
                idx.delete(dead)
                for t in dead:
                    all_rows.pop(int(t))
                idx.vacuum()
            # interleaved search must keep working mid-stream
            _, ids = idx.search(batch[0], 1, SearchParams(ef_search=40),
                                method="host")
            assert ids[0] >= 0
        live = [(t, r) for t, r in sorted(all_rows.items()) if r is not None]
        probe = live[:: max(1, len(live) // 400)][:400]
        hits = 0
        for t, row in probe:
            _, ids = idx.search(row, 1, SearchParams(ef_search=60),
                                method="host")
            hits += int(ids[0] == t)
        assert hits / len(probe) >= 0.997, f"{hits}/{len(probe)} reachable"


class TestIterativeScan:
    """043/044 analogs: filtered search via resumable scans."""

    @pytest.fixture(scope="class")
    def filtered_setup(self):
        rng = np.random.default_rng(21)
        data = rng.random((500, 6)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=8)
        return idx, data

    def test_relaxed_finds_filtered(self, filtered_setup):
        idx, data = filtered_setup
        # selective filter: only tids % 100 == 0 qualify (043 analog)
        q = data[0]
        params = SearchParams(
            ef_search=10, iterative_scan="relaxed_order", max_scan_tuples=20000
        )
        scan = idx.scan(q, params)
        found = []
        while len(found) < 5:
            item = scan.next()
            if item is None:
                break
            tid, d = item
            if tid % 100 == 0:
                found.append(tid)
        assert len(found) == 5  # non-iterative would exhaust after ef=10

    def test_off_mode_stops(self, filtered_setup):
        idx, data = filtered_setup
        scan = idx.scan(data[0], SearchParams(ef_search=10))
        items = scan.take(10000)
        # only one batch: at most ~ef results (each element >=1 tid)
        assert len(items) <= 15

    def test_strict_order_is_sorted(self, filtered_setup):
        idx, data = filtered_setup
        params = SearchParams(ef_search=10, iterative_scan="strict_order")
        scan = idx.scan(data[1], params)
        dists = [d for _, d in scan.take(200)]
        assert dists == sorted(dists)

    def test_relaxed_returns_more_than_strict_drops(self, filtered_setup):
        idx, data = filtered_setup
        q = data[2]
        relaxed = idx.scan(
            q, SearchParams(ef_search=10, iterative_scan="relaxed_order")
        ).take(300)
        strict = idx.scan(
            q, SearchParams(ef_search=10, iterative_scan="strict_order")
        ).take(300)
        assert len(relaxed) >= len(strict)

    def test_max_scan_tuples_cap(self, filtered_setup):
        idx, data = filtered_setup
        params = SearchParams(
            ef_search=10, iterative_scan="relaxed_order", max_scan_tuples=30
        )
        scan = idx.scan(data[3], params)
        items = scan.take(10000)
        # caps graph expansion; only pre-computed discarded drain after
        assert len(items) < 1000

    def test_budget_accuracy(self):
        """043 analog: avg tuples visible through a selective filter
        tracks max_scan_tuples * selectivity +-2 (043:35-56).

        The device iterative scan emits results in exact distance order
        and stops exactly at the budget, so the law holds tightly; the
        host graph scan additionally drains its discarded heap after
        the budget (scan.rs:828-841), which the reference's +-2
        tolerance absorbs at its 100k-row scale — here the host path is
        checked for the budget *mechanism* (no graph resumes past the
        cap) rather than the 100k-scale statistics."""
        rng = np.random.default_rng(43)
        n, sel_mod, budget = 10_000, 500, 1_000
        data = rng.random((n, 8)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="device", seed=9)
        expected = budget / sel_mod  # 2 visible per query on average
        counts = []
        for b in range(10):
            params = SearchParams(
                ef_search=40,
                iterative_scan="relaxed_order",
                max_scan_tuples=budget,
            )
            scan = idx.scan(data[b * 7], params, method="device")
            visible = sum(
                1 for tid, _ in iter(scan.next, None) if tid % sel_mod == 0
            )
            counts.append(visible)
        avg = float(np.mean(counts))
        assert abs(avg - expected) <= 2.0, (avg, expected, counts)

    def test_budget_stops_graph_resumes(self, filtered_setup):
        """Host path: once `tuples` passes max_scan_tuples no further
        graph re-entry happens — only the discarded heap drains."""
        idx, data = filtered_setup
        budget = 60
        params = SearchParams(
            ef_search=10, iterative_scan="relaxed_order",
            max_scan_tuples=budget,
        )
        scan = idx.scan(data[5], params)
        resumes_before = idx.stats["resumes"]
        while scan.next() is not None:
            pass
        # every resume must have started strictly under the budget
        assert scan.tuples >= budget  # budget was actually reached
        resumes = idx.stats["resumes"] - resumes_before
        # each resume returns >= 1 tuple, so resumes < budget always;
        # the real check: after exhaustion, one more next() is None and
        # doesn't resume again
        r2 = idx.stats["resumes"]
        assert scan.next() is None
        assert idx.stats["resumes"] == r2
        assert resumes <= budget

    def test_exhausts_all_tuples(self, filtered_setup):
        idx, data = filtered_setup
        params = SearchParams(
            ef_search=40, iterative_scan="relaxed_order", max_scan_tuples=20000
        )
        scan = idx.scan(data[4], params)
        items = scan.take(10**6)
        # iterative scan must eventually return every live tuple
        assert len(items) == idx.num_tuples


class TestPersistence:
    """010 WAL-replay analog: checkpoint + log replay equivalence."""

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(31)
        data = rng.random((300, 5)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=12)
        idx.save(tmp_path / "ckpt")
        loaded = HnswIndex.load(tmp_path / "ckpt")
        q = rng.random((10, 5)).astype(np.float32)
        d1, i1 = idx.search(q, 10, method="host")
        d2, i2 = loaded.search(q, 10, method="host")
        assert np.array_equal(i1, i2)
        np.testing.assert_allclose(d1, d2)

    def test_log_replay_equivalence(self, tmp_path):
        """Insert/delete cycles after checkpoint; replayed copy must
        answer queries identically (010:33-88 model)."""
        rng = np.random.default_rng(33)
        data = rng.random((200, 5)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=13)
        idx.save(tmp_path / "ckpt")
        idx.enable_log(tmp_path / "ckpt" / "log.jsonl")

        for cycle in range(3):
            idx.delete(range(cycle * 20, cycle * 20 + 20))
            for j in range(10):
                tid = 1000 + cycle * 10 + j
                idx.insert(rng.random(5).astype(np.float32), tid)

        replica = HnswIndex.load(tmp_path / "ckpt")
        q = rng.random((10, 5)).astype(np.float32)
        d1, i1 = idx.search(q, 10, method="host")
        d2, i2 = replica.search(q, 10, method="host")
        assert np.array_equal(i1, i2)
        np.testing.assert_allclose(d1, d2)

    def test_log_torn_tail_tolerated(self, tmp_path):
        """A crash mid-append leaves a half-written final line; replay
        must truncate it with a warning (torn WAL tail model) and keep
        every complete record. Corruption BEFORE the tail raises."""
        import warnings as _warnings

        rng = np.random.default_rng(34)
        data = rng.random((100, 5)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=13)
        idx.save(tmp_path / "ckpt")
        idx.enable_log(tmp_path / "ckpt" / "log.jsonl")
        v0, v1 = rng.random((2, 5)).astype(np.float32)
        idx.insert(v0, 500)
        idx.insert(v1, 501)
        log_path = tmp_path / "ckpt" / "log.jsonl"
        # simulate kill -9 mid-append: append half a record, no newline
        with open(log_path, "a", encoding="utf-8") as fh:
            fh.write('{"op": "insert", "tid": 502, "val')
        with _warnings.catch_warnings(record=True) as w:
            _warnings.simplefilter("always")
            replica = HnswIndex.load(tmp_path / "ckpt")
        assert any("torn" in str(x.message) for x in w)
        # both complete records replayed; the torn one never committed
        # on either side, so counts match
        assert replica.count == idx.count
        d1, i1 = idx.search(v1, 1, method="host")
        d2, i2 = replica.search(v1, 1, method="host")
        assert np.array_equal(i1, i2)
        # the torn tail was truncated away on disk: reload is clean
        with _warnings.catch_warnings(record=True) as w2:
            _warnings.simplefilter("always")
            HnswIndex.load(tmp_path / "ckpt")
        assert not any("torn" in str(x.message) for x in w2)
        # mid-file corruption is NOT tolerated
        lines = log_path.read_text().splitlines(keepends=True)
        log_path.write_text("{broken\n" + "".join(lines))
        with pytest.raises(ValueError, match="corrupt"):
            HnswIndex.load(tmp_path / "ckpt")

    def test_log_fsync_mode(self, tmp_path):
        """PGV_LOG_FSYNC / fsync kwarg drives os.fsync per record."""
        from pgvector_rx_tpu.index import storage

        rng = np.random.default_rng(35)
        data = rng.random((50, 5)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=13)
        log = storage.AppendLog(tmp_path / "log.jsonl", idx, fsync=True)
        assert log.fsync is True
        calls = []
        real_fsync = os.fsync
        try:
            os.fsync = lambda fd: calls.append(fd) or real_fsync(fd)
            log.record_insert(rng.random(5).astype(np.float32), 1)
        finally:
            os.fsync = real_fsync
        log.close()
        assert len(calls) == 1

    def test_log_fsync_default_on(self, tmp_path, monkeypatch):
        """Durability is the DEFAULT (every reference mutation is a
        GenericXLog record, insert.rs:216-263); PGV_LOG_FSYNC=0 is the
        explicit opt-out."""
        from pgvector_rx_tpu.index import storage

        rng = np.random.default_rng(35)
        data = rng.random((50, 5)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=13)
        monkeypatch.delenv("PGV_LOG_FSYNC", raising=False)
        log = storage.AppendLog(tmp_path / "log.jsonl", idx)
        assert log.fsync is True
        log.close()
        monkeypatch.setenv("PGV_LOG_FSYNC", "0")
        log = storage.AppendLog(tmp_path / "log2.jsonl", idx)
        assert log.fsync is False
        log.close()

    def test_log_batch_group_commit(self, tmp_path):
        """batch() amortizes: N records inside the context share ONE
        fsync at exit (bulk-insert group commit)."""
        from pgvector_rx_tpu.index import storage

        rng = np.random.default_rng(36)
        data = rng.random((50, 5)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=13)
        log = storage.AppendLog(tmp_path / "log.jsonl", idx, fsync=True)
        calls = []
        real_fsync = os.fsync
        try:
            os.fsync = lambda fd: calls.append(fd) or real_fsync(fd)
            with log.batch():
                for j in range(7):
                    log.record_insert(
                        rng.random(5).astype(np.float32), j
                    )
        finally:
            os.fsync = real_fsync
        log.close()
        assert len(calls) == 1
        # all seven records landed
        text = (tmp_path / "log.jsonl").read_text()
        assert text.count('"op": "insert"') == 7

    def test_log_torn_tail_byte_offsets(self, tmp_path):
        """Torn-tail truncation must use BYTE offsets: a multi-byte
        UTF-8 payload in the last complete record would be corrupted
        by a character-count truncate (r4 ADVICE)."""
        import warnings as _warnings

        rng = np.random.default_rng(37)
        data = rng.random((60, 5)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=13)
        idx.save(tmp_path / "ckpt")
        log_path = tmp_path / "ckpt" / "log.jsonl"
        v = [round(float(x), 3) for x in rng.random(5)]
        # a complete record carrying raw multi-byte UTF-8 (json.loads
        # accepts it; replay ignores unknown keys), then a torn tail
        with open(log_path, "w", encoding="utf-8") as fh:
            fh.write(
                '{"op": "insert", "tid": 700, "value": '
                + str(v)
                + ', "note": "λλλ — ünïcode"}\n'
            )
            fh.write('{"op": "insert", "tid": 701, "val')
        with _warnings.catch_warnings(record=True) as w:
            _warnings.simplefilter("always")
            replica = HnswIndex.load(tmp_path / "ckpt")
        assert any("torn" in str(x.message) for x in w)
        assert replica.count == idx.count + 1  # tid 700 applied
        # on-disk: exactly the one complete record, byte-identical
        raw = log_path.read_bytes()
        assert raw.endswith(b'code\xcc\x88"}\n') or raw.endswith(b'}\n')
        assert raw.count(b"\n") == 1
        import json as _json

        rec = _json.loads(raw.decode("utf-8"))
        assert rec["tid"] == 700

    def test_serving_load_of_host_checkpoint(self, tmp_path):
        """load(serving=True) converts a host-graph checkpoint to a
        serving-only index via vectorized numpy (the >2M Python
        materialization answer): identical DeviceGraph arrays and
        search results, correct live count across vacuumed gaps, and
        dense append-log inserts replayed through insert_bulk."""
        rng = np.random.default_rng(41)
        data = rng.standard_normal((1200, 8)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", method="host", seed=5)
        idx.delete(range(50, 150))
        idx.vacuum()
        idx.save(tmp_path / "ckpt")
        a = HnswIndex.load(tmp_path / "ckpt")
        b = HnswIndex.load(tmp_path / "ckpt", serving=True)
        assert b.serving_only and not b.elements
        assert b.count == a.count
        ga, gb = a.device_graph(), b.device_graph()
        for f in (
            "neighbors0",
            "upper_neighbors",
            "upper_slot",
            "levels",
            "traversable",
            "emit_tid",
            "tid_count",
        ):
            assert np.array_equal(
                np.asarray(getattr(ga, f)), np.asarray(getattr(gb, f))
            ), f
        q = rng.standard_normal((20, 8)).astype(np.float32)
        d1, i1 = a.search(q, 10)
        d2, i2 = b.search(q, 10)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        # pending dense log inserts replay via insert_bulk
        idx.enable_log(tmp_path / "ckpt" / "log.jsonl")
        for j in range(10):
            idx.insert(rng.standard_normal(8).astype(np.float32), 7000 + j)
        c = HnswIndex.load(tmp_path / "ckpt", serving=True)
        assert c.num_tuples == idx.num_tuples
        # logged deletes cannot apply to a serving-only load
        idx.delete([7000])
        with pytest.raises(ValueError, match="serving load"):
            HnswIndex.load(tmp_path / "ckpt", serving=True)

    def test_sparse_save_load(self, tmp_path):
        rows = [
            SparseVec.from_dense(r)
            for r in np.random.default_rng(2).random((50, 30)).astype(np.float32)
            * (np.random.default_rng(3).random((50, 30)) < 0.3)
        ]
        idx = HnswIndex.build(rows, metric="l2", method="host")
        idx.save(tmp_path / "sp")
        loaded = HnswIndex.load(tmp_path / "sp")
        q = rows[5]
        d1, i1 = idx.search(q, 5, method="host")
        d2, i2 = loaded.search(q, 5, method="host")
        assert np.array_equal(i1, i2)


class TestOtherTypes:
    def test_bit_index_recall(self):
        rng = np.random.default_rng(41)
        bits = rng.integers(0, 2, size=(300, 64)).astype(np.uint8)
        idx = HnswIndex.build(bits, metric="hamming", method="host", seed=14)
        q = bits[7]
        dists, ids = idx.search(q, 5, method="host")
        assert ids[0] == 7
        assert dists[0] == 0.0

    def test_jaccard_index(self):
        rng = np.random.default_rng(43)
        bits = rng.integers(0, 2, size=(300, 48)).astype(np.uint8)
        idx = HnswIndex.build(bits, metric="jaccard", method="host", seed=15)
        _, ids = idx.search(bits[3], 3, method="host")
        assert ids[0] == 3

    def test_sparse_index_recall(self):
        rng = np.random.default_rng(45)
        dense = rng.random((250, 40)).astype(np.float32)
        dense[rng.random((250, 40)) < 0.8] = 0.0
        dense[:, 0] += 0.01  # ensure no all-zero rows
        rows = [SparseVec.from_dense(r) for r in dense]
        idx = HnswIndex.build(rows, metric="l2", method="host", seed=16)
        gt = brute_force(dense, dense[:10], "l2", 5)
        _, ids = idx.search([rows[i] for i in range(10)], 5, method="host")
        assert recall_at_k(ids, gt, 5) >= 0.95

    def test_sparse_beam_engine_dense_q(self):
        """Sparse graph beam serving (dense-query gather distances) vs
        host scan and searchsorted beam: identical result sets."""
        import os

        rng = np.random.default_rng(46)
        dense = rng.random((300, 60)).astype(np.float32)
        dense[rng.random((300, 60)) < 0.8] = 0.0
        dense[:, 0] += 0.01
        rows = [SparseVec.from_dense(r) for r in dense]
        idx = HnswIndex.build(rows, metric="l2", method="host", seed=17)
        gt = brute_force(dense, dense[:10], "l2", 5)
        queries = [rows[i] for i in range(10)]
        params = SearchParams(ef_search=40)
        _, ids_beam = idx.search(queries, 5, params, method="device")
        assert recall_at_k(ids_beam, gt, 5) >= 0.95
        # searchsorted fallback must agree (dense-q disabled via cap)
        from pgvector_rx_tpu.graph import device as device_mod

        old = device_mod._SPARSE_DENSE_Q_MAX_DIM
        device_mod._SPARSE_DENSE_Q_MAX_DIM = 0
        try:
            _, ids_ss = idx.search(queries, 5, params, method="device")
        finally:
            device_mod._SPARSE_DENSE_Q_MAX_DIM = old
        assert np.array_equal(ids_beam, ids_ss)

    def test_sparse_highdim_insert_delete_vacuum_stress(self):
        """038_hnsw_sparsevec_vacuum_insert analog: 100k-dim sparsevec
        through insert/delete/vacuum cycles stays consistent."""
        rng = np.random.default_rng(47)
        DIM, NNZ, N = 100_000, 24, 240
        idx = HnswIndex(DIM, metric="l2", kind="sparse",
                        params=IndexParams(m=8, ef_construction=16))

        def row(r):
            cols = np.sort(r.choice(DIM, size=NNZ, replace=False)).astype(np.int32)
            return cols, r.random(NNZ).astype(np.float32) + 0.1

        tid = 0
        live = {}
        for cycle in range(3):
            for _ in range(N // 3):
                c, v = row(rng)
                idx.insert((c, v), tid)
                live[tid] = (c, v)
                tid += 1
            dead = sorted(live)[: len(live) // 2]
            idx.delete(dead)
            for t in dead:
                del live[t]
            idx.vacuum()
            # 038 is an integrity stress, not a recall test: random
            # disjoint-support sparse rows concentrate distances and
            # fragment ANY HNSW graph (the reference's heuristic
            # back-edge pruning drops sole in-edges the same way).
            # Graph scan: returns live tids only. Exact sweep: must
            # find every survivor (validates store/TID mapping through
            # the delete/vacuum cycles).
            probe = sorted(live)[:8]
            qs = [live[t] for t in probe]
            _, ids = idx.search(qs, 1, SearchParams(ef_search=64),
                                method="host")
            got = [int(np.asarray(i).ravel()[0]) for i in ids]
            assert all(g in live for g in got), (cycle, got)
            _, ids_x = idx.search(qs, 1, SearchParams(ef_search=64),
                                  method="exact")
            got_x = [int(np.asarray(i).ravel()[0]) for i in ids_x]
            assert got_x == probe, (cycle, got_x, probe)
        assert idx.count == len(live)

    def test_sparse_nnz_cap(self):
        from pgvector_rx_tpu import constants as C

        idx = HnswIndex(5000, metric="l2", kind="sparse")
        too_many = (
            np.arange(C.HNSW_MAX_NNZ + 1, dtype=np.int32),
            np.ones(C.HNSW_MAX_NNZ + 1, dtype=np.float32),
        )
        with pytest.raises(ValueError, match="more than 1000 non-zero"):
            idx.insert(too_many, 0)

    def test_halfvec_index(self):
        rng = np.random.default_rng(47)
        data = rng.random((300, 8)).astype(np.float32)
        idx = HnswIndex.build(data, metric="l2", dtype=np.float16, method="host")
        assert idx.store.rows.dtype == np.float16
        _, ids = idx.search(data[5], 3, method="host")
        assert ids[0] == 5


class TestExactEngine:
    def test_exact_engine_matches_ground_truth(self):
        import numpy as np

        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(3)
        data = rng.standard_normal((300, 16)).astype(np.float32)
        index = HnswIndex.build(data, metric="l2", method="host", seed=0)
        q = data[:40] + 0.01 * rng.standard_normal((40, 16)).astype(np.float32)
        d_ex, i_ex = index.search(q, 5, SearchParams(), method="exact")
        # brute force ground truth
        full = np.linalg.norm(data[None, :, :] - q[:, None, :], axis=-1)
        gt = np.argsort(full, axis=1)[:, :5]
        assert (i_ex == gt).mean() > 0.99
        np.testing.assert_allclose(
            d_ex, np.take_along_axis(full, gt, axis=1), rtol=1e-4, atol=1e-4
        )

    def test_exact_engine_respects_deletes(self):
        import numpy as np

        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(4)
        data = rng.standard_normal((100, 8)).astype(np.float32)
        index = HnswIndex.build(data, metric="l2", method="host", seed=0)
        d0, i0 = index.search(data[7], 1, method="exact")
        assert i0[0] == 7
        index.delete([7])
        index.vacuum()
        d1, i1 = index.search(np.atleast_2d(data[7]), 3, method="exact")
        assert 7 not in set(i1[0].tolist())

    def test_exact_engine_bit_and_sparse(self):
        import numpy as np

        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(5)
        # bit
        bits = rng.integers(0, 2, size=(200, 64)).astype(np.uint8)
        idx = HnswIndex.build(bits, metric="hamming", method="host", seed=0)
        d, ids = idx.search(bits[:20], 3, SearchParams(), method="exact")
        assert (ids[:, 0] == np.arange(20)).all()
        assert (d[:, 0] == 0).all()
        # sparse
        data = []
        for _ in range(150):
            nz = rng.integers(1, 6)
            ii = np.sort(rng.choice(50, size=nz, replace=False)).astype(np.int32)
            vv = rng.standard_normal(nz).astype(np.float32)
            data.append((ii, vv))
        sidx = HnswIndex.build(data, metric="l2", method="host", seed=0)
        d2, ids2 = sidx.search(data[7], 1, SearchParams(), method="exact")
        assert ids2[0] == 7

    @pytest.mark.parametrize("metric", ["hamming", "jaccard"])
    def test_exact_engine_bit_mxu_path(self, metric):
        """B >= 32 statically selects the MXU (unpack + matmul)
        formulation of the bit sweep; its distances must match the
        scalar reference exactly (0/1 products accumulate in f32)."""
        import numpy as np

        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex
        from pgvector_rx_tpu.types import bitvec

        rng = np.random.default_rng(41)
        nbits = 72  # not a multiple of 32: exercises word zero-padding
        bits = rng.integers(0, 2, size=(300, nbits)).astype(np.uint8)
        idx = HnswIndex.build(bits, metric=metric, method="host", seed=0)
        q = bits[:48]  # B=48 >= 32 -> MXU path
        d, ids = idx.search(q, 5, SearchParams(), method="exact")
        scalar = (
            bitvec.hamming_distance
            if metric == "hamming"
            else bitvec.jaccard_distance
        )
        ref = np.array([[scalar(qq, bits[j]) for j in range(len(bits))]
                        for qq in q])
        order_d = np.sort(ref, axis=1)[:, :5]
        np.testing.assert_allclose(d, order_d, rtol=1e-6, atol=1e-6)
        assert (ids[:, 0] == np.arange(48)).all()


class TestDeviceScan:
    def test_streaming_exact_scan_order_and_resume(self):
        import numpy as np

        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(9)
        data = rng.standard_normal((500, 12)).astype(np.float32)
        index = HnswIndex.build(data, metric="l2", method="host", seed=0)
        q = data[3]

        scan = index.scan(q, SearchParams(ef_search=8), method="device")
        got = scan.take(120)
        assert len(got) == 120
        tids = [t for t, _ in got]
        dists = [d for _, d in got]
        # exactly ordered, no duplicates, self first
        assert tids[0] == 3
        assert dists == sorted(dists)
        assert len(set(tids)) == len(tids)
        # matches brute force prefix
        full = np.linalg.norm(data - q[None, :], axis=1)
        gt = np.argsort(full)[:120]
        assert set(tids) == set(int(i) for i in gt)

    def test_device_scan_max_scan_tuples(self):
        import numpy as np

        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(10)
        data = rng.standard_normal((200, 6)).astype(np.float32)
        index = HnswIndex.build(data, metric="l2", method="host", seed=0)
        scan = index.scan(
            data[0], SearchParams(ef_search=4, max_scan_tuples=17), method="device"
        )
        assert len(scan.take(1000)) == 17

    def test_device_scan_exhausts(self):
        import numpy as np

        from pgvector_rx_tpu.config import SearchParams
        from pgvector_rx_tpu.index.hnsw import HnswIndex

        rng = np.random.default_rng(11)
        data = rng.standard_normal((60, 6)).astype(np.float32)
        index = HnswIndex.build(data, metric="l2", method="host", seed=0)
        scan = index.scan(data[0], SearchParams(ef_search=4), method="device")
        out = scan.take(10_000)
        assert len(out) == 60
        assert scan.next() is None


class TestHalfvecServingConsistency:
    def test_device_build_scores_stored_f16(self, tmp_path):
        """The serving graph must see f16-rounded values (what the store
        holds), so save/load round-trips are search-identical and
        distances match the reference's f16-stored semantics."""
        rng = np.random.default_rng(55)
        data = (rng.standard_normal((600, 16)) * 0.123).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="l2", method="device", dtype=np.float16, seed=9,
            host_graph=False,
        )
        q = data[:16]
        d1, t1 = idx.search(q, 5, SearchParams(ef_search=40), method="exact")
        idx.save(tmp_path / "hv")
        idx2 = HnswIndex.load(tmp_path / "hv")
        d2, t2 = idx2.search(q, 5, SearchParams(ef_search=40), method="exact")
        assert np.array_equal(np.asarray(t1), np.asarray(t2))
        # fresh serving arrays are capacity-padded, loaded ones sliced:
        # different matmul reduction orders give ~1e-4 cancellation
        # noise on near-zero distances; f16-rounding differences would
        # be ~1e-3 relative on full-size distances
        assert np.allclose(np.asarray(d1), np.asarray(d2), atol=5e-4)
        # distances reflect f16 rounding of the stored rows
        row0 = data[int(t1[0, 1])].astype(np.float16).astype(np.float64)
        expect = float(np.linalg.norm(
            row0 - data[0].astype(np.float64)))
        # query stays f32; stored row is f16-rounded
        assert d1[0, 1] == pytest.approx(expect, rel=1e-3)

    def test_serving_only_count_and_rows(self):
        """Serving-only builds keep no host GraphElements, but count /
        num_tuples / store.rows must still reflect the live corpus —
        configs/halfvec_10m.py's 1M run sliced `store.rows[:count]`
        and got an EMPTY matrix (count read the empty elements list),
        failing its recall gate at 0.0 (2026-08-21)."""
        rng = np.random.default_rng(56)
        data = rng.standard_normal((512, 16)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="ip", method="device", dtype=np.float16,
            seed=9, host_graph=False,
        )
        assert idx.count == 512
        assert idx.num_tuples == 512
        rows = np.asarray(idx.store.rows[: idx.count], dtype=np.float32)
        assert np.array_equal(
            rows, data.astype(np.float16).astype(np.float32)
        )


class TestInsertRecallOtherKinds:
    """021/025/029 analogs: aminsert path for bit, halfvec, sparse."""

    def test_bit_insert_recall(self):
        rng = np.random.default_rng(21)
        bits = rng.integers(0, 2, size=(300, 64)).astype(np.uint8)
        idx = HnswIndex(64, metric="hamming", kind="bit", seed=6)
        for i, row in enumerate(bits):
            idx.insert(row, i)
        gt = brute_force(bits, bits[:15], "hamming", 5)
        _, ids = idx.search(bits[:15], 5, SearchParams(ef_search=40),
                            method="host")
        assert recall_at_k(ids, gt, 5) >= 0.95

    def test_halfvec_insert_recall(self):
        rng = np.random.default_rng(25)
        data = rng.standard_normal((300, 12)).astype(np.float32)
        idx = HnswIndex(12, metric="l2", dtype=np.float16, seed=7)
        for i, row in enumerate(data):
            idx.insert(row, i)
        gt = brute_force(data.astype(np.float16).astype(np.float64),
                         data[:15], "l2", 5)
        _, ids = idx.search(data[:15], 5, SearchParams(ef_search=40),
                            method="host")
        assert recall_at_k(ids, gt, 5) >= 0.95

    def test_sparse_insert_recall(self):
        rng = np.random.default_rng(29)
        rows = []
        for _ in range(300):
            nnz = rng.integers(3, 10)
            ii = np.sort(rng.choice(40, size=nnz, replace=False)).astype(
                np.int32
            )
            rows.append(SparseVec(40, ii, rng.standard_normal(nnz).astype(
                np.float32)))
        idx = HnswIndex(40, metric="l2", kind="sparse", seed=8)
        for i, r in enumerate(rows):
            idx.insert(r, i)
        # dense mirror for ground truth
        dense = np.zeros((300, 40), dtype=np.float64)
        for i, r in enumerate(rows):
            dense[i, r.indices] = r.values
        gt = brute_force(dense, dense[:15], "l2", 5)
        _, ids = idx.search(rows[:15], 5, SearchParams(ef_search=40),
                            method="host")
        assert recall_at_k(ids, gt, 5) >= 0.95


class TestPerTypeVacuumRecall:
    """022/026/030 analogs: m=4/efc=8, delete 75%, vacuum, recall >= 0.95
    (tests/t/014:89-95 thresholds applied per value kind)."""

    PARAMS = IndexParams(m=4, ef_construction=8)

    def _run(self, idx, all_data, queries, metric, n):
        keep = np.arange(n) % 4 == 0
        idx.delete(np.nonzero(~keep)[0])
        idx.vacuum()
        kept_ids = np.nonzero(keep)[0]
        gt = kept_ids[brute_force(all_data[keep], queries, metric, 10)]
        _, ids = idx.search(
            queries, 10, SearchParams(ef_search=40), method="host"
        )
        assert recall_at_k(ids, gt, 10) >= 0.95

    def test_bit_vacuum_recall(self):
        rng = np.random.default_rng(22)
        bits = rng.integers(0, 2, size=(400, 52)).astype(np.uint8)
        idx = HnswIndex.build(
            bits, metric="hamming", params=self.PARAMS, method="host", seed=22
        )
        self._run(idx, bits, bits[rng.integers(0, 400, 15)], "hamming", 400)

    def test_halfvec_vacuum_recall(self):
        rng = np.random.default_rng(26)
        data = rng.random((400, 6)).astype(np.float32)
        idx = HnswIndex.build(
            data, metric="l2", dtype=np.float16, params=self.PARAMS,
            method="host", seed=26,
        )
        stored = idx.store.rows[:400].astype(np.float32)  # f16-rounded
        self._run(idx, stored, rng.random((15, 6)).astype(np.float32),
                  "l2", 400)

    def test_sparse_vacuum_recall(self):
        rng = np.random.default_rng(30)
        dense = rng.random((400, 30)).astype(np.float32)
        dense[rng.random((400, 30)) < 0.7] = 0.0
        dense[:, 0] += 0.01
        rows = [SparseVec.from_dense(r) for r in dense]
        idx = HnswIndex.build(
            rows, metric="l2", params=self.PARAMS, method="host", seed=30
        )
        keep = np.arange(400) % 4 == 0
        idx.delete(np.nonzero(~keep)[0])
        idx.vacuum()
        kept_ids = np.nonzero(keep)[0]
        queries = [rows[i] for i in range(0, 400, 27)]
        qdense = dense[list(range(0, 400, 27))]
        gt = kept_ids[brute_force(dense[keep], qdense, "l2", 10)]
        _, ids = idx.search(queries, 10, SearchParams(ef_search=40),
                            method="host")
        assert recall_at_k(ids, gt, 10) >= 0.95


class TestPerTypeDuplicates:
    """023/027/031 analogs: 20 identical values fold into one element
    capped at 10 heap TIDs; ef_search=1 exposes exactly 10 rows."""

    def _check(self, idx, query):
        counts = sorted((len(t) for t in idx.heap_tids if t), reverse=True)
        assert counts[0] == 10
        _, ids = idx.search(query, 20, SearchParams(ef_search=1),
                            method="host")
        assert (np.asarray(ids) >= 0).sum() == 10

    def test_bit_duplicates(self):
        row = np.array([1, 0, 1, 1, 0, 0, 1, 0], dtype=np.uint8)
        data = np.tile(row, (20, 1))
        idx = HnswIndex.build(data, metric="hamming", method="host")
        self._check(idx, row)

    def test_halfvec_duplicates(self):
        row = np.array([1.5, 2.25, 3.0], dtype=np.float32)
        data = np.tile(row, (20, 1))
        idx = HnswIndex.build(data, metric="l2", dtype=np.float16,
                              method="host")
        self._check(idx, row)

    def test_sparse_duplicates(self):
        rows = [SparseVec(10, [1, 4], [1.0, 2.0]) for _ in range(20)]
        idx = HnswIndex.build(rows, metric="l2", method="host")
        self._check(idx, rows[0])
