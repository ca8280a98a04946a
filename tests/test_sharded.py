"""Multi-chip sharded index tests (8 virtual CPU devices via conftest)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh as Mesh2

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.parallel import ShardedHnswIndex

from test_index import brute_force, recall_at_k


@pytest.fixture(scope="module")
def sharded_setup():
    rng = np.random.default_rng(70)
    data = rng.standard_normal((1200, 12)).astype(np.float32)
    idx = ShardedHnswIndex.build(data, n_shards=8, metric="l2", method="host", seed=71)
    return idx, data


class TestSharded:
    def test_devices_available(self):
        assert len(jax.devices()) >= 8

    def test_recall(self, sharded_setup):
        idx, data = sharded_setup
        rng = np.random.default_rng(72)
        q = rng.standard_normal((8, 12)).astype(np.float32)
        gt = brute_force(data, q, "l2", 10)
        d, tids = idx.search(q, 10, SearchParams(ef_search=40))
        assert recall_at_k(tids, gt, 10) >= 0.99

    def test_matches_single_index_distances(self, sharded_setup):
        idx, data = sharded_setup
        q = data[17]
        d, tids = idx.search(q, 5)
        assert tids[0] == 17
        assert d[0] == pytest.approx(0.0, abs=1e-5)
        # distances are true euclidean
        for dist, t in zip(d, tids):
            true = np.sqrt(((data[t] - q) ** 2).sum())
            assert dist == pytest.approx(true, rel=1e-4)

    def test_results_sorted(self, sharded_setup):
        idx, data = sharded_setup
        d, _ = idx.search(data[3] + 0.01, 10)
        assert list(d) == sorted(d)

    def test_insert_and_delete(self, sharded_setup):
        rng = np.random.default_rng(73)
        data = rng.random((160, 6)).astype(np.float32)
        idx = ShardedHnswIndex.build(
            data, n_shards=4, metric="l2", method="host", seed=74
        )
        new = rng.random(6).astype(np.float32)
        idx.insert(new, 5000)
        d, tids = idx.search(new, 1)
        assert tids[0] == 5000
        idx.delete([5000])
        d, tids = idx.search(new, 1)
        assert tids[0] != 5000

    def test_insert_bulk_balances_and_recalls(self):
        rng = np.random.default_rng(77)
        data = rng.standard_normal((800, 10)).astype(np.float32)
        idx = ShardedHnswIndex.build(
            data, n_shards=4, metric="l2", method="host", seed=78
        )
        # skew shard 0 so water-filling has something to level
        skew = rng.standard_normal((60, 10)).astype(np.float32)
        idx.shards[0].insert_bulk(skew, tids=range(10_000, 10_060))
        extra = rng.standard_normal((300, 10)).astype(np.float32)
        added = idx.insert_bulk(extra, tids=range(800, 1100))
        assert added == 300
        assert idx.num_tuples == 1160
        sizes = [s.num_tuples for s in idx.shards]
        assert max(sizes) - min(sizes) <= 1  # water-filled level
        # inserted rows reachable through the sharded search
        all_data = np.concatenate([data, skew, extra])
        all_tids = np.concatenate(
            [np.arange(800), np.arange(10_000, 10_060), np.arange(800, 1100)]
        )
        q = extra[:16]
        gt = all_tids[
            np.argsort(((all_data[None] - q[:, None]) ** 2).sum(-1), axis=1)[:, :5]
        ]
        _, tids = idx.search(q, 5, SearchParams(ef_search=40))
        assert recall_at_k(tids, gt, 5) >= 0.9

    def test_insert_bulk_default_tids(self):
        rng = np.random.default_rng(79)
        data = rng.standard_normal((200, 6)).astype(np.float32)
        idx = ShardedHnswIndex.build(
            data, n_shards=2, metric="l2", method="host", seed=80
        )
        extra = rng.standard_normal((40, 6)).astype(np.float32)
        idx.insert_bulk(extra)  # tids default to num_tuples..num_tuples+n
        d, tids = idx.search(extra[:8], 1, SearchParams(ef_search=40))
        got = np.asarray(tids).ravel()
        assert (got == np.arange(200, 208)).mean() >= 0.9

    def test_cosine_sharded(self):
        rng = np.random.default_rng(75)
        data = rng.standard_normal((400, 8)).astype(np.float32)
        idx = ShardedHnswIndex.build(
            data, n_shards=4, metric="cosine", method="host", seed=76
        )
        q = rng.standard_normal((4, 8)).astype(np.float32)
        gt = brute_force(data, q, "cosine", 5)
        _, tids = idx.search(q, 5, SearchParams(ef_search=40))
        assert recall_at_k(tids, gt, 5) >= 0.9


def test_sharded_exact_engine():
    import numpy as np

    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.parallel import ShardedHnswIndex

    rng = np.random.default_rng(21)
    data = rng.standard_normal((600, 16)).astype(np.float32)
    idx = ShardedHnswIndex.build(data, n_shards=4, metric="l2", method="host")
    q = data[:32]
    d, tids = idx.search(q, 5, SearchParams(ef_search=16), engine="exact")
    assert (tids[:, 0] == np.arange(32)).all()
    np.testing.assert_allclose(d[:, 0], 0.0, atol=5e-3)


class TestShardedPersistence:
    def test_save_load_equivalence(self, sharded_setup, tmp_path):
        idx, data = sharded_setup
        q = data[7] + 0.02
        d0, t0 = idx.search(q, 10, SearchParams(ef_search=40))
        idx.save(tmp_path / "ck")
        idx2 = ShardedHnswIndex.load(tmp_path / "ck", mesh=idx.mesh)
        assert idx2.num_tuples == idx.num_tuples
        d1, t1 = idx2.search(q, 10, SearchParams(ef_search=40))
        assert list(t1) == list(t0)
        np.testing.assert_allclose(d1, d0, rtol=1e-5)

    def test_save_load_serving_only(self, tmp_path):
        rng = np.random.default_rng(95)
        data = rng.standard_normal((1000, 8)).astype(np.float32)
        idx = ShardedHnswIndex.build(
            data, n_shards=2, metric="l2", method="device",
            host_graph=False, seed=96,
        )
        q = data[:6]
        d0, t0 = idx.search(q, 5, SearchParams(ef_search=40))
        idx.save(tmp_path / "ck2")
        idx2 = ShardedHnswIndex.load(tmp_path / "ck2")
        d1, t1 = idx2.search(q, 5, SearchParams(ef_search=40))
        assert t1.tolist() == t0.tolist()


class TestShardedScan:
    """Iterative-scan analog for the sharded index (BASELINE's 100M
    relaxed_order config, exercised at test scale on the CPU mesh)."""

    def test_global_order_and_exactness(self, sharded_setup):
        idx, data = sharded_setup
        q = data[5]
        scan = idx.scan(q, SearchParams(ef_search=20,
                                        iterative_scan="relaxed_order"))
        items = scan.take(50)
        dists = [d for _, d in items]
        assert dists == sorted(dists)  # k-way merge keeps global order
        # stream head matches batch search
        d_ref, t_ref = idx.search(q, 10, SearchParams(ef_search=40))
        assert [t for t, _ in items[:5]] == list(t_ref[:5])

    def test_max_scan_tuples_caps_merged_stream(self, sharded_setup):
        idx, data = sharded_setup
        scan = idx.scan(
            data[9],
            SearchParams(ef_search=20, iterative_scan="relaxed_order",
                         max_scan_tuples=25),
        )
        assert len(scan.take(10_000)) == 25

    def test_exhausts_everything(self, sharded_setup):
        idx, data = sharded_setup
        scan = idx.scan(
            data[2],
            SearchParams(ef_search=30, iterative_scan="relaxed_order",
                         max_scan_tuples=10_000),
        )
        items = scan.take(10**6)
        assert len(items) == idx.num_tuples
        assert len({t for t, _ in items}) == idx.num_tuples  # exactly-once


class TestShardedScaleRealism:
    """The 100M-shape contract: no O(total-corpus) host allocation
    anywhere in build/stack/search (VERDICT r1 #1)."""

    def test_streamed_build_input(self):
        """data as a callable (shard, n_shards) -> rows: per-shard
        partitions are produced on demand — no process ever holds the
        full corpus."""
        rng = np.random.default_rng(30)
        full = rng.standard_normal((1600, 10)).astype(np.float32)

        calls = []

        def part(s, n_shards):
            calls.append(s)
            return full[s::n_shards]

        def part_ids(s, n_shards):
            return np.arange(s, 1600, n_shards)

        idx = ShardedHnswIndex.build(
            part, n_shards=4, metric="l2", ids=part_ids, method="host",
            seed=31,
        )
        assert calls == [0, 1, 2, 3]
        assert idx.num_tuples == 1600
        _, tids = idx.search(full[:8], 1, SearchParams(ef_search=40))
        assert (np.asarray(tids).ravel() == np.arange(8)).mean() >= 0.9

    def test_streamed_default_tids_sequential(self):
        rng = np.random.default_rng(32)
        blocks = [rng.standard_normal((50, 6)).astype(np.float32)
                  for _ in range(3)]
        idx = ShardedHnswIndex.build(
            lambda s, n: blocks[s], n_shards=3, metric="l2", method="host",
        )
        # sequential TID blocks: shard 0 -> 0..49, shard 1 -> 50..99, ...
        _, tids = idx.search(blocks[1][0], 1)
        assert tids[0] == 50

    def test_device_resident_build_input(self):
        """jax.Array corpus: per-shard strided slices move device-to-
        device; numpy never sees the corpus."""
        import jax.numpy as jnp

        rng = np.random.default_rng(33)
        host = rng.standard_normal((2000, 12)).astype(np.float32)
        dev_corpus = jnp.asarray(host)
        mesh = Mesh2(np.array(jax.devices()[:2]), ("shard",))
        idx = ShardedHnswIndex.build(
            dev_corpus, n_shards=2, metric="l2", mesh=mesh,
            method="device", host_graph=False, seed=34,
        )
        q = host[:8]
        gt = brute_force(host, q, "l2", 5)
        _, tids = idx.search(q, 5, SearchParams(ef_search=40))
        assert recall_at_k(tids, gt, 5) >= 0.95

    def test_stack_is_sharded_and_device_assembled(self):
        """_stack must produce mesh-sharded arrays with per-shard
        blocks on their own devices, and must not stage the stacked
        arrays through host numpy (tracemalloc-bounded)."""
        import jax.numpy as jnp
        import tracemalloc

        rng = np.random.default_rng(36)
        data = rng.standard_normal((32_000, 64)).astype(np.float32)
        idx = ShardedHnswIndex.build(
            jnp.asarray(data), n_shards=8, metric="l2", method="device",
            host_graph=False, seed=37,
        )
        idx._stack()  # warm the pad programs (compile allocations)
        idx._stacked = None
        tracemalloc.start()
        st = idx._stack()
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        # a host-staged stack would allocate >= the padded [S, cap, D]
        # values (~8 MB) + adjacency (~4 MB); the device-assembled path
        # only allocates Python-level overhead
        assert peak < 1 << 20, f"host staging detected: peak={peak}"
        S = len(idx.shards)
        assert st["values"].shape[0] == S
        from jax.sharding import NamedSharding

        assert isinstance(st["values"].sharding, NamedSharding)
        devs = list(idx.mesh.devices.flat)
        for shard in st["values"].addressable_shards:
            assert shard.data.shape[0] == 1
        assert {sh.device for sh in st["values"].addressable_shards} == set(
            devs
        )
        # and search over the device-assembled stack still works
        _, tids = idx.search(data[11], 5, SearchParams(ef_search=40))
        assert tids[0] == 11


class TestShardedServingOnly:
    def test_device_built_serving_shards(self):
        """100M-config shape: serving-only device-built shards (no host
        graph), SPMD search + sharded iterative scan still work."""
        from jax.sharding import Mesh

        rng = np.random.default_rng(90)
        data = rng.standard_normal((2000, 12)).astype(np.float32)
        mesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
        idx = ShardedHnswIndex.build(
            data, n_shards=2, metric="l2", mesh=mesh, method="device",
            host_graph=False, seed=91,
        )
        q = data[:8]
        gt = brute_force(data, q, "l2", 5)
        d, tids = idx.search(q, 5, SearchParams(ef_search=40))
        assert recall_at_k(tids, gt, 5) >= 0.95
        scan = idx.scan(
            data[3],
            SearchParams(ef_search=20, iterative_scan="relaxed_order",
                         max_scan_tuples=40),
        )
        items = scan.take(1000)
        assert len(items) == 40
        assert [dd for _, dd in items] == sorted(dd for _, dd in items)
        with pytest.raises(RuntimeError):
            idx.shards[0].delete([1])


class TestShardedCheckpointResume:
    """Per-shard build checkpointing (r5): each shard saves the moment
    it finishes; a rerun resumes from completed shards."""

    def test_build_checkpoints_and_resumes(self, tmp_path):
        rng = np.random.default_rng(95)
        data = rng.standard_normal((4000, 10)).astype(np.float32)
        idx = ShardedHnswIndex.build(
            data, n_shards=4, metric="l2", method="native",
            host_graph=False, seed=9, checkpoint_dir=tmp_path / "ck",
        )
        # all four shard checkpoints + the sharded manifest exist
        for s in range(4):
            assert (tmp_path / "ck" / f"shard_{s:05d}" / "meta.json").exists()
        assert (tmp_path / "ck" / "sharded.json").exists()
        q = rng.standard_normal((16, 10)).astype(np.float32)
        d1, t1 = idx.search(q, 5, SearchParams(ef_search=40))
        # resume: same call loads every shard instead of rebuilding
        idx2 = ShardedHnswIndex.build(
            data, n_shards=4, metric="l2", method="native",
            host_graph=False, seed=9, checkpoint_dir=tmp_path / "ck",
        )
        d2, t2 = idx2.search(q, 5, SearchParams(ef_search=40))
        assert np.array_equal(t1, t2)
        # partial resume: drop one shard's checkpoint, rebuild only it
        import shutil

        shutil.rmtree(tmp_path / "ck" / "shard_00002")
        idx3 = ShardedHnswIndex.build(
            data, n_shards=4, metric="l2", method="native",
            host_graph=False, seed=9, checkpoint_dir=tmp_path / "ck",
        )
        d3, t3 = idx3.search(q, 5, SearchParams(ef_search=40))
        assert np.array_equal(t1, t3)

    def test_streamed_resume_needs_callable_ids(self, tmp_path):
        rng = np.random.default_rng(96)
        data = rng.standard_normal((2000, 8)).astype(np.float32)

        def part(s, n_shards):
            return data[s::n_shards]

        ShardedHnswIndex.build(
            part, n_shards=2, metric="l2", method="native",
            host_graph=False, seed=9, checkpoint_dir=tmp_path / "ck",
        )
        with pytest.raises(ValueError, match="callable ids"):
            ShardedHnswIndex.build(
                part, n_shards=2, metric="l2", method="native",
                host_graph=False, seed=9, checkpoint_dir=tmp_path / "ck",
            )
