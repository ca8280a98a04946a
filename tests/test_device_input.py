"""Device-resident build input (jax.Array corpus).

The TPU-native ingestion story: vectors produced on-device (e.g. by an
embedding model on the same chip) go straight into the batched build
with zero host<->device transfer. These tests pin the contract:
identical graphs vs the host-input path, reference prepare semantics
(cosine zero-norm skip, NaN rejection — build.rs:426-438), and a store
that only downloads when a host path actually needs the values.
"""

import numpy as np
import pytest

from pgvector_rx_tpu.config import SearchParams
from pgvector_rx_tpu.index.hnsw import HnswIndex


def _jnp(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


class TestDeviceInputBuild:
    def test_identical_graph_vs_host_input(self):
        rng = np.random.default_rng(91)
        data = rng.standard_normal((3000, 16)).astype(np.float32)

        ref = HnswIndex.build(data, metric="l2", method="device", seed=5)
        got = HnswIndex.build(_jnp(data), metric="l2", seed=5)

        assert got.entry == ref.entry
        for a, b in zip(got.elements, ref.elements):
            assert a.level == b.level
            assert [n for _, n in a.neighbors[0]] == [
                n for _, n in b.neighbors[0]
            ]

    def test_serving_only_no_download(self):
        rng = np.random.default_rng(92)
        data = rng.standard_normal((2500, 12)).astype(np.float32)
        idx = HnswIndex.build(_jnp(data), metric="l2", seed=1,
                              host_graph=False)
        # the store must still be holding the device array, undownloaded
        assert idx.store._device_rows is not None
        d, t = idx.search(data[7], 5, SearchParams(ef_search=40))
        assert t[0] == 7
        # host access (e.g. save) materializes lazily and correctly
        np.testing.assert_allclose(idx.store.rows[:10], data[:10])
        assert idx.store._device_rows is None

    def test_serving_only_save_load(self, tmp_path):
        rng = np.random.default_rng(93)
        data = rng.standard_normal((2200, 12)).astype(np.float32)
        idx = HnswIndex.build(_jnp(data), metric="l2", seed=1,
                              host_graph=False)
        q = data[31]
        d_ref, t_ref = idx.search(q, 10)
        idx.save(str(tmp_path / "ck"))
        idx2 = HnswIndex.load(str(tmp_path / "ck"))
        d2, t2 = idx2.search(q, 10)
        assert list(t2) == list(t_ref)
        np.testing.assert_allclose(d2, d_ref, rtol=1e-6)

    def test_cosine_zero_norm_rows_skipped(self):
        rng = np.random.default_rng(94)
        data = rng.standard_normal((800, 8)).astype(np.float32)
        data[13] = 0.0
        data[77] = 0.0
        idx = HnswIndex.build(_jnp(data), metric="cosine", seed=2)
        assert len(idx.elements) == 798
        tids = {t for tl in idx.heap_tids for t in tl}
        assert 13 not in tids and 77 not in tids

    def test_nan_rejected(self):
        data = np.ones((50, 8), np.float32)
        data[3, 2] = np.nan
        with pytest.raises(ValueError, match="NaN or infinity"):
            HnswIndex.build(_jnp(data), metric="l2")

    def test_halfvec_store_rounding(self):
        rng = np.random.default_rng(95)
        data = rng.standard_normal((600, 8)).astype(np.float32)
        idx = HnswIndex.build(
            _jnp(data), metric="l2", seed=3, dtype=np.float16,
            host_graph=False,
        )
        got = idx.store.rows[:5]
        assert got.dtype == np.float16
        np.testing.assert_array_equal(got, data[:5].astype(np.float16))

    def test_non_device_methods_rejected(self):
        data = np.ones((50, 8), np.float32)
        with pytest.raises(ValueError, match="method='device'"):
            HnswIndex.build(_jnp(data), metric="l2", method="host")

    def test_bit_metric_rejected(self):
        bits = np.random.default_rng(0).integers(0, 2, (64, 32))
        with pytest.raises(ValueError, match="dense"):
            HnswIndex.build(_jnp(bits), metric="hamming")

    def test_insert_bulk_device_input(self):
        rng = np.random.default_rng(97)
        data = rng.standard_normal((2000, 12)).astype(np.float32)
        extra = rng.standard_normal((500, 12)).astype(np.float32)

        ref = HnswIndex.build(data, metric="l2", method="device", seed=6)
        ref.insert_bulk(extra)
        got = HnswIndex.build(_jnp(data), metric="l2", seed=6)
        got.insert_bulk(_jnp(extra))

        assert got.entry == ref.entry
        assert len(got.elements) == len(ref.elements)
        for a, b in zip(got.elements, ref.elements):
            assert [n for _, n in a.neighbors[0]] == [
                n for _, n in b.neighbors[0]
            ]

    def test_insert_bulk_device_serving_only_stays_device_backed(self):
        rng = np.random.default_rng(98)
        data = rng.standard_normal((2000, 12)).astype(np.float32)
        extra = rng.standard_normal((300, 12)).astype(np.float32)
        idx = HnswIndex.build(_jnp(data), metric="l2", seed=7,
                              host_graph=False)
        added = idx.insert_bulk(_jnp(extra))
        assert added == 300
        # still no host materialization after a device-input insert
        assert idx.store._device_rows is not None
        assert idx.store.count == 2300
        d, t = idx.search(extra[5], 3, SearchParams(ef_search=64))
        assert t[0] == 2005
        np.testing.assert_allclose(idx.store.rows[2005], extra[5],
                                   rtol=1e-6)

    def test_search_recall(self):
        rng = np.random.default_rng(96)
        data = rng.standard_normal((4000, 16)).astype(np.float32)
        idx = HnswIndex.build(_jnp(data), metric="l2", seed=4,
                              host_graph=False)
        q = data[:50] + 0.01 * rng.standard_normal((50, 16)).astype(
            np.float32
        )
        gt = np.argsort(((data[None] - q[:, None]) ** 2).sum(-1), axis=1)[
            :, :10
        ]
        _, ids = idx.search(q, 10, SearchParams(ef_search=64))
        recall = np.mean(
            [len(set(ids[i]) & set(gt[i])) / 10 for i in range(50)]
        )
        assert recall >= 0.95

    def test_consume_input_frees_and_serves(self):
        """consume_input=True: the build takes ownership of the corpus
        buffer (halving build HBM — the 10M/16GB enabler), frees it,
        and the index still serves and saves correctly."""
        import pytest

        rng = np.random.default_rng(31)
        data = rng.standard_normal((2000, 12)).astype(np.float32)
        dev = _jnp(data)
        idx = HnswIndex.build(dev, metric="l2", seed=9, host_graph=False,
                              consume_input=True)
        with pytest.raises(RuntimeError):
            np.asarray(dev)  # caller's buffer is gone
        q = data[:16] + 0.01 * rng.standard_normal((16, 12)).astype(
            np.float32
        )
        gt = np.argsort(((data[None] - q[:, None]) ** 2).sum(-1), axis=1)[
            :, :5
        ]
        _, ids = idx.search(q, 5, SearchParams(ef_search=64))
        recall = np.mean(
            [len(set(ids[i]) & set(gt[i])) / 5 for i in range(16)]
        )
        assert recall >= 0.95
        # store is backed by the padded build buffer, sliced to n
        assert idx.store.rows.shape == (2000, 12)
        np.testing.assert_allclose(idx.store.rows[7], data[7], rtol=1e-6)

    def test_consume_input_requires_serving_only_device(self):
        import pytest

        rng = np.random.default_rng(32)
        data = rng.standard_normal((100, 8)).astype(np.float32)
        with pytest.raises(ValueError):
            HnswIndex.build(_jnp(data), metric="l2", host_graph=True,
                            consume_input=True)
        with pytest.raises(ValueError):
            HnswIndex.build(data, metric="l2", method="device",
                            host_graph=False, consume_input=True)
