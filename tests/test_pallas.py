"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pgvector_rx_tpu.ops.pallas_bruteforce import l2_topk

INTERPRET = jax.devices()[0].platform != "tpu"


class TestPallasBruteForce:
    def test_exact_topk(self, rng):
        base = rng.standard_normal((300, 16)).astype(np.float32)
        q = rng.standard_normal((10, 16)).astype(np.float32)
        d, i = l2_topk(jnp.asarray(base), jnp.asarray(q), 5, tb=8, tn=128,
                       interpret=INTERPRET)
        true = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        gt_i = np.argsort(true, axis=1)[:, :5]
        gt_d = np.sort(true, axis=1)[:, :5]
        assert all(set(np.asarray(i)[b]) == set(gt_i[b]) for b in range(10))
        np.testing.assert_allclose(np.asarray(d), gt_d, atol=1e-4)

    def test_unaligned_sizes_padded(self, rng):
        base = rng.standard_normal((257, 8)).astype(np.float32)
        q = rng.standard_normal((3, 8)).astype(np.float32)
        d, i = l2_topk(jnp.asarray(base), jnp.asarray(q), 4, tb=8, tn=128,
                       interpret=INTERPRET)
        true = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        gt_i = np.argsort(true, axis=1)[:, :4]
        assert all(set(np.asarray(i)[b]) == set(gt_i[b]) for b in range(3))
        # no padded ids leak
        assert np.asarray(i).max() < 257


class TestBinnedSweep:
    """Fused binned-min approx sweep (the TPU approx serving engine)."""

    @staticmethod
    def _bf16_gt(base, q, metric):
        """Ground truth on bf16-rounded operands (kernel scoring regime)."""
        b = jnp.asarray(base, jnp.bfloat16).astype(np.float32)
        qq = jnp.asarray(q, jnp.bfloat16).astype(np.float32)
        b, qq = np.asarray(b), np.asarray(qq)
        dots = qq @ b.T
        if metric == "l2":
            # kernel restores q2 in full f32
            q2 = (q.astype(np.float32) ** 2).sum(1, keepdims=True)
            x2 = (base.astype(np.float32) ** 2).sum(1)
            return q2 + x2[None, :] - 2.0 * dots
        if metric == "ip":
            return -dots
        return 1.0 - np.clip(dots, -1.0, 1.0)

    @pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
    def test_single_tile_exact(self, rng, metric):
        from pgvector_rx_tpu.ops.pallas_bruteforce import binned_sweep_topk

        base = rng.standard_normal((200, 24)).astype(np.float32)
        q = rng.standard_normal((5, 24)).astype(np.float32)
        if metric == "cosine":
            base /= np.linalg.norm(base, axis=1, keepdims=True)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
        a = (base.astype(np.float32) ** 2).sum(1) if metric == "l2" else (
            np.zeros(200, np.float32)
        )
        d, i = binned_sweep_topk(
            jnp.asarray(base), jnp.asarray(a), jnp.asarray(q), 5, metric,
            tb=16, tn=256, interpret=INTERPRET,
        )
        d, i = np.asarray(d), np.asarray(i)
        # N <= tn: every column is its own bin -> selection is exact
        true = self._bf16_gt(base, q, metric)
        gt_i = np.argsort(true, axis=1, kind="stable")[:, :5]
        for b in range(5):
            assert set(i[b]) == set(gt_i[b]), (metric, b)
        np.testing.assert_allclose(
            d, np.take_along_axis(true, i, axis=1), rtol=2e-2, atol=2e-2
        )
        assert (np.diff(d, axis=1) >= -1e-6).all()

    def test_mask_excludes_rows(self, rng):
        from pgvector_rx_tpu.ops.pallas_bruteforce import (
            _NEG_BIG,
            binned_sweep_topk,
        )

        base = rng.standard_normal((200, 16)).astype(np.float32)
        q = rng.standard_normal((4, 16)).astype(np.float32)
        live = rng.random(200) < 0.5
        a = (base ** 2).sum(1).astype(np.float32) + np.where(
            live, 0.0, _NEG_BIG
        ).astype(np.float32)
        d, i = binned_sweep_topk(
            jnp.asarray(base), jnp.asarray(a), jnp.asarray(q), 5, "l2",
            tb=16, tn=256, interpret=INTERPRET,
        )
        i = np.asarray(i)
        assert (i >= 0).all()
        assert live[i].all(), "masked rows must never be returned"

    def test_multi_tile_binned_recall(self, rng):
        from pgvector_rx_tpu.ops.pallas_bruteforce import binned_sweep_topk

        base = rng.standard_normal((1000, 16)).astype(np.float32)
        q = rng.standard_normal((8, 16)).astype(np.float32)
        a = (base ** 2).sum(1).astype(np.float32)
        d, i = binned_sweep_topk(
            jnp.asarray(base), jnp.asarray(a), jnp.asarray(q), 5, "l2",
            tb=16, tn=256, interpret=INTERPRET,
        )
        d, i = np.asarray(d), np.asarray(i)
        true = self._bf16_gt(base, q, "l2")
        gt_i = np.argsort(true, axis=1, kind="stable")[:, :5]
        # binned selection loses only collisions; distances must still be
        # the true distances of the returned ids, sorted ascending
        np.testing.assert_allclose(
            d, np.take_along_axis(true, i, axis=1), rtol=2e-2, atol=2e-2
        )
        assert (np.diff(d, axis=1) >= -1e-6).all()
        rec = np.mean(
            [len(set(i[b]) & set(gt_i[b])) / 5 for b in range(8)]
        )
        assert rec >= 0.75, rec

    def test_k_exceeding_live_rows_pads_invalid(self, rng):
        from pgvector_rx_tpu.ops.pallas_bruteforce import (
            _NEG_BIG,
            binned_sweep_topk,
        )

        base = rng.standard_normal((50, 8)).astype(np.float32)
        a = (base ** 2).sum(1).astype(np.float32)
        a[3:] = _NEG_BIG  # only 3 live rows
        q = rng.standard_normal((2, 8)).astype(np.float32)
        d, i = binned_sweep_topk(
            jnp.asarray(base), jnp.asarray(a), jnp.asarray(q), 5, "l2",
            tb=16, tn=256, interpret=INTERPRET,
        )
        d, i = np.asarray(d), np.asarray(i)
        assert ((i[:, 3:] == -1) & np.isinf(d[:, 3:])).all()
        assert (i[:, :3] >= 0).all() and (i[:, :3] < 3).all()

    @pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
    def test_tilemin_ids_and_distances(self, rng, metric):
        """Packed tile-min sweep: one winner per corpus tile, ids packed
        into the mantissa's low bits — returned ids must be real rows
        and their distances the true (bf16-scored) values."""
        from pgvector_rx_tpu.ops.pallas_bruteforce import tilemin_sweep_topk

        base = rng.standard_normal((2000, 24)).astype(np.float32)
        q = rng.standard_normal((6, 24)).astype(np.float32)
        if metric == "cosine":
            base /= np.linalg.norm(base, axis=1, keepdims=True)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
        a = (base.astype(np.float32) ** 2).sum(1) if metric == "l2" else (
            np.zeros(2000, np.float32)
        )
        d, i = tilemin_sweep_topk(
            jnp.asarray(base), jnp.asarray(a), jnp.asarray(q), 5, metric,
            tb=16, tn=128, interpret=INTERPRET,
        )
        d, i = np.asarray(d), np.asarray(i)
        assert ((i >= 0) & (i < 2000)).all()
        true = self._bf16_gt(base, q, metric)
        # packing noise ~ shift * 2^-13 on top of bf16 scoring noise
        np.testing.assert_allclose(
            d, np.take_along_axis(true, i, axis=1), rtol=3e-2, atol=5e-2
        )
        assert (np.diff(d, axis=1) >= -1e-5).all()
        gt_i = np.argsort(true, axis=1, kind="stable")[:, :5]
        rec = np.mean([len(set(i[b]) & set(gt_i[b])) / 5 for b in range(6)])
        assert rec >= 0.5, rec  # tile collisions at 16 tiles x k=5

    def test_tilemin_mask_and_short_nc(self, rng):
        from pgvector_rx_tpu.ops.pallas_bruteforce import (
            _NEG_BIG,
            tilemin_sweep_topk,
        )

        base = rng.standard_normal((512, 16)).astype(np.float32)
        q = rng.standard_normal((3, 16)).astype(np.float32)
        live = rng.random(512) < 0.5
        a = (base ** 2).sum(1).astype(np.float32) + np.where(
            live, 0.0, _NEG_BIG
        ).astype(np.float32)
        d, i = tilemin_sweep_topk(
            jnp.asarray(base), jnp.asarray(a), jnp.asarray(q), 8, "l2",
            tb=16, tn=128, interpret=INTERPRET,
        )
        d, i = np.asarray(d), np.asarray(i)
        valid = i >= 0
        assert valid[:, :2].all()  # 4 tiles, plenty of live rows
        assert live[i[valid]].all(), "masked rows must never be returned"
        # k=8 > nc=4 tiles: tail pads invalid
        assert ((i[:, 4:] == -1) & np.isinf(d[:, 4:])).all()

    def test_hamming_is_l2_on_bits(self, rng):
        """The bit approx fast path maps hamming onto the l2 surrogate:
        hamming(q, x) == ||q - x||^2 for 0/1 vectors, with a = row
        popcount and q2 = query popcount (device.py _exact_search_bits)."""
        from pgvector_rx_tpu.ops.pallas_bruteforce import binned_sweep_topk

        bits = (rng.random((120, 64)) < 0.5).astype(np.float32)
        qb = (rng.random((4, 64)) < 0.5).astype(np.float32)
        a = bits.sum(1).astype(np.float32)  # popcount == sum of squares
        d, i = binned_sweep_topk(
            jnp.asarray(bits), jnp.asarray(a), jnp.asarray(qb), 5, "l2",
            tb=16, tn=128, interpret=INTERPRET,
        )
        d, i = np.asarray(d), np.asarray(i)
        ham = (qb[:, None, :] != bits[None, :, :]).sum(-1).astype(np.float32)
        gt = np.sort(ham, axis=1)[:, :5]
        np.testing.assert_allclose(d, gt, atol=1e-3)
