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
