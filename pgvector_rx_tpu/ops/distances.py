"""Dense batched distance kernels.

Replaces the reference's scalar distance helpers (vector.rs:518-567,
halfvec.rs:687-733) with MXU-friendly batched forms. All functions are
jit-compatible with a static ``metric`` argument.

Metric names follow the HNSW opclass "order distance" (proc-1) semantics
(reference vector.rs:839-865):

- ``l2``      -> squared L2 (vector_l2_squared_distance)
- ``ip``      -> negative inner product (vector_negative_inner_product)
- ``cosine``  -> 1 - dot(a_hat, b_hat) on pre-normalized vectors, clamped
- ``l1``      -> L1

Ordering by these equals ordering by the user-facing operators
(<->, <#>, <=>, <+>); :func:`order_to_operator_distance` converts for
display. Hamming/Jaccard live in :mod:`.bits`, sparse kernels in
:mod:`.sparse`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DENSE_METRICS = ("l2", "ip", "cosine", "l1")


def _f32(x):
    return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("metric",))
def pairwise(metric: str, base: jax.Array, queries: jax.Array) -> jax.Array:
    """All-pairs order-distances: base [N, D], queries [B, D] -> [B, N].

    L2/IP/cosine ride the MXU via a single matmul; L1 falls back to a
    broadcast reduction (tiled by the caller for large N).
    """
    q = _f32(queries)
    x = _f32(base)
    if metric == "l2":
        # ||q||^2 - 2 q.x + ||x||^2, never negative
        qx = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        q2 = jnp.sum(q * q, axis=-1, keepdims=True)
        x2 = jnp.sum(x * x, axis=-1)[None, :]
        return jnp.maximum(q2 - 2.0 * qx + x2, 0.0)
    if metric == "ip":
        return -jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if metric == "cosine":
        sim = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 1.0 - jnp.clip(sim, -1.0, 1.0)
    if metric == "l1":
        return jnp.sum(jnp.abs(q[:, None, :] - x[None, :, :]), axis=-1)
    raise ValueError(f"unknown dense metric: {metric}")


@functools.partial(jax.jit, static_argnames=("metric",))
def gathered(
    metric: str,
    vectors: jax.Array,  # [N, D] flat HBM array
    ids: jax.Array,  # [B, K] int32 row ids (invalid ids must be masked by caller)
    queries: jax.Array,  # [B, D]
    base_norms2: jax.Array | None = None,  # [N] precomputed ||x||^2 for l2
) -> jax.Array:
    """Distances from each query b to its own candidate rows ids[b] -> [B, K].

    This is the beam-search hot path: one gather + one batched dot.
    """
    del base_norms2  # accepted for API stability; l2 uses the exact diff form
    safe_ids = jnp.maximum(ids, 0)
    cand = _f32(vectors[safe_ids])  # [B, K, D]
    q = _f32(queries)  # [B, D]
    if metric == "l2":
        # Diff-based (not the matmul expansion): avoids catastrophic
        # cancellation so device distances match the scalar reference
        # (vector.rs:517-526) to f32 rounding. The gather dominates cost
        # at beam sizes, so no MXU loss in practice.
        d = cand - q[:, None, :]
        return jnp.sum(d * d, axis=-1)
    dots = jnp.einsum(
        "bkd,bd->bk",
        cand,
        q,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "ip":
        return -dots
    if metric == "cosine":
        return 1.0 - jnp.clip(dots, -1.0, 1.0)
    if metric == "l1":
        return jnp.sum(jnp.abs(cand - q[:, None, :]), axis=-1)
    raise ValueError(f"unknown dense metric: {metric}")


def order_to_operator_distance(metric: str, d: jax.Array) -> jax.Array:
    """Convert order-distance (proc-1) to the user-facing operator value.

    l2: sqrt (vector.rs:584-594); others are identical.
    """
    if metric == "l2":
        return jnp.sqrt(d)
    return d


def operator_to_order_distance(metric: str, d: jax.Array) -> jax.Array:
    if metric == "l2":
        return d * d
    return d


def normalize_rows(x: jax.Array) -> jax.Array:
    """L2-normalize rows; zero rows stay zero (vector.rs:688-711 semantics)."""
    x32 = _f32(x)
    n = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    return jnp.where(n > 0.0, x32 / jnp.where(n > 0.0, n, 1.0), 0.0).astype(x.dtype)


def row_norms(x: jax.Array) -> jax.Array:
    x32 = _f32(x)
    return jnp.sqrt(jnp.sum(x32 * x32, axis=-1))
