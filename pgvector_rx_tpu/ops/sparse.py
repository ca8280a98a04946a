"""Sparse distance kernels: padded-CSR rows + searchsorted matching.

The reference's merge-join kernels (sparsevec.rs:875-1090) are
data-dependent two-pointer loops that do not vectorize; here each sparse
row is padded to a fixed non-zero budget P (HNSW guarantees nnz <= 1000,
hnsw_constants.rs:7) and index matching uses a vectorized binary search,
giving static shapes for XLA.

Layout: ``indices [N, P] int32`` sorted ascending, padded with
``PAD_INDEX`` (int32 max, keeps rows sorted); ``values [N, P] f32``
padded with 0. All metrics reduce to matched-pair terms:

- dot     = sum over matches of av*bv (pads contribute 0)
- l2      = ||a||^2 + ||b||^2 - 2 dot
- cosine  = 1 - dot / (|a| |b|)
- l1      = sum|a| + sum|b| + sum over matches of (|av-bv| - |av| - |bv|)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PAD_INDEX = np.int32(2**31 - 1)

SPARSE_METRICS = ("l2", "ip", "cosine", "l1")


def pad_rows(rows, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of SparseVec (or (indices, values) pairs) into padded CSR."""
    n = len(rows)
    indices = np.full((n, budget), PAD_INDEX, dtype=np.int32)
    values = np.zeros((n, budget), dtype=np.float32)
    for i, r in enumerate(rows):
        idx, val = (r.indices, r.values) if hasattr(r, "indices") else r
        k = len(idx)
        if k > budget:
            raise ValueError(
                f"sparsevec cannot have more than {budget} non-zero elements for hnsw index"
            )
        indices[i, :k] = idx
        values[i, :k] = val
    return indices, values


def _match_dot_terms(qi, qv, ci, cv):
    """For one (query row, candidate row) pair: matched candidate values.

    qi/ci sorted ascending with PAD_INDEX padding. Returns (qv, matched_cv)
    aligned on the query's positions; non-matches give 0.
    """
    pos = jnp.searchsorted(ci, qi)
    pos_c = jnp.minimum(pos, ci.shape[0] - 1)
    found = (pos < ci.shape[0]) & (ci[pos_c] == qi) & (qi != PAD_INDEX)
    return jnp.where(found, cv[pos_c], 0.0), found


def _terms(metric, qi, qv, ci, cv, q_sq, c_sq, q_abs, c_abs):
    mcv, found = _match_dot_terms(qi, qv, ci, cv)
    dot = jnp.sum(qv * mcv)
    if metric == "l2":
        return jnp.maximum(q_sq + c_sq - 2.0 * dot, 0.0)
    if metric == "ip":
        return -dot
    if metric == "cosine":
        denom = jnp.sqrt(q_sq * c_sq)
        sim = jnp.where(denom > 0.0, dot / jnp.where(denom > 0.0, denom, 1.0), 0.0)
        return 1.0 - jnp.clip(sim, -1.0, 1.0)
    if metric == "l1":
        corr = jnp.sum(
            jnp.where(found, jnp.abs(qv - mcv) - jnp.abs(qv) - jnp.abs(mcv), 0.0)
        )
        return q_abs + c_abs + corr
    raise ValueError(f"unknown sparse metric: {metric}")


@functools.partial(jax.jit, static_argnames=("metric",))
def pairwise(
    metric: str,
    base_indices: jax.Array,  # [N, P]
    base_values: jax.Array,  # [N, P]
    query_indices: jax.Array,  # [B, P]
    query_values: jax.Array,  # [B, P]
) -> jax.Array:
    """[B, N] sparse distances."""
    c_sq = jnp.sum(base_values * base_values, axis=-1)
    c_abs = jnp.sum(jnp.abs(base_values), axis=-1)
    q_sq = jnp.sum(query_values * query_values, axis=-1)
    q_abs = jnp.sum(jnp.abs(query_values), axis=-1)

    def one_pair(qi, qv, qs, qa, ci, cv, cs, ca):
        return _terms(metric, qi, qv, ci, cv, qs, cs, qa, ca)

    per_query = jax.vmap(
        lambda qi, qv, qs, qa: jax.vmap(
            lambda ci, cv, cs, ca: one_pair(qi, qv, qs, qa, ci, cv, cs, ca)
        )(base_indices, base_values, c_sq, c_abs)
    )
    return per_query(query_indices, query_values, q_sq, q_abs)


@functools.partial(jax.jit, static_argnames=("metric",))
def gathered(
    metric: str,
    base_indices: jax.Array,  # [N, P]
    base_values: jax.Array,  # [N, P]
    ids: jax.Array,  # [B, K]
    query_indices: jax.Array,  # [B, P]
    query_values: jax.Array,  # [B, P]
) -> jax.Array:
    """Per-query candidate distances [B, K] for sparse beam search."""
    safe_ids = jnp.maximum(ids, 0)
    ci = base_indices[safe_ids]  # [B, K, P]
    cv = base_values[safe_ids]
    c_sq = jnp.sum(cv * cv, axis=-1)
    c_abs = jnp.sum(jnp.abs(cv), axis=-1)
    q_sq = jnp.sum(query_values * query_values, axis=-1)
    q_abs = jnp.sum(jnp.abs(query_values), axis=-1)

    def per_query(qi, qv, qs, qa, ci_k, cv_k, cs_k, ca_k):
        return jax.vmap(
            lambda c_i, c_v, c_s, c_a: _terms(metric, qi, qv, c_i, c_v, qs, c_s, qa, c_a)
        )(ci_k, cv_k, cs_k, ca_k)

    return jax.vmap(per_query)(
        query_indices, query_values, q_sq, q_abs, ci, cv, c_sq, c_abs
    )
