"""Top-k and beam-merge primitives.

The device replacement for the reference's candidate/result binary heaps
(graph/mod.rs:86-139, scan.rs NearestSC/FurthestSC): fixed-size sorted
beams merged with ``jax.lax.sort`` / ``top_k``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: Sentinel distance for invalid/padded candidates.
INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_smallest(dists: jax.Array, ids: jax.Array, k: int):
    """Smallest-k by distance along the last axis. Returns (dists, ids)."""
    neg, idx = jax.lax.top_k(-dists, k)
    return -neg, jnp.take_along_axis(ids, idx, axis=-1)


def merge_beams(
    beam_d: jax.Array,  # [B, E1]
    beam_payload: tuple,  # tuple of [B, E1] arrays (ids, flags, ...)
    new_d: jax.Array,  # [B, E2]
    new_payload: tuple,  # tuple of [B, E2] arrays
    k: int,
):
    """Merge two distance-sorted (or unsorted) beams, keep k nearest.

    Ties resolve toward lower id when the first payload array is the id
    (jax.lax.sort is stable, and we sort (distance, *payload) tuples),
    making merges deterministic — the analog of the reference's
    deterministic heap pops for golden tests.
    """
    d = jnp.concatenate([beam_d, new_d], axis=-1)
    payload = [
        jnp.concatenate([a, b], axis=-1) for a, b in zip(beam_payload, new_payload)
    ]
    sorted_all = jax.lax.sort([d] + payload, dimension=-1, num_keys=2)
    return sorted_all[0][..., :k], tuple(p[..., :k] for p in sorted_all[1:])


@functools.partial(jax.jit, static_argnames=("k", "unique_by_id"))
def sort_beam(d: jax.Array, ids: jax.Array, k: int, unique_by_id: bool = False):
    """Sort candidates by (distance, id); optionally mask duplicate ids to inf."""
    if unique_by_id:
        sd, si = jax.lax.sort([d, ids], dimension=-1, num_keys=2)
        dup = jnp.concatenate(
            [jnp.zeros_like(si[..., :1], dtype=bool), si[..., 1:] == si[..., :-1]],
            axis=-1,
        )
        sd = jnp.where(dup, INF, sd)
        sd, si = jax.lax.sort([sd, si], dimension=-1, num_keys=2)
        return sd[..., :k], si[..., :k]
    sd, si = jax.lax.sort([d, ids], dimension=-1, num_keys=2)
    return sd[..., :k], si[..., :k]
