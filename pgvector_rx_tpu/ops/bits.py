"""Packed-bit distance kernels: Hamming and Jaccard on int32 lanes.

Replaces the reference's byte-LUT popcounts (bitvec.rs:97-132) with
``jax.lax.population_count`` on 32-bit words, which lowers to native VPU
popcounts on TPU. Bit vectors are packed MSB-first into uint32 words,
zero-padded — the same logical layout as PostgreSQL varbit, widened from
bytes to words.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIT_METRICS = ("hamming", "jaccard")


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """Pack a [N, nbits] 0/1 array into [N, ceil(nbits/32)] uint32 words."""
    b = np.asarray(bits, dtype=np.uint8)
    if b.ndim == 1:
        b = b[None, :]
    nbits = b.shape[1]
    pad = (-nbits) % 32
    if pad:
        b = np.pad(b, ((0, 0), (0, pad)))
    by = np.packbits(b, axis=1)  # MSB-first bytes
    return by.reshape(b.shape[0], -1, 4).view(">u4").astype(np.uint32).reshape(
        b.shape[0], -1
    )


def unpack_bits(words: np.ndarray, nbits: int) -> np.ndarray:
    w = np.asarray(words, dtype=np.uint32)
    by = w.astype(">u4").view(np.uint8).reshape(w.shape[0], -1)
    bits = np.unpackbits(by, axis=1)
    return bits[:, :nbits]


def _popcount_sum(x: jax.Array) -> jax.Array:
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("metric",))
def pairwise(metric: str, base: jax.Array, queries: jax.Array) -> jax.Array:
    """base [N, W] uint32, queries [B, W] uint32 -> [B, N] distances."""
    a = queries[:, None, :]  # [B, 1, W]
    b = base[None, :, :]  # [1, N, W]
    if metric == "hamming":
        return _popcount_sum(jnp.bitwise_xor(a, b))
    if metric == "jaccard":
        ab = _popcount_sum(jnp.bitwise_and(a, b))
        aa = _popcount_sum(queries)[:, None]
        bb = _popcount_sum(base)[None, :]
        union = aa + bb - ab
        return jnp.where(ab == 0.0, 1.0, 1.0 - ab / jnp.where(union > 0, union, 1.0))
    raise ValueError(f"unknown bit metric: {metric}")


@functools.partial(jax.jit, static_argnames=("metric",))
def gathered(
    metric: str,
    words: jax.Array,  # [N, W] uint32
    ids: jax.Array,  # [B, K]
    queries: jax.Array,  # [B, W] uint32
    base_pop: jax.Array | None = None,  # [N] popcounts (jaccard)
) -> jax.Array:
    """Per-query candidate distances [B, K] — beam-search hot path."""
    safe_ids = jnp.maximum(ids, 0)
    cand = words[safe_ids]  # [B, K, W]
    q = queries[:, None, :]  # [B, 1, W]
    if metric == "hamming":
        return _popcount_sum(jnp.bitwise_xor(cand, q))
    if metric == "jaccard":
        ab = _popcount_sum(jnp.bitwise_and(cand, q))
        aa = _popcount_sum(queries)[:, None]
        bb = base_pop[safe_ids] if base_pop is not None else _popcount_sum(cand)
        union = aa + bb - ab
        return jnp.where(ab == 0.0, 1.0, 1.0 - ab / jnp.where(union > 0, union, 1.0))
    raise ValueError(f"unknown bit metric: {metric}")


def unpack_words_bf16(words: jax.Array) -> jax.Array:
    """Device-side unpack: [N, W] uint32 -> [N, W*32] bfloat16 {0,1}.

    MSB-first bit order within each word, matching ``pack_bits``. Feeds
    the MXU bit-distance formulation: with rows/queries unpacked to
    bf16 {0,1}, one f32-accumulated matmul gives exact
    popcount(AND) (products are 0/1; sums stay < 2^24), from which
    Hamming and Jaccard both derive — replacing the reference's
    byte-LUT popcount loop (bitvec.rs:97-132) with systolic-array work.
    """
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)  # MSB-first
    bits = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(words.shape[0], -1).astype(jnp.bfloat16)
