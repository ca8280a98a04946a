"""Batched device bulk build: HNSW construction as tensor ops.

The TPU-native replacement for the reference's sequential heap-scan build
(build.rs:400-535, one graph insertion per tuple). Construction proceeds
in batches against a frozen graph snapshot:

  for each batch (size doubling until BMAX):
    1. [device] one MXU matmul scores the whole batch against every
       committed element (exact candidate generation — the TPU-KNN
       formulation replaces graph descent, whose random row gathers
       are latency-bound on TPU); per layer, a masked top-k keeps the
       ef_construction nearest among elements with level >= layer and
       the vectorized Alg. 4 heuristic selects neighbors
    2. [host]   zero-distance selected neighbors are byte-compared for
       duplicate folding (build.rs:474-510: absorbed into the existing
       element's heap-TID list, <= 10, element discarded)
    3. [device] commit: scatter forward edges; group back-edge requests
       by target and re-select each touched target's neighbor list
       (graph/mod.rs:442-489, resolved batch-deterministically);
       promote the entry point (build.rs:523-528 rule applied to the
       batch: first element reaching the batch max level)

Elements inside one batch do not see each other (frozen snapshot); the
doubling schedule keeps that approximation tight (each batch at most
doubles the graph). Recall parity is validated against the sequential
host build in tests.

All steps are jit-compiled with static shapes: arrays are pre-allocated
at final capacity and batches padded to the schedule size. Layer
variation is expressed with masks / a stacked layer axis rather than
unrolled loops, keeping each compiled program small (XLA compile time,
not device time, otherwise dominates on fresh shapes).
"""

from __future__ import annotations

import functools
import gc
import math
import os
import sys
import time
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import hnsw_get_layer_m
from ..utils.jaxcache import enable as _enable_jax_cache

_enable_jax_cache()

# below this corpus size exact top_k is cheap; above it use approx_min_k
_APPROX_TOPK_MIN = 16384

#: cap at/above which the back-edge commit honors K=2 same-target adds
#: by default instead of 4 (see DeviceBuilder._be_k)
_BE_K2_MIN_CAP = 1 << 19

# committed-prefix width at which ground-layer candidate generation
# switches from the exact MXU sweep (quadratic in N: scoring every
# batch against the whole committed prefix) to batched beam descent
# over the graph built so far (the classic HNSW construction search,
# O(N log N) total). The exact sweep is faster per batch below this
# width; the beam is asymptotically cheaper above it AND generates
# path-diverse candidates (not just the tightest exact neighbors),
# which the select heuristic needs for long-range navigability.
_DESCENT_MIN_WIDTH = int(os.environ.get("PGV_BUILD_DESCENT_MIN", 65536))

# Stream the corpus upload in chunks behind the early build groups when
# the upload is at least this large. Measured through the tunneled
# backend at 1M x 128-d: the single 512MB f32 upload costs 31s of the
# 127s build and transfers DO overlap compute (probe 2026-08-17), so
# chunked uploads interleaved with the group dispatches hide most of
# it. PGV_BUILD_STREAM=0 disables.
_STREAM_MIN_BYTES = int(os.environ.get("PGV_BUILD_STREAM_MIN", 64 << 20))
_STREAM_CHUNK_BYTES = int(os.environ.get("PGV_BUILD_STREAM_CHUNK", 64 << 20))

# Debug-only cost attribution: comma-separated block names skipped at
# TRACE time ("be0", "beu", "fwdupc"). Builds with a non-empty value
# produce WRONG graphs — this exists solely so probe runs can ablate
# commit sub-steps inside the real fused pipeline (per-block standalone
# timing through the tunnel is polluted by per-dispatch overhead).
_ABLATE = frozenset(
    filter(None, os.environ.get("PGV_BUILD_ABLATE", "").split(","))
)


# batches folded into one device program dispatch (see _bucket_program).
# The dev harness's tunnel charges ~0.5s per program dispatch no matter
# how small, so the build runs up to this many (search+commit) batches
# per dispatch inside a lax.fori_loop; the trip count is a traced
# scalar, so one compiled program per width bucket serves any batch
# count.
_BATCHES_PER_DISPATCH = 128


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 1).bit_length()


#: when bound to a list (bench.py), run_all appends one
#: (width, n_elems, seconds) tuple per dispatched group, syncing the
#: device after each group so the timings are real. Lets the bench
#: report a steady-state build rate next to end-to-end and makes cold
#: program-load windows visible instead of silently billed.
GROUP_STATS: list | None = None


def cap_pad_for(n: int, cap_floor: int = 0) -> int:
    """The padded array capacity a DeviceBuilder would pick for an
    n-row corpus (1/8-octave size bucket; see DeviceBuilder.__init__).
    Exposed so bench warmup can pin PGV_BUILD_CAP_FLOOR to the exact
    static shapes of a bigger build and pre-compile its program set
    with a small corpus."""
    granule = max(4096, _next_pow2(n + 1) // 8)
    cap_pad = -(-(n + 1) // granule) * granule
    return max(cap_pad, cap_floor)


def shape_floors_for(n: int, m: int, levels: "np.ndarray"):
    """(upper_floor, sub_floors_csv) pinning the upper-table and
    per-layer sub-table pads an n-row build with these level draws
    will pick. PGV_BUILD_CAP_FLOOR pins the element-capacity shapes,
    but the upper tables pad to data-dependent pow2 buckets
    (_next_pow2 of the actual level>=l counts) — a small warmup corpus
    lands in different buckets and its "warm" programs miss, leaving
    45-171s recompiles INSIDE the timed build (BENCH r5 cold run:
    2,724 vec/s e2e vs 13,616 steady). Builds are seed-deterministic,
    so the bench pre-draws the big build's exact level array and pins
    these floors for the warmup build (PGV_BUILD_UPPER_FLOOR /
    PGV_BUILD_SUB_FLOORS)."""
    cap_pad = cap_pad_for(n)
    lmax = max(
        int(math.log(_next_pow2(cap_pad)) / math.log(max(m, 2))) + 3, 1
    )
    lv = np.minimum(np.asarray(levels, dtype=np.int32), lmax)
    upper_floor = _next_pow2(int((lv >= 1).sum()) + 1)
    subs = ",".join(
        str(max(128, _next_pow2(int((lv >= lc).sum()) + 1)))
        for lc in range(2, lmax + 1)
    )
    return upper_floor, subs


@functools.partial(jax.jit, static_argnames=("rows", "dim"))
def _stream_init(rows: int, dim: int):
    """All three streaming buffers in ONE program (each fresh program
    costs ~45-90s of XLA compile through the tunneled backend)."""
    return (
        jnp.zeros((rows, dim), dtype=jnp.float32),
        jnp.zeros((rows, dim), dtype=jnp.bfloat16),
        jnp.zeros((rows,), dtype=jnp.float32),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _stream_apply(vec, bf, x2, chunk, start):
    """Write one corpus chunk into the (donated) streaming buffers and
    derive its bf16/x2 views on device — the per-chunk form of the
    init-time cast/reduce."""
    vec = jax.lax.dynamic_update_slice(vec, chunk, (start, 0))
    bf = jax.lax.dynamic_update_slice(
        bf, chunk.astype(jnp.bfloat16), (start, 0)
    )
    x2 = jax.lax.dynamic_update_slice(
        x2, jnp.sum(chunk * chunk, axis=1), (start,)
    )
    return vec, bf, x2


def _is_device_array(x) -> bool:
    """True for jax.Array inputs (device-resident corpus path)."""
    if isinstance(x, np.ndarray):
        return False
    mod = type(x).__module__
    return mod.startswith("jax") or mod.startswith("jaxlib")


@functools.partial(jax.jit, static_argnames=("rows",))
def _ingest_device(vec, rows: int):
    """Pad a device-resident [N, D] corpus to the capacity bucket and
    derive its bf16/x2 views — the device-input replacement for the
    host streaming upload (no host<->device transfer at all)."""
    buf = jnp.zeros((rows, vec.shape[1]), jnp.float32)
    buf = jax.lax.dynamic_update_slice(
        buf, vec.astype(jnp.float32), (0, 0)
    )
    return buf, buf.astype(jnp.bfloat16), jnp.sum(buf * buf, axis=1)


@functools.partial(
    jax.jit, static_argnames=("cap_pad", "upper_pad", "lmax")
)
def _ingest_tables_device(
    vec_pad, levels_i8, perm, cap_pad: int, upper_pad: int, lmax: int
):
    """Derive every builder table from a device-resident corpus in ONE
    program: padded levels, shuffled upper-slot map, upper id/mask
    tables, and the upper vector matrix + x2. Only the [n] int8 levels
    and the [n_upper] permutation are uploaded (~1.3MB at 1M rows vs
    ~9MB for the host-built tables — init transfers were a measured
    ~4s of the device-input build)."""
    n = levels_i8.shape[0]
    levels = jnp.full((cap_pad,), -1, jnp.int32)
    levels = jax.lax.dynamic_update_slice(
        levels, levels_i8.astype(jnp.int32), (0,)
    )
    ids = jnp.arange(cap_pad, dtype=jnp.int32)
    # stable invalid-last sort: the first n_upper entries are the
    # level>=1 ids in id order (= the host path's np.nonzero order)
    key = jnp.where(levels >= 1, 0, 1).astype(jnp.int32)
    _, ups_sorted = jax.lax.sort([key, ids], num_keys=1)
    U = perm.shape[0]
    ups = ups_sorted[:U] if U else jnp.zeros((0,), jnp.int32)
    upper_slot = jnp.full((cap_pad,), -1, jnp.int32).at[ups].set(perm)
    up_ids = jnp.full((upper_pad,), cap_pad - 1, jnp.int32).at[perm].set(
        ups
    )
    up_levels = jnp.full((upper_pad,), -1, jnp.int32).at[perm].set(
        levels[ups]
    )
    up_masks = (
        up_levels[None, :]
        >= jnp.arange(1, lmax + 1, dtype=jnp.int32)[:, None]
    )
    up_vecs = (
        jnp.zeros((upper_pad, vec_pad.shape[1]), jnp.float32)
        .at[perm]
        .set(vec_pad[ups])
    )
    return (
        levels,
        upper_slot,
        up_ids,
        up_masks,
        up_vecs,
        jnp.sum(up_vecs * up_vecs, axis=1),
    )


def _pack_bf16_pairs(x: jax.Array) -> jax.Array:
    """bf16 [..., 2k] -> int32 [..., k] (bit-exact adjacent-pair pack).

    Neighbor ids and their bf16 pruning distances live in ONE int32
    array so each graph mutation is ONE scatter: a TPU scatter op
    costs ~3-9 ms nearly independent of payload size (measured
    2026-08-17), so halving the scatter count in the commit program is
    worth the packed layout."""
    r = x.reshape(*x.shape[:-1], -1, 2)
    return jax.lax.bitcast_convert_type(r, jnp.int32)


def _unpack_bf16_pairs(c: jax.Array) -> jax.Array:
    """int32 [..., k] -> bf16 [..., 2k] (inverse of _pack_bf16_pairs)."""
    r = jax.lax.bitcast_convert_type(c, jnp.bfloat16)
    return r.reshape(*c.shape[:-1], -1)


def _pack_nbrc(ids: jax.Array, d: jax.Array) -> jax.Array:
    """ids int32 [..., k] + d (cast to bf16) [..., k] -> [..., k + k//2].

    k must be even (ground layer uses k = 2m, always even)."""
    return jnp.concatenate(
        [ids, _pack_bf16_pairs(d.astype(jnp.bfloat16))], axis=-1
    )


def _split_nbrc(c: jax.Array, k: int):
    """[..., k + k//2] combined row -> (ids int32 [..., k], d bf16 [..., k])."""
    return c[..., :k], _unpack_bf16_pairs(c[..., k:])


def _upper_pack(ids_flat: jax.Array, d_flat: jax.Array, m: int, mp2: int):
    """Layer-flat ids [R, L*m] + dists [R, L*m] -> combined [R, L*(m+mp2)].

    Distances pack per layer (mp2 = ceil(m/2) int32 cols each; odd m pads
    one inf bf16 slot) and sit AFTER all id columns: id col = l*m + j,
    dist col = L*m + l*mp2 + j//2."""
    R, cols = ids_flat.shape
    L = cols // m
    d3 = d_flat.reshape(R, L, m)
    pad = 2 * mp2 - m
    if pad:
        d3 = jnp.pad(
            d3, ((0, 0), (0, 0), (0, pad)), constant_values=jnp.inf
        )
    dpk = _pack_bf16_pairs(d3.astype(jnp.bfloat16)).reshape(R, L * mp2)
    return jnp.concatenate([ids_flat, dpk], axis=-1)


def _upper_unpack(comb: jax.Array, m: int, mp2: int):
    """Inverse of _upper_pack: [R, L*(m+mp2)] -> (ids [R, L*m] int32,
    d [R, L*m] bf16)."""
    R, cols = comb.shape
    L = cols // (m + mp2)
    ids = comb[:, : L * m]
    d = _unpack_bf16_pairs(comb[:, L * m :].reshape(R, L, mp2))[:, :, :m]
    return ids, d.reshape(R, L * m)


@jax.jit
def _gather_sub_table(up_vecs, slots):
    """Per-layer sub-table rows gathered from the upper vector matrix
    on device (zero row-upload; only the [P_l] slot column uploads).
    Pad slots point at a zero row, so x2 pads are 0 and the colmask
    (ids == cap sentinel) is what excludes them."""
    v = up_vecs[slots]
    return v, jnp.sum(v * v, axis=1)


@functools.partial(jax.jit, static_argnames=("rows", "idw", "dw"))
def _init_combined(rows: int, idw: int, dw: int) -> jax.Array:
    """Fresh combined adjacency: idw id cols of -1 + dw packed-inf cols
    (ONE program — eager per-array jnp.full would pay a tunnel dispatch
    per buffer)."""
    ids = jnp.full((rows, idw), -1, jnp.int32)
    dpk = _pack_bf16_pairs(
        jnp.full((rows, dw * 2), jnp.inf, jnp.bfloat16)
    )
    return jnp.concatenate([ids, dpk], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("cap_pad", "upper_pad", "lm0", "m", "lmax", "mp2",
                     "ivf", "ivf_cap"),
)
def _init_build_arrays(cap_pad: int, upper_pad: int, lm0: int, m: int,
                       lmax: int, mp2: int, ivf: bool, ivf_cap: int):
    """ALL fresh builder state in ONE compiled program: both combined
    adjacency arrays plus the scalar/flag vectors. Each distinct program
    pays a one-time per-process load through the tunneled backend
    (~1-3s even cache-warm), so builder startup fuses its buffer
    initialization into a single dispatch."""
    nb0c = _init_combined(cap_pad, lm0, lm0 // 2)
    upc = _init_combined(upper_pad, lmax * m, lmax * mp2)
    alive = jnp.zeros((cap_pad,), dtype=jnp.bool_)
    tid_counts = jnp.zeros((cap_pad,), dtype=jnp.int32)
    absorb = jnp.full((cap_pad,), -1, dtype=jnp.int32)
    members = jnp.full(
        (upper_pad, ivf_cap) if ivf else (1, 1), -1, dtype=jnp.int32
    )
    member_counts = jnp.zeros((upper_pad if ivf else 1,), dtype=jnp.int32)
    return nb0c, upc, alive, tid_counts, absorb, members, member_counts


@functools.partial(jax.jit, static_argnames=("m", "mp2"))
def _upper_pack_jit(ids_flat, d_flat, m: int, mp2: int):
    return _upper_pack(ids_flat, d_flat, m, mp2)


_pack_nbrc_jit = jax.jit(_pack_nbrc)


@functools.partial(jax.jit, static_argnames=("k", "m", "mp2"))
def _unpack_host_jit(nb0c, upc, k: int, m: int, mp2: int):
    """Unpack both adjacency arrays for host download (f32 dists)."""
    ids0, d0 = _split_nbrc(nb0c, k)
    upi, upd = _upper_unpack(upc, m, mp2)
    return ids0, d0.astype(jnp.float32), upi, upd.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "idw"))
def _ids_views_jit(nb0c, upc, k: int, idw: int):
    """Id-only contiguous views for the serving DeviceGraph."""
    return nb0c[:, :k], upc[:, :idw]


class BuildArrays(NamedTuple):
    """Mutable graph state threaded through the jitted steps."""

    # ground-layer adjacency, combined layout (see _pack_nbrc):
    # cols [0, 2m) = neighbor ids int32 (-1 pad), cols [2m, 3m) =
    # bf16-pair-packed pruning distances (+inf pad)
    nb0c: jax.Array  # [cap+1, 3m] int32
    # upper layers stored FLAT [U+1, LMAX*m (+ LMAX*m/2 packed dists)]:
    # a trailing dim of m (16) would tile to T(8,128) on TPU, padding
    # the minor dim 8x and LMAX to 16 — a measured 14x memory blowup
    # (8GB at 10M rows). Combined layout: id col lidx*m + j, dist int32
    # col LMAX*m + lidx*(m/2) + j/2 (pairs pack within a layer; m even)
    upc: jax.Array  # [U+1, LMAX*m*3/2] int32
    alive: jax.Array  # [cap+1] bool — committed, not duplicate-folded
    tid_counts: jax.Array  # [cap+1] int32 heap TIDs per element (<= 10)
    absorb: jax.Array  # [cap+1] int32 duplicate-fold target (-1 = none)
    entry: jax.Array  # scalar int32 (-1 empty)
    entry_level: jax.Array  # scalar int32
    # IVF ground-candidate state (PGV_BUILD_GROUND=ivf): per upper row
    # ("center"), the committed element ids assigned to it. [(1,1)/(1,)
    # placeholders when the beam generator is active.]
    members: jax.Array  # [U+1, CAP_M] int32, -1 pad (flat-scattered)
    member_counts: jax.Array  # [U+1] int32


class BuildData(NamedTuple):
    """Immutable per-build device arrays, passed as ARGUMENTS to every
    jitted step (never closed over: a closed-over array is baked into
    the HLO as a literal, which bloats compile time and defeats the
    persistent compilation cache across builds)."""

    vectors: jax.Array  # [cap+1, D] f32
    vectors_bf16: jax.Array  # [cap+1, D] bf16 (pair/pruning math: half the
    # gather bytes and full-rate MXU; kept distances stay f32-exact)
    x2: jax.Array  # [cap+1] f32, ||x||^2 per row
    levels: jax.Array  # [cap+1] int32
    upper_slot: jax.Array  # [cap+1] int32
    # compact view of the ~N/m elements with level >= 1: upper-layer
    # candidate generation scores against THESE rows only instead of
    # re-sweeping (and re-top_k'ing) the full corpus per layer
    upper_vectors: jax.Array  # [U+1, D] f32
    upper_bf16: jax.Array  # [U+1, D] bf16 (MXU sweep copy; see 6f)
    upper_x2: jax.Array  # [U+1] f32
    upper_ids: jax.Array  # [U+1] int32 element id per slot (pad=cap)
    upper_level_masks: jax.Array  # [LMAX, U+1] bool (level >= layer)
    # per-layer sub-tables for layers >= 2: (ids, vectors, x2) over the
    # ~N/m^(l-1) elements with level >= l. Layer-l candidate selection
    # scores ITS OWN narrow table instead of a full-width masked pass
    # over the layer-1 table — at 10M rows the LMAX x [*, 1M] masked
    # selection passes were the single largest per-batch cost (~60ms of
    # 171ms, probe 2026-08-19); layer-2+ tables are 16x..4096x narrower
    upper_sub: tuple = ()  # ((ids [P_l], vecs [P_l, D], x2 [P_l]), ...)


# ---------------------------------------------------------------------------
# distance helpers (dense f32; bit/sparse handled by the host path for now)
# ---------------------------------------------------------------------------


def _l2_to_jaccard(h, sq_a, sq_b):
    """{0,1}-row squared-l2 -> jaccard distance (builder metric
    "jacbits").

    For binary rows a, b: |a XOR b| = l2²(a,b) = h, popcounts
    aa = ||a||², bb = ||b||², intersection = (aa+bb-h)/2, union =
    (aa+bb+h)/2, so jaccard = 1 - inter/union = 2h / (aa+bb+h).
    Both-zero rows (denominator 0) are distance 1.0, matching the
    reference's ab == 0 rule (bitvec.rs:113-132). All terms are exact
    small integers in f32, so the transform is exact.
    """
    denom = sq_a + sq_b + h
    return jnp.where(
        denom > 0.0, 2.0 * h / jnp.where(denom > 0.0, denom, 1.0), 1.0
    )


def _pair_matrix(metric: str, rows):
    """All-pairs order distances among rows [..., C, D] -> [..., C, C].

    l2 uses the matmul identity ||a-b||^2 = ||a||^2+||b||^2-2ab so the
    MXU does the work instead of materializing a [..., C, C, D]
    difference tensor (which is memory-bound and HBM-hungry).
    "jacbits" (jaccard over unpacked {0,1} rows — the bit device
    build) derives from the same identity via _l2_to_jaccard.
    """
    if metric in ("l2", "jacbits"):
        dots = jnp.einsum(
            "...id,...jd->...ij", rows, rows,
            preferred_element_type=jnp.float32,
        )
        sq = jnp.sum(
            rows.astype(jnp.float32) * rows.astype(jnp.float32), axis=-1
        )
        h = jnp.maximum(
            sq[..., :, None] + sq[..., None, :] - 2.0 * dots, 0.0
        )
        if metric == "jacbits":
            return _l2_to_jaccard(h, sq[..., :, None], sq[..., None, :])
        return h
    if metric == "ip":
        return -jnp.einsum(
            "...id,...jd->...ij", rows, rows,
            preferred_element_type=jnp.float32,
        )
    if metric == "cosine":
        sims = jnp.einsum(
            "...id,...jd->...ij", rows, rows,
            preferred_element_type=jnp.float32,
        )
        return 1.0 - jnp.clip(sims, -1.0, 1.0)
    if metric == "l1":
        return jnp.sum(
            jnp.abs(rows[..., :, None, :] - rows[..., None, :, :]), axis=-1
        )
    raise ValueError(metric)


# ---------------------------------------------------------------------------
# vectorized select_neighbors (Algorithm 4 over sorted candidates)
# ---------------------------------------------------------------------------


def _select_neighbors_batch(cand_d, cand_ids, pair, lm: int):
    """Vectorized Alg. 4 heuristic (graph/mod.rs:269-308).

    cand_d/cand_ids [B, C] sorted nearest-first (+inf/-1 pads),
    pair [B, C, C] candidate pairwise distances. Returns (d, ids) [B, lm]
    in keep order (kept in distance order, then backfill in order).
    """
    B, C = cand_d.shape

    def body(i, carry):
        keep, kept_cnt = carry  # keep [B, C] bool, kept_cnt [B]
        di = cand_d[:, i]  # [B]
        pi = pair[:, i, :]  # [B, C]
        # min distance from candidate i to any kept element
        masked = jnp.where(keep, pi, jnp.inf)
        min_kept = jnp.min(masked, axis=1)
        valid = jnp.isfinite(di)
        closer = (min_kept > di) & (kept_cnt < lm) & valid
        keep = keep.at[:, i].set(closer)
        kept_cnt = kept_cnt + closer.astype(jnp.int32)
        return keep, kept_cnt

    keep, _ = jax.lax.fori_loop(
        0, C, body, (jnp.zeros((B, C), dtype=bool), jnp.zeros(B, jnp.int32))
    )

    # order: kept first (by position = distance order), then discarded
    # valid candidates (backfill), then pads; take first lm
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    valid = jnp.isfinite(cand_d)
    priority = jnp.where(keep, 0, jnp.where(valid, 1, 2)).astype(jnp.int32)
    rank = priority * C + pos  # stable composite key
    order = jnp.argsort(rank, axis=1)[:, :lm]
    out_d = jnp.take_along_axis(cand_d, order, axis=1)
    out_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    # backfilled-but-over-lm entries handled by the take; mask pads
    out_ids = jnp.where(jnp.isfinite(out_d), out_ids, -1)
    out_d = jnp.where(jnp.isfinite(out_d), out_d, jnp.inf)
    return out_d, out_ids


def _select_neighbors_parallel(cand_d, cand_ids, pair, lm: int,
                               alpha_eff: float = 1.0):
    """Parallel relative-neighborhood selection (device-build variant).

    The reference heuristic (graph/mod.rs:269-308) keeps candidate i iff
    it is closer to the query than to every previously KEPT candidate —
    an inherently sequential chain (a fori_loop of C dependent steps,
    which is latency-bound on TPU). This variant tests i against every
    CLOSER candidate j (kept or not): keep_i = min_{j<i} pair[i,j] >
    d_i — one masked matrix reduction, fully parallel. It prunes at
    least as hard as the reference rule; the backfill then tops the
    list up with the nearest discarded candidates exactly like the
    reference's "keep pruned connections" pass, so out-degree is
    unchanged. Build-recall parity is enforced by tests.

    cand_d/cand_ids [B, C] sorted nearest-first (+inf/-1 pads).
    Returns (d, ids) [B, min(lm, C)] in keep order + backfill.
    """
    B, C = cand_d.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)  # j index (rows)
    earlier = pos < jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    pair_e = jnp.where(earlier[None], pair, jnp.inf)  # pair[b, j, i], j<i
    valid = jnp.isfinite(cand_d)

    # Fixpoint iteration of the sequential keep chain: start from the
    # all-kept overestimate; each round recomputes every candidate's
    # decision against the current keep set. Rounds alternate between
    # over- and under-estimates and converge to the sequential greedy's
    # unique fixpoint; log2(C)+2 rounds recover it in practice (recall
    # parity vs the fori_loop version is test-enforced), at a handful
    # of fully-parallel [B, C, C] reductions instead of a C-step chain.
    # alpha_eff > 1 (Vamana RobustPrune): discard candidate i only when
    # a kept closer candidate j is MUCH closer to i than the query is
    # (alpha * d(j,i) <= d(q,i)). The device build's candidates are
    # exact nearest neighbors — purely local, unlike the reference's
    # path-dependent beam candidates — so a pinch of alpha restores the
    # long-range edges HNSW navigability needs. alpha_eff is the
    # order-distance-domain factor (alpha^2 for squared l2).
    thresh = cand_d / alpha_eff
    keep = valid
    for _ in range(max(2, int(math.ceil(math.log2(max(C, 2)))) + 2)):
        min_kept = jnp.min(
            jnp.where(keep[:, :, None], pair_e, jnp.inf), axis=1
        )  # [B, C]
        keep = (min_kept > thresh) & valid
    rank = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    keep = keep & (rank <= lm)

    cpos = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    priority = jnp.where(keep, 0, jnp.where(valid, 1, 2)).astype(jnp.int32)
    # one payload-carrying sort instead of argsort + two gathers
    # (measured ~4x cheaper at the back-edge pass's row counts)
    _, out_d, out_ids = jax.lax.sort(
        [priority * C + cpos, cand_d, cand_ids], num_keys=1
    )
    out_d = out_d[:, :lm]
    out_ids = out_ids[:, :lm]
    out_ids = jnp.where(jnp.isfinite(out_d), out_ids, -1)
    out_d = jnp.where(jnp.isfinite(out_d), out_d, jnp.inf)
    return out_d, out_ids


# ---------------------------------------------------------------------------
# per-batch search step (jitted)
# ---------------------------------------------------------------------------


class DeviceBuilder:
    """Owns the device arrays + the small jit-compiled build steps.

    Compile-friendliness is a design constraint: instead of one giant
    layer-unrolled program, the build uses four small programs reused
    across every batch and layer (scoring+selection, forward commit,
    ground back-edges, upper back-edges). Layer variation is expressed
    with masks and a lax.map over a stacked layer axis, never by
    unrolling, so each program stays small and the persistent
    compilation cache hits across builds of the same shape.
    """

    def __init__(self, metric: str, vectors: np.ndarray, levels: np.ndarray, m: int,
                 ef_construction: int, batch_max: int = 1024,
                 alpha: float | None = None, consume_input: bool = False,
                 ground: str | None = None):
        _it0 = time.time()
        _timing = os.environ.get("PGV_BUILD_TIMING")

        def _imark(name):
            nonlocal _it0
            if _timing:
                t = time.time()
                print(f"[build]   init.{name} {t - _it0:.2f}s",
                      file=sys.stderr, flush=True)
                _it0 = t

        self.metric = metric
        self.m = m
        self.efc = ef_construction
        # RobustPrune alpha (see _select_neighbors_parallel); ip's order
        # distance is signed so scaling is meaningless there
        if alpha is None:
            alpha = float(os.environ.get("PGV_BUILD_ALPHA", 1.0))
        if metric == "l2":
            self.alpha_eff = alpha * alpha  # squared-distance domain
        elif metric == "ip":
            self.alpha_eff = 1.0
        else:
            self.alpha_eff = alpha
        # Upper-layer RobustPrune alpha (experimental, default OFF):
        # alpha > 1 keeps medium-range edges, but measured at 1M it
        # DEGRADES recall (0.58 vs 0.74 at ef=40) — the m routing slots
        # lose local precision faster than they gain reach. Greedy ef=1
        # descent needs precise near edges more than long ones.
        a_up = float(os.environ.get("PGV_BUILD_ALPHA_UPPER", 1.0))
        if metric == "l2":
            self.alpha_upper = a_up * a_up
        elif metric == "ip":
            self.alpha_upper = 1.0
        else:
            self.alpha_upper = a_up
        self.n = n = vectors.shape[0]
        self.dim = vectors.shape[1]
        self.batch_max = batch_max
        self.lm0 = hnsw_get_layer_m(m, 0)
        self.descent_min = _DESCENT_MIN_WIDTH
        # Ground-candidate generator past the exact floor: "beam" walks
        # the as-built graph (the reference's construction search as
        # fixed-trip tensor ops); "ivf" scores the members of the
        # nearest upper-row cells exactly on the MXU — no serial walk.
        # "auto" (default) picks ivf for the MXU metrics below 512
        # dims: the r4 arm A/B measured the beam descent as the WHOLE
        # flat 10M per-batch premium (16.45 -> 10.43 s/group under
        # ivf, DESIGN.md 6i) and ivf beats the descent at the 1M shape
        # too (6j). At HIGH dim the ivf pool's cell-local candidates
        # undershoot the graph engine's 0.95 recall bar and hops can't
        # close it (r5 arms, 1M x 768-d cosine beam(ef=40): ivf-hop16
        # 0.904, hop32 0.924 at -9% build, beam ground 0.961 at -19% —
        # DESIGN.md 6p), so dim >= 512 pins the descent ground:
        # quality bar first, build rate second. l1 has no matmul
        # identity and jacbits needs the l2 transform in the member
        # scorer — both keep the descent at any dim.
        if ground is None:
            ground = os.environ.get("PGV_BUILD_GROUND", "auto")
        if ground == "auto":
            ground = (
                "ivf"
                if metric in ("l2", "ip", "cosine") and self.dim < 512
                else "beam"
            )
        self.ivf = ground == "ivf"
        self.ivf_cap = int(os.environ.get("PGV_BUILD_IVF_CAP", 64))
        self.ivf_probes = int(os.environ.get("PGV_BUILD_IVF_PROBES", 16))
        # one-hop graph expansion of the ivf pool: additionally score
        # the layer-0 neighbors of the HOP nearest member candidates.
        # Cell members alone build cell-local edges (beam-serving
        # recall 0.88 vs 0.983, DESIGN 6j); the hop re-injects the
        # bridging edges earlier inserts created.
        self.ivf_hop = int(os.environ.get("PGV_BUILD_IVF_HOP", 16))
        self._members_ready = False

        # Every array dimension is padded to a size bucket (1/8-octave
        # granularity, i.e. next_pow2 rounded down to 8 steps per
        # doubling) so the compiled programs — whose HLO embeds these
        # shapes — hit the persistent compilation cache across corpus
        # sizes and across runs. Compile time, not device time, is the
        # dominant cold-start cost of the build.
        # shape floor: emulate a bigger corpus's STATIC shapes
        # (beam step count, array capacities) with a small-n build —
        # lets probes attribute big-N per-batch cost without paying
        # for a full big build (probe_phase.py), and lets bench.py
        # pre-compile a big build's exact program set with a small
        # warmup corpus (cap_pad_for)
        cap_pad = cap_pad_for(
            n, int(os.environ.get("PGV_BUILD_CAP_FLOOR", 0))
        )
        self.cap = cap_pad - 1  # dump row index (scatter sink / gather pad)

        # deterministic max level per size bucket: level counts above
        # ln(cap)/ln(m)+3 occur with probability < m^-3 per element, and
        # clamping them is exactly the reference's max-level cap
        # behavior (build.rs:373-377 caps at hnsw_get_max_level)
        self.lmax = max(
            int(math.log(_next_pow2(cap_pad)) / math.log(max(m, 2))) + 3, 1
        )
        levels = np.minimum(levels.astype(np.int32), self.lmax)

        # Streaming upload (see _STREAM_MIN_BYTES): hold the corpus on
        # the host and write it into zero-initialized device buffers in
        # chunks, each dispatched just ahead of the build groups that
        # consume its rows, so the transfer rides behind compute. Group
        # programs only gather rows < start+size, and every masked read
        # of a not-yet-streamed row sees the same zeros the pad rows do.
        self._chunk_rows = 0
        self._uploaded_rows = cap_pad
        self._host_rows = None
        self._inflight: list = []
        device_input = _is_device_array(vectors)
        stream = (
            not device_input
            and os.environ.get("PGV_BUILD_STREAM", "1") != "0"
            and n * self.dim * 4 >= _STREAM_MIN_BYTES
        )
        if stream:
            # chunk ~ corpus/16 (floor 64MB): keeps the drain count — each
            # in-flight throttle drain costs a ~0.5s tunnel download — at
            # a handful regardless of corpus size
            tgt = max(_STREAM_CHUNK_BYTES, n * self.dim * 4 // 16)
            chunk = min(4096, cap_pad)
            while chunk * self.dim * 4 < tgt and chunk < cap_pad:
                chunk *= 2
            self._chunk_rows = min(chunk, cap_pad)
            self._uploaded_rows = 0
            self._host_rows = np.ascontiguousarray(vectors, dtype=np.float32)
            self._stream_bufs = _stream_init(cap_pad, self.dim)
            self.vectors = self._stream_bufs[0]
        elif device_input:
            # corpus already on device (e.g. produced by a TPU embedding
            # model): pad + derive views in one program, zero transfer
            _imark("pre-ingest")
            self._ingested = _ingest_device(vectors, rows=cap_pad)
            self.vectors = self._ingested[0]
            if consume_input:
                # the caller ceded ownership: free its corpus buffer as
                # soon as the padded copy exists, so the build's HBM
                # peak doesn't carry both (at 10M x 128-d the extra
                # 5.4GB f32 copy is the difference between fitting a
                # 16GB chip and OOM). Sync first — the tunneled backend
                # acks dispatches asynchronously and
                # jax.block_until_ready is a no-op through it, so drain
                # via a scalar readback.
                float(np.asarray(self._ingested[2][0]))
                vectors.delete()
            _imark("ingest-device")
        else:
            pad_rows = np.zeros((cap_pad - n, self.dim), dtype=np.float32)
            self.vectors = jnp.asarray(
                np.concatenate([vectors.astype(np.float32), pad_rows])
            )
        ups = np.nonzero(levels >= 1)[0]
        self.n_upper = len(ups)
        upper_pad = max(
            _next_pow2(self.n_upper + 1),
            int(os.environ.get("PGV_BUILD_UPPER_FLOOR", 0)),
        )
        self.upper_dump = upper_pad - 1  # dump slot for upper scatters
        # Upper slots are assigned in SHUFFLED order (fixed seed:
        # deterministic builds), not element order: committed elements
        # are always a prefix of the element ids, so element-ordered
        # slots would cluster the valid entries of every upper score
        # row into a prefix — which silently starves approx_min_k's
        # positional block reduction of candidates. Uniform spread makes
        # the approximate top-k statistically sound at any fill level.
        perm = np.random.default_rng(0xA953).permutation(
            max(self.n_upper, 1)
        )[: self.n_upper].astype(np.int32)
        _imark("perm")
        if device_input:
            (
                self.levels,
                self.upper_slot,
                up_ids_j,
                up_masks_j,
                up_vecs_dev,
                up_x2_dev,
            ) = _ingest_tables_device(
                self.vectors,
                jnp.asarray(levels.astype(np.int8)),
                jnp.asarray(perm),
                cap_pad=cap_pad,
                upper_pad=upper_pad,
                lmax=self.lmax,
            )
            _imark("ingest-tables")
        else:
            self.levels = jnp.asarray(
                np.concatenate(
                    [levels, np.full(cap_pad - n, -1, np.int32)]
                )
            )
            upper_slot = np.full(cap_pad, -1, dtype=np.int32)
            upper_slot[ups] = perm
            self.upper_slot = jnp.asarray(upper_slot)
            up_vecs = np.zeros((upper_pad, self.dim), np.float32)
            up_vecs[perm] = vectors.astype(np.float32)[ups]
            up_ids = np.full(upper_pad, self.cap, dtype=np.int32)
            up_ids[perm] = ups
            up_levels = np.full(upper_pad, -1, dtype=np.int32)
            up_levels[perm] = levels[ups]
            up_masks = (
                up_levels[None, :]
                >= np.arange(1, self.lmax + 1, dtype=np.int32)[:, None]
            )

        # pruning distances stored bf16 inside the combined arrays:
        # ranking-only state, and the f32 form is 2GB of HBM at 10M rows
        self.mp2 = (m + 1) // 2  # packed dist cols per upper layer
        _imark("host-tables")
        nb0c, upc, alive, tid_counts, absorb, members, member_counts = (
            _init_build_arrays(
                cap_pad, upper_pad, self.lm0, m, self.lmax, self.mp2,
                self.ivf, self.ivf_cap,
            )
        )
        self.arrays = BuildArrays(
            nb0c=nb0c,
            upc=upc,
            alive=alive,
            tid_counts=tid_counts,
            absorb=absorb,
            entry=jnp.int32(-1),
            entry_level=jnp.int32(-1),
            members=members,
            member_counts=member_counts,
        )
        _imark("init-combined")
        up_vecs_j = up_vecs_dev if device_input else jnp.asarray(up_vecs)
        # fused square+reduce: the eager form materializes a second
        # full-corpus f32 temp (5.4GB at 10M rows)
        _x2 = jax.jit(lambda v: jnp.sum(v * v, axis=1))
        if stream:
            vec_buf, bf_buf, x2_buf = self._stream_bufs
            del self._stream_bufs
        elif device_input:
            vec_buf, bf_buf, x2_buf = self._ingested
            del self._ingested
        else:
            vec_buf = self.vectors
            bf_buf = self.vectors.astype(jnp.bfloat16)
            x2_buf = _x2(self.vectors)
        # per-layer sub-tables for layers >= 2 (see BuildData.upper_sub):
        # ids/slots derive from the host levels array; rows gather on
        # device from the upper vector matrix (no row upload). Each
        # layer gets its own fixed-seed shuffle — same density argument
        # as the main table's shuffled slots.
        upper_sub = []
        up_levels_host = levels[ups] if self.n_upper else levels[:0]
        # PGV_BUILD_SUB_FLOORS: comma list of per-layer (lc=2..) pad
        # floors — lets bench warmup pin the sub-tables to a bigger
        # build's exact static shapes (see shape_floors_for)
        sub_floors = [
            int(x)
            for x in os.environ.get("PGV_BUILD_SUB_FLOORS", "").split(",")
            if x
        ]
        for lc in range(2, self.lmax + 1):
            sel = np.nonzero(up_levels_host >= lc)[0]  # indices into ups
            pad_l = max(128, _next_pow2(len(sel) + 1))
            if len(sub_floors) >= lc - 1:
                pad_l = max(pad_l, sub_floors[lc - 2])
            perm_l = np.random.default_rng(0xA953 + lc).permutation(
                max(len(sel), 1)
            )[: len(sel)].astype(np.int32)
            ids_l = np.full(pad_l, self.cap, dtype=np.int32)
            slots_l = np.full(pad_l, self.upper_dump, dtype=np.int32)
            if len(sel):
                ids_l[perm_l] = ups[sel]
                slots_l[perm_l] = perm[sel]  # slot of ups[i] is perm[i]
            v_l, x2_l = _gather_sub_table(up_vecs_j, jnp.asarray(slots_l))
            upper_sub.append((jnp.asarray(ids_l), v_l, x2_l))
        self.data = BuildData(
            vectors=vec_buf,
            vectors_bf16=bf_buf,
            x2=x2_buf,
            levels=self.levels,
            upper_slot=self.upper_slot,
            upper_vectors=up_vecs_j,
            upper_bf16=up_vecs_j.astype(jnp.bfloat16),
            upper_x2=up_x2_dev if device_input else _x2(up_vecs_j),
            upper_ids=up_ids_j if device_input else jnp.asarray(up_ids),
            upper_level_masks=(
                up_masks_j if device_input else jnp.asarray(up_masks)
            ),
            upper_sub=tuple(upper_sub),
        )
        _imark("build-data")
        self._search_jit = jax.jit(
            self._score_select_step, static_argnames=("width",)
        )
        self._fwd_jit = jax.jit(self._fwd_commit_step, donate_argnums=(1,))
        self._be0_jit = jax.jit(self._backedge0_step, donate_argnums=(1,))
        self._beu_jit = jax.jit(self._backedge_upper_compact, donate_argnums=(1,))
        self._commit_jit = jax.jit(self._commit_all_step, donate_argnums=(1,))
        self._init_members_jit = jax.jit(
            self._init_members_step, donate_argnums=(1,)
        )
        self._bucket_jit = jax.jit(
            self._bucket_program,
            static_argnames=("width",),
            donate_argnums=(1,),
        )

    # -- step 1: exact scoring + per-layer selection -------------------------

    def _score_all(self, data: BuildData, q_rows, vectors=None, x2=None):
        """Order distances from batch queries to EVERY row: [B, cap+1].

        The TPU-native replacement for per-element graph descent during
        build: one MXU matmul scores the batch against the whole corpus
        (the TPU-KNN formulation), so candidate generation is exact and
        there is no data-dependent traversal at all. Total build FLOPs
        are ~N^2*D/2 — minutes at 10M rows, milliseconds at 100k.
        """
        vectors = data.vectors if vectors is None else vectors
        x2 = data.x2 if x2 is None else x2
        n_rows = vectors.shape[0]
        if self.metric in ("l2", "ip", "cosine", "jacbits"):
            dots = jax.lax.dot_general(
                q_rows,
                vectors,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, n_rows]
            if self.metric in ("l2", "jacbits"):
                q2 = jnp.sum(q_rows * q_rows, axis=1, keepdims=True)
                h = jnp.maximum(q2 + x2[None, :] - 2.0 * dots, 0.0)
                if self.metric == "jacbits":
                    return _l2_to_jaccard(h, q2, x2[None, :])
                return h
            if self.metric == "ip":
                return -dots
            return 1.0 - jnp.clip(dots, -1.0, 1.0)
        # l1: chunked VPU sweep (no matmul identity exists)
        CH = 8192

        def chunk(x_chunk):
            return jnp.sum(
                jnp.abs(q_rows[:, None, :] - x_chunk[None, :, :]), axis=-1
            )  # [B, CH]

        pad = (-n_rows) % CH
        xp = jnp.pad(vectors, ((0, pad), (0, 0)))
        parts = jax.lax.map(chunk, xp.reshape(-1, CH, self.dim))
        return jnp.moveaxis(parts, 0, 1).reshape(q_rows.shape[0], -1)[
            :, :n_rows
        ]

    def _upper_order_scores(self, data: BuildData, q_chunk, a_col):
        """[Bq, width_u] ORDER scores over the upper table — the serving
        engines' sweep recipe (graph/device._exact_scores): bf16 matmul
        with f32 accumulation, dead columns excluded by an inf fold in
        the per-column term `a_col` (l2: x2+pen, others: pen alone), and
        per-query constants (q2, the cosine 1- offset) omitted — scores
        are monotone in true distance per query, NOT the distance;
        callers must exact-rescore the selected columns. The old f32
        _score_all + full-width where-mask pass was ~4x the HBM/MXU
        cost and was the dominant upper_pad-scaled per-batch cost at
        the 10M shape (probe 2026-08-19)."""
        if self.metric == "l1":
            return (
                self._score_all(
                    data, q_chunk, data.upper_vectors, data.upper_x2
                )
                + a_col[None, :]
            )
        dots = jax.lax.dot_general(
            q_chunk.astype(jnp.bfloat16),
            data.upper_bf16,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if self.metric == "l2":
            return a_col[None, :] - 2.0 * dots
        if self.metric == "jacbits":
            # the jaccard transform needs true h per column, so the
            # penalty cannot ride the x2 term (inf/inf = NaN); bf16
            # dots are exact here (popcount-scale integers), the
            # epilogue adds the penalty after the transform
            q2 = jnp.sum(q_chunk * q_chunk, axis=1, keepdims=True)
            h = jnp.maximum(q2 + data.upper_x2[None, :] - 2.0 * dots, 0.0)
            return (
                _l2_to_jaccard(h, q2, data.upper_x2[None, :])
                + a_col[None, :]
            )
        return a_col[None, :] - dots  # ip / cosine (rows unit-normed)

    def _dist_point_rows(self, q_rows, rows):
        """True f32 distances q_rows [B, D] -> rows [B, K, D]: the exact
        rescore for order-score pools (direct differences — no matmul-
        identity cancellation error)."""
        if self.metric in ("l2", "jacbits"):
            dlt = rows - q_rows[:, None, :]
            h = jnp.sum(dlt * dlt, axis=-1)
            if self.metric == "jacbits":
                return _l2_to_jaccard(
                    h,
                    jnp.sum(q_rows, axis=1, keepdims=True),
                    jnp.sum(rows, axis=-1),
                )
            return h
        if self.metric == "l1":
            return jnp.sum(jnp.abs(rows - q_rows[:, None, :]), axis=-1)
        dots = jnp.sum(rows * q_rows[:, None, :], axis=-1)
        if self.metric == "ip":
            return -dots
        return 1.0 - jnp.clip(dots, -1.0, 1.0)

    def _candidates_to_selection(self, data, cand_d, cand_idx,
                                 alpha: float | None = None):
        """Alg. 4 selection over sorted candidates; pads to lm0 width."""
        cand_idx = jnp.where(jnp.isfinite(cand_d), cand_idx, -1)
        rows16 = data.vectors_bf16 if self.metric != "l1" else data.vectors
        cand_rows = rows16[jnp.clip(cand_idx, 0, self.cap)]
        pair = _pair_matrix(self.metric, cand_rows)
        pair = jnp.where(
            (cand_idx[:, None, :] < 0) | (cand_idx[:, :, None] < 0),
            jnp.inf,
            pair,
        )
        sd, sids = _select_neighbors_parallel(
            cand_d, cand_idx, pair, self.lm0,
            self.alpha_eff if alpha is None else alpha,
        )
        pad = self.lm0 - sd.shape[1]
        if pad > 0:  # tiny corpus: fewer candidates than lm0
            sd = jnp.pad(sd, ((0, 0), (0, pad)), constant_values=jnp.inf)
            sids = jnp.pad(sids, ((0, 0), (0, pad)), constant_values=-1)
        return sd, sids

    def _beam_ground_candidates(
        self, data: BuildData, nb0c, alive, entry, q_rows, seed_d,
        seed_ids, steps: int, expand: int, dedup: bool = True,
        merge: str = "sort",
    ):
        """Ground-layer candidate generation by batched beam descent.

        The classic HNSW construction search (graph/mod.rs:355-427's
        layer-0 ef_construction pass) restructured as fixed-trip
        tensor ops over the as-built adjacency: per query keep an
        efc-wide beam; each step expands the `expand` best unexpanded
        members, gathers their ground neighbors, scores them (bf16
        rows, f32 accumulate), and merges by a pair of sorts (dedup by
        id keeps the expanded copy so beam-resident nodes are never
        re-expanded). Seeded with the nearest committed upper-layer
        elements (from the exact compact upper sweep — where the greedy
        upper descent would land) plus the entry point.

        Returns (cand_d, cand_ids) [B, efc] sorted nearest first.
        """
        W = self.efc
        cap = self.cap

        def dist_to(q, rows_f32):
            if self.metric in ("l2", "jacbits"):
                dlt = rows_f32 - q
                h = jnp.sum(dlt * dlt, axis=-1)
                if self.metric == "jacbits":
                    # {0,1} rows: popcount == sum (exact in f32/bf16)
                    return _l2_to_jaccard(
                        h, jnp.sum(q), jnp.sum(rows_f32, axis=-1)
                    )
                return h
            if self.metric == "l1":
                return jnp.sum(jnp.abs(rows_f32 - q), axis=-1)
            dots = jnp.sum(rows_f32 * q, axis=-1)
            if self.metric == "ip":
                return -dots
            return 1.0 - jnp.clip(dots, -1.0, 1.0)

        def one(q, s_d, s_ids):
            # Beam entries carry a packed key = id*2 + (1-expanded):
            # one int32 instead of separate id and expanded arrays, so
            # every merge sort is 2 arrays instead of 3 (the per-step
            # sorts are the descent build's measured hot spot), and the
            # key's natural order (by id, expanded copy first) IS the
            # dedup order. Invalid slots use -2 (id -1, "expanded").
            S = s_ids.shape[0]
            e_row = data.vectors[jnp.clip(entry, 0, cap)]
            e_d = dist_to(q, e_row)
            init_key = jnp.full((W,), -2, jnp.int32)
            init_d = jnp.full((W,), jnp.inf, jnp.float32)
            seed_ids_all = jnp.concatenate([s_ids, entry[None]])
            init_key = init_key.at[: S + 1].set(
                jnp.where(seed_ids_all >= 0, seed_ids_all * 2 + 1, -2)
            )
            init_d = init_d.at[:S].set(s_d).at[S].set(e_d)

            if merge == "rank":
                # Rank-merge: keep the beam SORTED by distance as a loop
                # invariant and fold each step's E*lm0 new candidates in
                # by pairwise-comparison ranking — small [E, W]/[E, E]
                # compare+reduce matrices on the VPU — instead of two
                # full [W+E*lm0]-wide lax.sorts (the measured per-step
                # hot spot). Tie policy: beam entries precede new ones
                # at equal distance, beam order by position, new order
                # by (distance, index) — a strict total order, so ranks
                # are a collision-free permutation and the scatter
                # rebuilds a sorted beam directly.
                ent_dup = jnp.any(s_ids == entry)
                init_d = init_d.at[S].set(
                    jnp.where(ent_dup, jnp.inf, e_d)
                )
                init_key = init_key.at[S].set(
                    jnp.where(ent_dup, -2, entry * 2 + 1)
                )
                init_d, init_key = jax.lax.sort(
                    [init_d, init_key], num_keys=1
                )
                iota_w = jnp.arange(W, dtype=jnp.int32)

                def body_rank(_, st):
                    bd, bkey = st
                    unexp = jnp.where(
                        (bkey >= 0) & (bkey & 1 == 1), bd, jnp.inf
                    )
                    _, pos = jax.lax.top_k(-unexp, expand)
                    sel_ok = jnp.isfinite(unexp[pos])
                    bkey2 = bkey.at[pos].set(
                        jnp.where(sel_ok, bkey[pos] & ~1, bkey[pos])
                    )
                    u = jnp.where(sel_ok, bkey2[pos] >> 1, -1)
                    nbrs = nb0c[jnp.clip(u, 0, cap)][:, : self.lm0]
                    nbrs = jnp.where(
                        (u >= 0)[:, None], nbrs, -1
                    ).reshape(-1)
                    safe = jnp.clip(nbrs, 0, cap)
                    ok = (nbrs >= 0) & alive[safe]
                    rows = data.vectors_bf16[safe].astype(jnp.float32)
                    d_new = jnp.where(ok, dist_to(q, rows), jnp.inf)
                    key_new = jnp.where(ok, nbrs * 2 + 1, -2)
                    E = key_new.shape[0]
                    idx_e = jnp.arange(E, dtype=jnp.int32)
                    ids_new = key_new >> 1
                    ids_beam = bkey2 >> 1
                    # dedup: a new candidate whose id is already in the
                    # beam (either parity — the resident copy wins, the
                    # lax.sort path's key order gives the same outcome)
                    # or earlier in this step's batch goes to +inf
                    dup_beam = jnp.any(
                        (ids_new[:, None] == ids_beam[None, :])
                        & (bkey2[None, :] >= 0),
                        axis=1,
                    )
                    dup_new = jnp.any(
                        (ids_new[None, :] == ids_new[:, None])
                        & (key_new[None, :] >= 0)
                        & (idx_e[None, :] < idx_e[:, None]),
                        axis=1,
                    )
                    d_new = jnp.where(dup_beam | dup_new, jnp.inf, d_new)
                    # ranks in the merged order (beam wins distance ties)
                    rank_beam = iota_w + jnp.sum(
                        d_new[:, None] < bd[None, :], axis=0
                    )
                    le_beam = jnp.sum(
                        bd[None, :] <= d_new[:, None], axis=1
                    )
                    lt_new = (d_new[None, :] < d_new[:, None]) | (
                        (d_new[None, :] == d_new[:, None])
                        & (idx_e[None, :] < idx_e[:, None])
                    )
                    rank_new = le_beam + jnp.sum(lt_new, axis=1)
                    pos_b = jnp.minimum(rank_beam, W)
                    pos_n = jnp.minimum(rank_new, W)
                    sd = (
                        jnp.full((W + 1,), jnp.inf, jnp.float32)
                        .at[pos_b].set(bd)
                        .at[pos_n].set(d_new)
                    )
                    sk = (
                        jnp.full((W + 1,), -2, jnp.int32)
                        .at[pos_b].set(bkey2)
                        .at[pos_n].set(key_new)
                    )
                    return sd[:W], sk[:W]

                bd, bkey = jax.lax.fori_loop(
                    0, steps, body_rank, (init_d, init_key)
                )
                bids = jnp.where(
                    jnp.isfinite(bd) & (bkey >= 0), bkey >> 1, -1
                )
                return bd, bids

            def body(_, st):
                bd, bkey = st
                unexp = jnp.where(
                    (bkey >= 0) & (bkey & 1 == 1), bd, jnp.inf
                )
                _, pos = jax.lax.top_k(-unexp, expand)
                sel_ok = jnp.isfinite(unexp[pos])
                # mark selected entries expanded (clear the low bit)
                bkey = bkey.at[pos].set(
                    jnp.where(sel_ok, bkey[pos] & ~1, bkey[pos])
                )
                u = jnp.where(sel_ok, bkey[pos] >> 1, -1)
                # gather combined rows, use the id prefix (the extra
                # packed-dist cols are m int32s on a tiny [E, 3m] gather)
                nbrs = nb0c[jnp.clip(u, 0, cap)][:, : self.lm0]  # [E, lm0]
                nbrs = jnp.where((u >= 0)[:, None], nbrs, -1).reshape(-1)
                safe = jnp.clip(nbrs, 0, cap)
                ok = (nbrs >= 0) & alive[safe]
                rows = data.vectors_bf16[safe].astype(jnp.float32)
                d_new = jnp.where(ok, dist_to(q, rows), jnp.inf)
                key_new = jnp.where(ok, nbrs * 2 + 1, -2)

                all_key = jnp.concatenate([bkey, key_new])
                all_d = jnp.concatenate([bd, d_new])
                if dedup:
                    # dedup by id, preferring the expanded copy (so nodes
                    # already expanded in-beam are never re-expanded)
                    o_key, o_d = jax.lax.sort(
                        [all_key, all_d], num_keys=1
                    )
                    dup = jnp.concatenate(
                        [jnp.zeros((1,), bool),
                         (o_key[1:] >> 1) == (o_key[:-1] >> 1)]
                    )
                    o_d = jnp.where(dup | (o_key < 0), jnp.inf, o_d)
                    sd, skey = jax.lax.sort([o_d, o_key], num_keys=1)
                else:
                    # no-dedup merge: one distance sort. A node can sit
                    # in the beam twice (its unexpanded copy may be
                    # re-expanded — bounded wasted work); the expansion
                    # top_k's unexp masking still drives the walk
                    # forward, and duplicate final candidates collapse
                    # in Alg-4 selection (pair distance 0 prunes the
                    # copy). Recall parity is bench-verified.
                    sd, skey = jax.lax.sort([all_d, all_key], num_keys=1)
                return sd[:W], skey[:W]

            bd, bkey = jax.lax.fori_loop(
                0, steps, body, (init_d, init_key)
            )
            if not dedup:
                # one final dedup instead of per-step: duplicate ids
                # must not reach Alg-4 selection (a zero-distance copy
                # would survive via backfill and waste an edge slot)
                o_key, o_d = jax.lax.sort([bkey, bd], num_keys=1)
                dup = jnp.concatenate(
                    [jnp.zeros((1,), bool),
                     (o_key[1:] >> 1) == (o_key[:-1] >> 1)]
                )
                o_d = jnp.where(dup | (o_key < 0), jnp.inf, o_d)
                bd, bkey = jax.lax.sort([o_d, o_key], num_keys=1)
            bids = jnp.where(
                jnp.isfinite(bd) & (bkey >= 0), bkey >> 1, -1
            )
            return bd, bids

        return jax.vmap(one)(q_rows, seed_d, seed_ids)

    def _score_select_step(
        self, data: BuildData, arrays: BuildArrays, start, size, width: int
    ):
        """Top-ef_construction candidate generation + Alg. 4 selection
        for all layers.

        ``count``: elements inserted before this batch (traced scalar) —
        only rows < count that are alive (not duplicate-folded) are
        candidates. ``width`` (STATIC, power-of-two bucket >= count)
        bounds the scored prefix: committed elements always occupy a
        prefix of the arrays, so scoring the full capacity would (a)
        waste FLOPs and (b) break approx_min_k, whose positional block
        reduction loses almost all candidates when the valid entries
        cluster in a small prefix of a much wider row (this silently
        wrecked graph quality at the million-row scale). Within the
        bucket, valid entries span the row, so the approximate top-k's
        recall target holds.

        Ground-layer candidates come from the exact MXU sweep below
        _DESCENT_MIN_WIDTH (approx_min_k above _APPROX_TOPK_MIN rows)
        and from batched beam descent over the as-built graph above it
        (see _beam_ground_candidates) — the exact sweep is quadratic in
        N, the descent is the reference's own construction search
        (graph/mod.rs:355-427) and supplies path-diverse candidates.
        Upper layers always score against the compact upper matrix
        (the ~N/m rows with level >= 1), mirroring the descent's
        reachability rule. Selection always runs at lm0 width; the
        first-m prefix equals the lm=m selection (the Alg. 4 keep
        sequence is prefix-stable in lm), so upper layers just
        truncate.

        Returns (sel_d, sel_ids [B, LMAX+1, lm0] (layer 0 = ground),
        assign [B] — nearest committed upper cell for the IVF member
        table, upper_dump outside the descent regime).
        """
        alive = arrays.alive
        B = self.batch_max
        iota_b = jnp.arange(B, dtype=jnp.int32)
        batch_mask = iota_b < size
        new_ids = jnp.where(batch_mask, start + iota_b, self.cap)
        count = start
        safe_ids = jnp.clip(new_ids, 0, self.cap)
        q_rows = data.vectors[safe_ids]  # [B, D]
        my_level = data.levels[safe_ids]  # [B]

        # ---- upper-row validity (shared by descent seeds and the
        # upper-layer selection): level>=1 rows, committed and alive.
        # NOTE: no [B, upper_pad] score matrix is ever materialized —
        # at 10M rows upper_pad is ~1M and that buffer alone is 4GB
        # (it OOM'd the build); seeds compute in query chunks and the
        # per-layer selection scores only the compacted rows.
        width_u = data.upper_vectors.shape[0]
        u_ids = data.upper_ids
        u_colmask = (u_ids < count) & alive[jnp.clip(u_ids, 0, self.cap)]
        kku = min(self.efc, width_u)

        # stratified upper candidate pool (experimental, default OFF —
        # measured to hurt at 1M together with alpha_upper): the kku
        # nearest PLUS a strided sample of the next ~3*kku ranks.
        stratify = int(os.environ.get("PGV_BUILD_UPPER_STRATIFY", 0))
        pool = min(4 * kku, width_u) if stratify else kku
        extra = min(kku // 2, pool - kku) if pool > kku else 0

        # Compact the batch rows that have upper layers at all (P(level
        # >= 1) = 1/m): per-layer selection runs on ~B*4/m rows instead
        # of B. Overflow beyond the 4x-margin budget silently drops that
        # row's upper selection (degraded edges, not corruption);
        # P(overflow) is astronomically small.
        RU2 = min(B, max(B * 4 // max(self.m, 1), 32))
        has_up = (my_level >= 1) & batch_mask
        order_u = jnp.argsort(~has_up)[:RU2]  # stable: active rows first

        # dead-column fold for the upper order-score sweeps (serving
        # recipe — see _upper_order_scores)
        u_pen = jnp.where(u_colmask, 0.0, jnp.inf)
        a_col = data.upper_x2 + u_pen if self.metric == "l2" else u_pen

        # ---- layer 0 candidates
        if width != 0:
            # exact sweep over the committed prefix bucket, in query
            # chunks so the [chunk, width] score matrix stays bounded
            # regardless of batch size (invalid batch rows produce junk
            # candidates that the act/alive masks downstream discard)
            kk = min(self.efc, width)
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
            col_valid = (pos < count) & alive[None, :width]
            # single-program ramp: exact top_k at every commit count
            # (measured +28ms over the bare sweep at [1024, 131072] —
            # cheap, and immune to the low-density candidate starvation
            # that ruled approx_min_k out for contiguous-prefix
            # validity). The bucketed A/B path keeps the old policy:
            # approx_min_k above _APPROX_TOPK_MIN, where the doubling
            # invariant count >= width/2 keeps its block reduction fed.
            use_approx = (
                os.environ.get("PGV_BUILD_RAMP") == "buckets"
                and width >= _APPROX_TOPK_MIN
            )

            def score_chunk(q_chunk):
                scores = self._score_all(
                    data, q_chunk, data.vectors[:width], data.x2[:width]
                )
                scores = jnp.where(col_valid, scores, jnp.inf)
                if use_approx:
                    d, i = jax.lax.approx_min_k(
                        scores, kk, recall_target=0.98
                    )
                else:
                    neg, i = jax.lax.top_k(-scores, kk)
                    d = -neg
                return d, i

            CHQ = min(1024, B)
            if B % CHQ == 0 and B > CHQ:
                cd_c, ci_c = jax.lax.map(
                    score_chunk, q_rows.reshape(-1, CHQ, self.dim)
                )
                cand_d = cd_c.reshape(B, kk)
                cand_idx = ci_c.reshape(B, kk)
            else:
                cand_d, cand_idx = score_chunk(q_rows)
            assign = jnp.full((B,), self.upper_dump, dtype=jnp.int32)
        else:
            # descent regime (width sentinel 0 — ONE program serves all
            # batch positions past the exact floor). Seeds: the nearest
            # committed upper rows (one exact bf16 sweep over the
            # compact upper matrix). S + 1 (entry) must fit the
            # efc-wide beam; the IVF generator probes `ivf_probes`
            # cells, so take the max.
            S = min(16, width_u - 1, max(self.efc - 1, 1))
            SP = max(S, self.ivf_probes) if self.ivf else S
            SP = min(SP, width_u)
            # MERGED upper scan: ONE pass over the [*, width_u] table
            # yields both the descent seeds (first SP cols, all rows)
            # and the layer-1 candidate pool (first `pool` cols of the
            # level>=1 rows). Previously seeds and layer-1 candidates
            # each ran their own full-width f32 score+mask+select pass
            # — the dominant upper_pad-scaled per-batch cost at the
            # 10M shape (probe 2026-08-19). The sweep itself is the
            # serving recipe: bf16 order scores with the mask folded
            # into the per-column term, then an exact f32 rescore of
            # the KK winners (inf sentinels pass through).
            KK = min(max(SP, pool), width_u)

            def seed_chunk(q_chunk):
                sc = self._upper_order_scores(data, q_chunk, a_col)
                # exact top_k over a 64k-wide row costs several ms;
                # pools only need to land in the right region (the
                # shuffled upper-slot assignment keeps approx_min_k's
                # positional reduction statistically sound)
                if width_u >= _APPROX_TOPK_MIN:
                    d, slots = jax.lax.approx_min_k(
                        sc, KK, recall_target=0.98
                    )
                    return d, slots
                neg, slots = jax.lax.top_k(-sc, KK)
                return -neg, slots

            # trace-time knob (env-toggle trap applies): the [CQ,
            # width_u] f32 score transient is 1 GB at CQ=256 over the
            # 10M shape's 1M-wide table; larger CQ amortizes
            # approx_min_k fixed cost per chunk against a bigger
            # transient
            CQ = int(os.environ.get("PGV_BUILD_SEED_CQ", 0)) or (
                256 if (B % 256 == 0 and width_u > (1 << 17)) else B
            )
            if not (0 < CQ <= B and B % CQ == 0):
                if os.environ.get("PGV_BUILD_SEED_CQ"):
                    warnings.warn(
                        f"PGV_BUILD_SEED_CQ={CQ} is not a positive "
                        f"divisor of batch width {B}; using {B}"
                    )
                CQ = B
            if CQ < B:
                sd_c, sl_c = jax.lax.map(
                    seed_chunk, q_rows.reshape(-1, CQ, self.dim)
                )
                ord_all = sd_c.reshape(B, KK)
                slots_all = sl_c.reshape(B, KK)
            else:
                ord_all, slots_all = seed_chunk(q_rows)
            # exact f32 rescore + re-sort (order scores rank well but
            # Alg-4 selection and the beam need true distance VALUES,
            # sorted ascending)
            sel_rows = data.upper_vectors[slots_all]  # [B, KK, D]
            d_exact = self._dist_point_rows(q_rows, sel_rows)
            d_exact = jnp.where(jnp.isfinite(ord_all), d_exact, jnp.inf)
            d_all, slots_all = jax.lax.sort(
                [d_exact, slots_all], num_keys=1
            )
            seed_sc = d_all[:, :SP]
            seed_slots = slots_all[:, :SP]
            if self.ivf:
                cand_d, cand_idx = self._ivf_ground_candidates(
                    data, arrays, q_rows, seed_sc, seed_slots
                )
            else:
                seed_ids = jnp.where(
                    jnp.isfinite(seed_sc[:, :S]),
                    u_ids[seed_slots[:, :S]],
                    -1,
                )
                seed_d = jnp.where(
                    jnp.isfinite(seed_sc[:, :S]), seed_sc[:, :S], jnp.inf
                )
                # measured at 1M (bench 2026-08-17): 16 steps holds the
                # 20/28/40/64-step beam recall (0.9841 vs 0.9842 at
                # ef=40) at 10.7k vec/s steady; 14 steps drops recall
                # to 0.9830. The upper-sweep seeds land near-optimal,
                # so the remaining walk length barely grows with N:
                # at the 10.5M-cap shape, 16 steps holds candidate
                # recall@16 within 0.0007 of 19 steps while saving
                # ~11ms/batch (probe_beam 2026-08-19; r4 arm A/B
                # confirmed +2.8% steady at the 10M shape, DESIGN 6i)
                # — so the count is CLAMPED at 16 rather than growing
                # with log2(cap).
                steps = int(
                    os.environ.get("PGV_BUILD_BEAM_STEPS", 0)
                ) or 16
                expand = int(os.environ.get("PGV_BUILD_BEAM_EXPAND", 4))
                dedup = os.environ.get("PGV_BUILD_BEAM_DEDUP", "1") != "0"
                # NOTE: like steps/expand/dedup above, merge is read at
                # TRACE time inside the jitted build path — toggling it
                # same-process without jax.clear_caches() reuses the
                # first arm's cached program (CLAUDE.md env-toggle trap).
                merge = os.environ.get("PGV_BUILD_BEAM_MERGE", "sort")
                if merge not in ("sort", "rank"):
                    raise ValueError(
                        f"PGV_BUILD_BEAM_MERGE={merge!r}: must be 'sort' "
                        "or 'rank'"
                    )
                if merge == "rank" and not dedup:
                    # the rank merge's pairwise ranking is only a
                    # permutation under per-step dedup; honor the knob
                    # loudly instead of silently measuring the wrong arm
                    raise ValueError(
                        "PGV_BUILD_BEAM_DEDUP=0 is incompatible with "
                        "PGV_BUILD_BEAM_MERGE=rank (rank always dedups)"
                    )
                cand_d, cand_idx = self._beam_ground_candidates(
                    data, arrays.nb0c, alive, arrays.entry, q_rows,
                    seed_d, seed_ids, steps, expand, dedup, merge,
                )
            # membership assignment for the IVF table: nearest committed
            # upper cell (upper_dump = none/invalid)
            assign = jnp.where(
                jnp.isfinite(seed_sc[:, 0]),
                seed_slots[:, 0],
                self.upper_dump,
            )
        sel0_d, sel0_ids = self._candidates_to_selection(data, cand_d, cand_idx)

        cvalid = has_up[order_u]
        if width != 0:
            # ramp arm: no merged scan ran — the layer-1 pool gets its
            # own order-score pass over the upper table (compacted
            # rows only), then the same exact rescore as the descent
            # arm's merged scan
            u_scores_c = self._upper_order_scores(
                data, q_rows[order_u], a_col
            )  # [RU2, width_u]
            if width_u >= _APPROX_TOPK_MIN:
                o_p1, slot_p1 = jax.lax.approx_min_k(
                    u_scores_c, pool, recall_target=0.98
                )
            else:
                neg_d1, slot_p1 = jax.lax.top_k(-u_scores_c, pool)
                o_p1 = -neg_d1
            r_rows = data.upper_vectors[slot_p1]  # [RU2, pool, D]
            r_d = self._dist_point_rows(q_rows[order_u], r_rows)
            r_d = jnp.where(jnp.isfinite(o_p1), r_d, jnp.inf)
            d_p1, slot_p1 = jax.lax.sort([r_d, slot_p1], num_keys=1)
        else:
            # descent arm: the layer-1 pool is the merged scan's rows
            # for the level>=1 batch rows (junk pools on non-cvalid
            # rows scatter to the dump row downstream)
            d_p1 = d_all[order_u][:, :pool]
            slot_p1 = slots_all[order_u][:, :pool]

        def pool_to_selection(d_p, slot_p, ids_table):
            if extra > 0 and d_p.shape[1] > kku:
                stride = max((d_p.shape[1] - kku) // extra, 1)
                take = np.concatenate(
                    [
                        np.arange(kku),
                        kku + stride * np.arange(extra),
                    ]
                ).astype(np.int32)
                take = np.minimum(take, d_p.shape[1] - 1)
                d_l = d_p[:, take]
                slot_idx = slot_p[:, take]
            else:
                d_l, slot_idx = d_p, slot_p
            c_idx = ids_table[slot_idx]
            return self._candidates_to_selection(
                data, d_l, c_idx, alpha=self.alpha_upper
            )

        # layer 1: pool over the full upper table (every level>=1
        # element is a candidate) — from the merged scan in the descent
        # arm, its own pass in the ramp arm. Layers >= 2 score their
        # OWN narrow sub-tables (data.upper_sub) — the old LMAX
        # full-width masked passes re-read the [RU2, width_u] score
        # matrix per layer and were the dominant per-batch cost at 10M
        # (probe 2026-08-19).
        sel_layers = [pool_to_selection(d_p1, slot_p1, u_ids)]

        for lc in range(2, self.lmax + 1):
            ids_l, v_l, x2_l = data.upper_sub[lc - 2]
            P_l = ids_l.shape[0]
            s_l = self._score_all(data, q_rows[order_u], v_l, x2_l)
            colmask_l = (ids_l < count) & alive[jnp.clip(ids_l, 0, self.cap)]
            s_l = jnp.where(
                colmask_l[None, :] & cvalid[:, None], s_l, jnp.inf
            )
            kk_l = min(kku, P_l)
            if P_l >= _APPROX_TOPK_MIN:
                d_pl, slot_pl = jax.lax.approx_min_k(
                    s_l, kk_l, recall_target=0.98
                )
            else:
                neg_dl, slot_pl = jax.lax.top_k(-s_l, kk_l)
                d_pl = -neg_dl
            sel_layers.append(pool_to_selection(d_pl, slot_pl, ids_l))

        selu_d_c = jnp.stack([d for d, _ in sel_layers])  # [LMAX, RU2, lm0]
        selu_ids_c = jnp.stack([i for _, i in sel_layers])

        # scatter compacted upper selections back to batch rows
        scat = jnp.where(cvalid, order_u, B)
        selu_d = (
            jnp.full((B + 1, self.lmax, self.lm0), jnp.inf)
            .at[scat]
            .set(jnp.moveaxis(selu_d_c, 0, 1))[:B]
        )
        selu_ids = (
            jnp.full((B + 1, self.lmax, self.lm0), -1, dtype=jnp.int32)
            .at[scat]
            .set(jnp.moveaxis(selu_ids_c, 0, 1))[:B]
        )

        sel_d = jnp.concatenate([sel0_d[:, None], selu_d], 1)
        sel_ids = jnp.concatenate([sel0_ids[:, None], selu_ids], 1)

        # mask layers above the element's own level; truncate upper
        # layers to their m slots
        layer_iota = jnp.arange(self.lmax + 1, dtype=jnp.int32)
        slot_iota = jnp.arange(self.lm0, dtype=jnp.int32)
        act = batch_mask[:, None, None] & (
            my_level[:, None, None] >= layer_iota[None, :, None]
        )
        width_ok = (layer_iota[None, :, None] == 0) | (
            slot_iota[None, None, :] < self.m
        )
        keep = act & width_ok
        sel_d = jnp.where(keep, sel_d, jnp.inf)
        sel_ids = jnp.where(keep, sel_ids, -1)
        return sel_d, sel_ids, assign

    def _ivf_ground_candidates(self, data: BuildData, arrays: BuildArrays,
                               q_rows, seed_sc, seed_slots):
        """Ground candidates from the member table: gather the members
        of the `ivf_probes` nearest committed upper cells and score
        them exactly — all MXU/VPU work, no serial graph walk (the
        TPU-first alternative to beam descent; a center is always a
        member of its own cell, so probed centers self-include).

        Returns (cand_d, cand_ids) [B, efc] sorted nearest first.
        """
        B = q_rows.shape[0]
        P = min(self.ivf_probes, seed_slots.shape[1])
        cap = self.cap
        n_slots = arrays.members.shape[0]
        lm0 = self.lm0

        def score_ids(q_c, ids):
            """Exact distances of q_c [CQ, D] to element ids [CQ, W]
            (-1 = pad -> inf)."""
            safe = jnp.clip(ids, 0, cap)
            ok = ids >= 0
            rows = data.vectors_bf16[safe]  # [CQ, W, D]
            if self.metric in ("l2", "ip", "cosine"):
                dots = jnp.einsum(
                    "bwd,bd->bw", rows, q_c.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                if self.metric == "l2":
                    q2 = jnp.sum(q_c * q_c, axis=1, keepdims=True)
                    d = jnp.maximum(q2 + data.x2[safe] - 2.0 * dots, 0.0)
                elif self.metric == "ip":
                    d = -dots
                else:
                    d = 1.0 - jnp.clip(dots, -1.0, 1.0)
            else:  # l1
                d = jnp.sum(
                    jnp.abs(rows.astype(jnp.float32) - q_c[:, None, :]),
                    axis=-1,
                )
            return jnp.where(ok, d, jnp.inf)

        def chunk(args):
            q_c, sl_c, sc_c = args  # [CQ, D], [CQ, P], [CQ, P]
            mem = arrays.members[jnp.clip(sl_c, 0, n_slots - 1)]
            mem = jnp.where(
                jnp.isfinite(sc_c)[:, :, None], mem, -1
            ).reshape(q_c.shape[0], -1)  # [CQ, P*CAP]
            d = score_ids(q_c, mem)
            kk = min(self.efc, d.shape[1])
            neg, pos = jax.lax.top_k(-d, kk)
            cd, cids = -neg, jnp.take_along_axis(mem, pos, axis=1)
            hop = min(self.ivf_hop, kk)
            if hop:
                # one-hop: score the layer-0 neighbors of `hop` member
                # candidates (edges of earlier inserts bridge cells the
                # probe set missed). stride > 1 spreads the hop sources
                # across the candidate ranking instead of taking the
                # nearest block — their neighbor lists overlap less
                stride = max(
                    1, int(os.environ.get("PGV_BUILD_IVF_HOP_STRIDE", 1))
                )
                if stride > 1 and hop * stride <= kk:
                    src = cids[:, : hop * stride : stride]
                else:
                    src = cids[:, :hop]  # [CQ, E], sorted nearest-first
                nb = arrays.nb0c[jnp.clip(src, 0, cap)][:, :, :lm0]
                hids = jnp.where(
                    (src >= 0)[:, :, None], nb, -1
                ).reshape(q_c.shape[0], -1)  # [CQ, E*lm0]
                hd = score_ids(q_c, hids)
                all_d = jnp.concatenate([cd, hd], axis=1)
                all_i = jnp.concatenate([cids, hids], axis=1)
                # dedup (hop ids repeat members and each other): group
                # by id, inf out repeats, then rank by distance
                si, sd = jax.lax.sort([all_i, all_d], num_keys=1)
                dup = jnp.concatenate(
                    [
                        jnp.zeros((si.shape[0], 1), bool),
                        si[:, 1:] == si[:, :-1],
                    ],
                    axis=1,
                )
                sd = jnp.where(dup | (si < 0), jnp.inf, sd)
                sd, si = jax.lax.sort([sd, si], num_keys=1)
                cd, cids = sd[:, :kk], si[:, :kk]
                cids = jnp.where(jnp.isfinite(cd), cids, -1)
            return cd, cids

        CQ = 256 if B % 256 == 0 and B > 256 else B
        if CQ < B:
            cd, ci = jax.lax.map(
                chunk,
                (
                    q_rows.reshape(-1, CQ, self.dim),
                    seed_slots[:, :P].reshape(-1, CQ, P),
                    seed_sc[:, :P].reshape(-1, CQ, P),
                ),
            )
            kk = cd.shape[-1]
            return cd.reshape(B, kk), ci.reshape(B, kk)
        return chunk((q_rows, seed_slots[:, :P], seed_sc[:, :P]))

    # -- step 2: commit (three small programs) -------------------------------

    def _fwd_commit_step(self, data: BuildData, arrays: BuildArrays, start, size,
                         sel_d, sel_ids, assign=None):
        """On-device duplicate folding + forward edges + entry promotion.

        Duplicate folding (build.rs:474-510 semantics) runs entirely on
        device so no per-batch host round-trip is needed (the tunnel's
        ~40ms transfer latency would dominate the build otherwise): an
        element whose nearest selected ground neighbor is zero-distance
        and value-equal folds its TID into that element, capped at 10
        TIDs per element (HNSW_HEAPTIDS); fold decisions within one
        batch are serialized per target via a rank-in-group pass. The
        absorb map and tid counts live in BuildArrays; bulk_build
        downloads them once after the last batch to fix up the host
        TID table. (Equality is f32 value equality, not raw bytes: NaN
        is rejected at input and the +0/-0 distinction is not
        load-bearing.)
        """
        dump = self.cap
        B = self.batch_max
        iota_b = jnp.arange(B, dtype=jnp.int32)
        mask = iota_b < size
        new_ids = jnp.where(mask, start + iota_b, dump)

        # ---- duplicate folding
        # The reference folds candidates that are zero-distance AND
        # byte-equal (build.rs:474-510). For l2/cosine/l1, byte-equal
        # <=> exact distance 0, so the byte comparison alone is the
        # reference rule stated robustly (the scored sel_d can be a
        # rounding epsilon above 0 under the matmul identity / bf16
        # beam scoring). For ip, distance is -dot, which is 0 for
        # byte-equal rows only when the row itself is zero — so ip
        # folding additionally requires ||q||^2 == 0.
        q_rows = data.vectors[jnp.clip(new_ids, 0, dump)]
        cand = sel_ids[:, 0, :]
        zero = cand >= 0
        if self.metric == "ip":
            qz = data.x2[jnp.clip(new_ids, 0, dump)] == 0.0  # [B]
            zero = zero & qz[:, None]
        elif self.metric == "jacbits":
            # byte-equal ZERO bit rows have jaccard distance 1.0, not 0
            # (bitvec.rs ab == 0 rule), so the reference's zero-distance
            # fold never fires for them — require a nonzero row here
            qnz = data.x2[jnp.clip(new_ids, 0, dump)] > 0.0  # [B]
            zero = zero & qnz[:, None]
        cand_rows = data.vectors[jnp.clip(cand, 0, dump)]  # [B, lm0, D]
        eq = jnp.all(cand_rows == q_rows[:, None, :], axis=-1) & zero
        tc = arrays.tid_counts[jnp.clip(cand, 0, dump)]
        ok = eq & (tc >= 1) & mask[:, None]
        has = jnp.any(ok, axis=1)
        first = jnp.argmax(ok, axis=1)
        target = jnp.where(has, jnp.take_along_axis(cand, first[:, None], 1)[:, 0], -1)

        # serialize same-target folds within the batch: rank in group
        big = jnp.int32(2**31 - 1)
        s_t, s_b = jax.lax.sort(
            [jnp.where(has, target, big), iota_b], num_keys=1
        )
        head = jnp.concatenate([jnp.array([True]), s_t[1:] != s_t[:-1]])
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
        group_base = jax.lax.cummax(jnp.where(head, pos, 0))
        rank = pos - group_base
        room = 10 - arrays.tid_counts[jnp.clip(s_t, 0, dump)]
        fold_sorted = (s_t != big) & (rank < room)
        fold = jnp.zeros((B,), bool).at[s_b].set(fold_sorted)
        alive = mask & ~fold

        arrays = arrays._replace(
            tid_counts=arrays.tid_counts.at[
                jnp.where(fold, target, dump)
            ].add(1)
            .at[jnp.where(alive, new_ids, dump)].set(1)
            .at[dump].set(0),
            absorb=arrays.absorb.at[jnp.where(fold, new_ids, dump)]
            .set(target)
            .at[dump].set(-1),
        )

        # ---- forward edges (ids + packed dists: ONE scatter per array)
        fwd_target = jnp.where(alive, new_ids, dump)
        arrays = arrays._replace(
            nb0c=arrays.nb0c.at[fwd_target].set(
                _pack_nbrc(sel_ids[:, 0, :], sel_d[:, 0, :])
            ),
            alive=arrays.alive.at[fwd_target].set(True).at[dump].set(False),
        )
        # NOTE: the new elements' forward upper rows are written by
        # _backedge_upper_compact (one combined row scatter — scatters
        # pay a ~7ms flat cost each on HBM-resident tables, probe_upc3)
        # IVF member table: append each kept row to its nearest cell
        # (same-cell rows within the batch serialize by rank-in-group;
        # rows past the cell cap drop membership — they keep their
        # graph edges, they just stop being candidates for later
        # batches, a bounded quality effect)
        if self.ivf and assign is not None:
            CAP_M = self.ivf_cap
            n_slots = arrays.members.shape[0]
            a = jnp.where(alive, assign, self.upper_dump)
            s_a, s_id = jax.lax.sort([a, new_ids], num_keys=1)
            head_m = jnp.concatenate(
                [jnp.array([True]), s_a[1:] != s_a[:-1]]
            )
            pos_m = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
            base_m = jax.lax.cummax(jnp.where(head_m, pos_m, 0))
            rank_m = pos_m - base_m
            cnt = arrays.member_counts[jnp.clip(s_a, 0, n_slots - 1)]
            slot_pos = cnt + rank_m
            keep_m = (s_a < self.upper_dump) & (slot_pos < CAP_M)
            flat = jnp.where(
                keep_m,
                jnp.clip(s_a, 0, n_slots - 1) * CAP_M
                + jnp.clip(slot_pos, 0, CAP_M - 1),
                n_slots * CAP_M - 1,  # dump: last pad cell slot
            )
            members_flat = arrays.members.reshape(-1)
            members_flat = members_flat.at[flat].set(
                jnp.where(keep_m, s_id, -1)
            )
            counts = arrays.member_counts.at[
                jnp.where(keep_m, s_a, n_slots - 1)
            ].add(jnp.where(keep_m, 1, 0))
            arrays = arrays._replace(
                members=members_flat.reshape(n_slots, CAP_M),
                member_counts=counts,
            )

        # entry promotion: first alive element reaching the batch max
        lv = jnp.where(alive, data.levels[jnp.clip(new_ids, 0, self.cap)], -1)
        batch_max = jnp.max(lv)
        promote = batch_max > arrays.entry_level
        first_e = jnp.argmax(lv == batch_max)
        return arrays._replace(
            entry=jnp.where(promote, new_ids[first_e], arrays.entry),
            entry_level=jnp.where(promote, batch_max, arrays.entry_level),
        )

    def _be_k(self, lm: int) -> int:
        """Same-target back-edge adds honored per commit (trace-time;
        PGV_BUILD_BE_K overrides). Size-aware default: 2 at large caps
        (collision density per target is low — measured recall-neutral
        at 1M, +2.5% build rate), 4 below _BE_K2_MIN_CAP."""
        k = int(os.environ.get("PGV_BUILD_BE_K", 0))
        if k <= 0:
            k = 2 if self.cap >= _BE_K2_MIN_CAP else 4
        return min(lm, k)

    def _resolve_backedges(self, data: BuildData, old_ids, old_d, tgt, dst, src, lm: int, K: int):
        """Shared back-edge machinery for one layer.

        tgt/dst/src [R]: requested edges target<-src at distance dst
        (invalid rows use tgt=dump sentinel handled by caller's masks).
        old_ids/old_d [R, lm]: the target's current list (pre-gathered).
        Returns (head [R] bool — first row per target, s_tgt [R],
        new_ids [R, lm], new_d [R, lm]) after Alg. 4 re-selection
        (graph/mod.rs:442-489 batched deterministically).
        """
        R = tgt.shape[0]
        s_tgt, s_d, s_src = jax.lax.sort([tgt, dst, src], num_keys=2)
        iota = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)[:, 0]
        head = jnp.concatenate(
            [jnp.array([True]), s_tgt[1:] != s_tgt[:-1]]
        ) & (s_tgt < self.cap + 1) & (s_tgt != self.cap)

        # adds window per head: rows i..i+K-1 with the same target
        win_idx = jnp.minimum(iota[:, None] + jnp.arange(K)[None, :], R - 1)
        same = s_tgt[win_idx] == s_tgt[:, None]
        add_ids = jnp.where(same, s_src[win_idx], -1)
        add_d = jnp.where(same, s_d[win_idx], jnp.inf)

        def select_rows(args):
            o_ids, o_d, a_ids, a_d = args
            cand_ids = jnp.concatenate([o_ids, a_ids], axis=1)  # [*, lm+K]
            cand_d = jnp.concatenate([o_d, a_d], axis=1)
            cand_d = jnp.where(cand_ids < 0, jnp.inf, cand_d)
            cand_d, cand_ids = jax.lax.sort([cand_d, cand_ids], num_keys=1)
            rows16 = (
                data.vectors_bf16 if self.metric != "l1" else data.vectors
            )
            rows = rows16[jnp.clip(cand_ids, 0, self.cap)]
            pair = _pair_matrix(self.metric, rows)
            pair = jnp.where(
                (cand_ids[:, None, :] < 0) | (cand_ids[:, :, None] < 0),
                jnp.inf,
                pair,
            )
            return _select_neighbors_parallel(
                cand_d, cand_ids, pair, lm, self.alpha_eff
            )

        # chunk the per-row selection: the [R, lm+K, lm+K] pair tensor
        # (plus sort transients) is what blew HBM at batch 4096 —
        # R = B*lm0 rows of (lm+K)^2 f32. Rows pad up to a chunk
        # multiple (inert -1/inf rows) so any R chunks.
        CH = 32768
        if R > CH:
            padr = (-R) % CH

            def padded(a, fill):
                return jnp.pad(a, ((0, padr), (0, 0)), constant_values=fill)

            nd_c, nids_c = jax.lax.map(
                select_rows,
                (
                    padded(old_ids, -1).reshape(-1, CH, old_ids.shape[1]),
                    padded(old_d, jnp.inf).reshape(-1, CH, old_d.shape[1]),
                    padded(add_ids, -1).reshape(-1, CH, K),
                    padded(add_d, jnp.inf).reshape(-1, CH, K),
                ),
            )
            nd = nd_c.reshape(R + padr, -1)[:R]
            nids = nids_c.reshape(R + padr, -1)[:R]
        else:
            nd, nids = select_rows((old_ids, old_d, add_ids, add_d))
        return head, s_tgt, nids, nd

    def _backedge0_step(self, data: BuildData, nb0c,
                        alive_full, start, size, sel_d, sel_ids):
        """Ground-layer back edges (the bulk of the work)."""
        B = self.batch_max
        lm = self.lm0
        dump = self.cap
        iota_b = jnp.arange(B, dtype=jnp.int32)
        mask = iota_b < size
        new_ids = jnp.where(mask, start + iota_b, dump)
        alive = alive_full[jnp.clip(new_ids, 0, dump)] & mask
        tgt = sel_ids[:, 0, :].reshape(-1)
        dst = sel_d[:, 0, :].reshape(-1)
        src = jnp.broadcast_to(new_ids[:, None], (B, lm)).reshape(-1)
        valid = (tgt >= 0) & jnp.broadcast_to(alive[:, None], (B, lm)).reshape(-1)
        tgt = jnp.where(valid, tgt, dump)
        dst = jnp.where(valid, dst, jnp.inf)

        # pre-gather old combined rows in sorted-target order (ONE
        # gather and ONE scatter for ids + dists — the scatter's fixed
        # per-op cost, not its payload, dominates the commit program)
        s_tgt0 = jax.lax.sort([tgt, dst, src], num_keys=2)[0]
        old_ids, old_d = _split_nbrc(nb0c[s_tgt0], lm)
        # K = same-target back-edge adds honored per commit (the rest
        # fold away, like the reference's tolerated lost in-edges under
        # concurrency, tests/t/016:68-70). Measured at 1M/128-d: K=4 is
        # +4% steady build rate over K=8 at identical beam recall
        # (0.9831); K=2 another +2.5% — default above _BE_K2_MIN_CAP
        # where same-target collision density is low (small graphs keep
        # 4 as margin for denser collisions per target).
        head, s_tgt, nids, nd = self._resolve_backedges(
            data, old_ids, old_d, tgt, dst, src, lm, K=self._be_k(lm)
        )
        scatter_tgt = jnp.where(head, s_tgt, dump)
        return nb0c.at[scatter_tgt].set(_pack_nbrc(nids, nd))

    def _backedge_upper_compact(self, data: BuildData, upc,
                                alive_full, start, size, sel_d, sel_ids):
        """Upper-layer back edges over a device-compacted request list.

        Only ~B/m batch elements have level >= 1, so instead of
        processing a dense [B, LMAX, m] request grid (16x wasted work),
        the valid requests are compacted on device (stable argsort on
        validity) into a fixed budget of 2*B rows — overflow beyond the
        budget is statistically negligible (expected load is
        B*m/(m-1)). Requests are grouped by (target, layer) with a
        3-key sort; pads use tgt=cap / layer=LMAX+7 so they group last
        and scatter to the dump row. All writes — every touched
        target's merged full row plus the batch's own forward upper
        rows — leave in ONE row-granular scatter (see the in-body
        comments for the probe-measured scatter cost model).
        """
        B = self.batch_max
        dump = self.cap
        iota_b = jnp.arange(B, dtype=jnp.int32)
        mask = iota_b < size
        new_ids = jnp.where(mask, start + iota_b, dump)
        alive = alive_full[jnp.clip(new_ids, 0, dump)] & mask

        lay_ids = sel_ids[:, 1:, : self.m]  # [B, LMAX, m]
        lay_d = sel_d[:, 1:, : self.m]
        L = lay_ids.shape[1]
        flat_t = lay_ids.reshape(-1)
        flat_d = lay_d.reshape(-1)
        flat_src = jnp.broadcast_to(
            new_ids[:, None, None], (B, L, self.m)
        ).reshape(-1)
        flat_layer = jnp.broadcast_to(
            (jnp.arange(L, dtype=jnp.int32) + 1)[None, :, None],
            (B, L, self.m),
        ).reshape(-1)
        flat_valid = (flat_t >= 0) & jnp.broadcast_to(
            alive[:, None, None], (B, L, self.m)
        ).reshape(-1)

        RU = 2 * B
        order = jnp.argsort(~flat_valid)[:RU]  # valid first (stable)
        sel_ok = flat_valid[order]
        u_tgt = jnp.where(sel_ok, flat_t[order], dump)
        u_dst = jnp.where(sel_ok, flat_d[order], jnp.inf)
        u_src = jnp.where(sel_ok, flat_src[order], -1)
        u_layer = jnp.where(sel_ok, flat_layer[order], self.lmax + 7)
        lm = self.m
        K = self._be_k(lm)
        dump_slot = self.upper_dump
        mp2 = self.mp2
        lmax = self.lmax
        # TARGET-primary sort so each target's per-layer groups are
        # adjacent — the whole pass scatters FULL rows, and full rows
        # must merge every layer a target is touched at in this batch
        s_tgt, s_layer, s_d, s_src = jax.lax.sort(
            [u_tgt, u_layer, u_dst, u_src], num_keys=3
        )
        valid = s_tgt < self.cap
        iota = jax.lax.broadcasted_iota(jnp.int32, (RU, 1), 0)[:, 0]
        same_t = s_tgt[1:] == s_tgt[:-1]
        same_tl = same_t & (s_layer[1:] == s_layer[:-1])
        head_tl = jnp.concatenate([jnp.array([True]), ~same_tl]) & valid
        head_t = jnp.concatenate([jnp.array([True]), ~same_t]) & valid

        win = jnp.minimum(iota[:, None] + jnp.arange(K)[None, :], RU - 1)
        same = (s_tgt[win] == s_tgt[:, None]) & (s_layer[win] == s_layer[:, None])
        add_ids = jnp.where(same, s_src[win], -1)
        add_d = jnp.where(same, s_d[win], jnp.inf)

        slot = data.upper_slot[jnp.clip(s_tgt, 0, self.cap)]
        slot_c = jnp.clip(slot, 0, dump_slot)
        lidx = jnp.clip(s_layer - 1, 0, lmax - 1)
        # FULL-row gather (the per-(slot, layer) computed-column gather/
        # scatter pair was the dominant upper-scaled commit cost: XLA
        # lowers computed-column scatters per ELEMENT at ~1us each —
        # 49k elements = 43.9ms at upper_pad=1M — while row-granular
        # scatters cost ~7ms FLAT regardless of row count; probe_upc*
        # 2026-08-19). Each row's own layer's old list is extracted
        # with an in-register take_along_axis.
        rows_old = upc[slot_c]  # [RU, lmax*(m+mp2)]
        idsb = rows_old[:, : lmax * lm].reshape(RU, lmax, lm)
        old_ids = jnp.take_along_axis(
            idsb, lidx[:, None, None], axis=1
        )[:, 0]
        pkb = rows_old[:, lmax * lm :].reshape(RU, lmax, mp2)
        old_pk = jnp.take_along_axis(
            pkb, lidx[:, None, None], axis=1
        )[:, 0]
        old_d = _unpack_bf16_pairs(old_pk)[:, :lm]

        cand_ids = jnp.concatenate([old_ids, add_ids], axis=1)  # [RU, lm+K]
        cand_d = jnp.concatenate([old_d, add_d], axis=1)
        cand_d = jnp.where(cand_ids < 0, jnp.inf, cand_d)
        cand_d, cand_ids = jax.lax.sort([cand_d, cand_ids], num_keys=1)
        rows16 = data.vectors_bf16 if self.metric != "l1" else data.vectors
        rows = rows16[jnp.clip(cand_ids, 0, self.cap)]
        pair = _pair_matrix(self.metric, rows)
        pair = jnp.where(
            (cand_ids[:, None, :] < 0) | (cand_ids[:, :, None] < 0),
            jnp.inf,
            pair,
        )
        nd, nids = _select_neighbors_parallel(
            cand_d, cand_ids, pair, lm, self.alpha_upper
        )

        # ---- merge each target's per-layer new lists into ONE full row
        # via a group cumsum: every (target, layer) head contributes its
        # packed list in its layer's column block (zeros elsewhere, at
        # most one nonzero per group per column, so the segment SUM is
        # the value — exact for raw int32 bit patterns, and int32
        # prefix-sum wraparound cancels in the end-start difference)
        comb = _upper_pack(nids, nd, lm, mp2)  # [RU, lm + mp2]
        lay_onehot = (
            jnp.arange(lmax, dtype=jnp.int32)[None, :] == lidx[:, None]
        ) & head_tl[:, None]  # [RU, lmax]
        contrib_ids = jnp.where(
            lay_onehot[:, :, None], comb[:, None, :lm], 0
        ).reshape(RU, lmax * lm)
        contrib_pk = jnp.where(
            lay_onehot[:, :, None], comb[:, None, lm:], 0
        ).reshape(RU, lmax * mp2)
        contrib = jnp.concatenate([contrib_ids, contrib_pk], axis=1)
        cs = jnp.cumsum(contrib, axis=0)
        pres_cs = jnp.cumsum(lay_onehot.astype(jnp.int32), axis=0)
        # last row of each target group (nearest marked position >= p)
        is_last_t = jnp.concatenate(
            [s_tgt[1:] != s_tgt[:-1], jnp.array([True])]
        )
        end_pos = jax.lax.associative_scan(
            jnp.minimum, jnp.where(is_last_t, iota, RU - 1), reverse=True
        )
        wc = contrib.shape[1]
        cs_prev = jnp.concatenate(
            [jnp.zeros((1, wc), jnp.int32), cs[:-1]], axis=0
        )
        group = cs[end_pos] - cs_prev  # valid at head_t rows
        pres_prev = jnp.concatenate(
            [jnp.zeros((1, lmax), jnp.int32), pres_cs[:-1]], axis=0
        )
        pres = (pres_cs[end_pos] - pres_prev) > 0  # [RU, lmax]
        mask_cols = jnp.concatenate(
            [
                jnp.repeat(pres, lm, axis=1),
                jnp.repeat(pres, mp2, axis=1),
            ],
            axis=1,
        )
        new_rows = jnp.where(mask_cols, group, rows_old)
        sslot = jnp.where(head_t & (slot >= 0), slot_c, dump_slot)

        # ---- forward upper edges of the batch's new elements share the
        # same scatter (their slot rows are disjoint from back-edge
        # targets — sel ids are always < start): full fresh rows, no
        # merge needed
        if "fwdupc" not in _ABLATE:
            slot_new = data.upper_slot[jnp.clip(new_ids, 0, self.cap)]
            starget = jnp.where(
                alive & (slot_new >= 0), slot_new, dump_slot
            )
            fwd_rows = _upper_pack(
                lay_ids.reshape(B, -1), lay_d.reshape(B, -1), lm, mp2
            )
            sslot = jnp.concatenate([sslot, starget])
            new_rows = jnp.concatenate([new_rows, fwd_rows], axis=0)
        return upc.at[sslot].set(new_rows)

    def _commit_all_step(self, data: BuildData, arrays: BuildArrays, start,
                         size, sel_d, sel_ids, assign=None):
        """Fused commit: duplicate folding + forward edges + both
        back-edge passes in ONE program (the tunnel charges per
        dispatch, so fewer, larger programs win; this one is
        width-independent and compiles once per build shape)."""
        a = self._fwd_commit_step(
            data, arrays, start, size, sel_d, sel_ids, assign
        )
        nb0c = a.nb0c
        if "be0" not in _ABLATE:
            nb0c = self._backedge0_step(
                data, a.nb0c, a.alive, start, size, sel_d, sel_ids,
            )
        upc = a.upc
        if "beu" not in _ABLATE:
            upc = self._backedge_upper_compact(
                data, a.upc, a.alive, start, size, sel_d, sel_ids,
            )
        return a._replace(nb0c=nb0c, upc=upc)

    def _bucket_program(self, data: BuildData, arrays: BuildArrays,
                        starts, sizes, nb, width: int):
        """Run up to _BATCHES_PER_DISPATCH (search + commit) batches in
        ONE device program.

        starts/sizes [_BATCHES_PER_DISPATCH] int32 (size 0 = no-op pad);
        nb is a traced scalar trip count, so one compiled program per
        capacity bucket serves any number of batches. Fewer, larger
        programs are the core tunnel-model optimization: dispatch is
        cheap (~40ms) but every DISTINCT program pays a 30-45s one-time
        load per process, so the whole build wants to be ONE program
        issuing O(N / (batch * _BATCHES_PER_DISPATCH)) dispatches.

        ``width == -1``: the merged-regime program — a lax.cond per
        batch picks the exact ramp (full descent-floor width) or the
        beam descent by the batch's start position, so ramp + descent
        share one compiled program and one load.
        """

        def step(arr, s, z, w):
            sel_d, sel_ids, assign = self._score_select_step(
                data, arr, s, z, w
            )
            return self._commit_all_step(
                data, arr, s, z, sel_d, sel_ids, assign
            )

        if width == -1:
            rampw = min(self.descent_min, self.cap + 1)

            def body(i, arr):
                s = starts[i]
                z = sizes[i]
                return jax.lax.cond(
                    s + 1 > self.descent_min,
                    lambda a: step(a, s, z, 0),
                    lambda a: step(a, s, z, rampw),
                    arr,
                )

        else:

            def body(i, arr):
                return step(arr, starts[i], sizes[i], width)

        return jax.lax.fori_loop(0, nb, body, arrays)

    def _init_members_step(self, data: BuildData, arrays: BuildArrays, count):
        """One-time IVF member-table build at the descent transition:
        assign every committed row to its nearest committed upper cell
        (exact chunked MXU sweep), then group by cell with a sort +
        rank-in-group and scatter into the flat member table."""
        cap1 = self.cap + 1
        CAP_M = self.ivf_cap
        n_slots = arrays.members.shape[0]
        width_u = data.upper_vectors.shape[0]
        u_ids = data.upper_ids
        u_colmask = (u_ids < count) & arrays.alive[jnp.clip(u_ids, 0, self.cap)]

        CH = 1024
        pad = (-cap1) % CH
        ids_all = jnp.arange(cap1 + pad, dtype=jnp.int32)

        def chunk(ids_c):
            safe = jnp.clip(ids_c, 0, self.cap)
            q_c = data.vectors[safe]
            sc = self._score_all(data, q_c, data.upper_vectors, data.upper_x2)
            sc = jnp.where(u_colmask[None, :], sc, jnp.inf)
            slot = jnp.argmin(sc, axis=1).astype(jnp.int32)
            row_ok = (
                (ids_c < count)
                & arrays.alive[safe]
                & jnp.isfinite(jnp.min(sc, axis=1))
            )
            return jnp.where(row_ok, slot, self.upper_dump)

        assign = jax.lax.map(chunk, ids_all.reshape(-1, CH)).reshape(-1)[
            :cap1
        ]
        s_a, s_id = jax.lax.sort(
            [assign, jnp.arange(cap1, dtype=jnp.int32)], num_keys=1
        )
        head = jnp.concatenate([jnp.array([True]), s_a[1:] != s_a[:-1]])
        pos = jax.lax.broadcasted_iota(jnp.int32, (cap1, 1), 0)[:, 0]
        base = jax.lax.cummax(jnp.where(head, pos, 0))
        rank = pos - base
        keep = (s_a < self.upper_dump) & (rank < CAP_M)
        flat = jnp.where(
            keep,
            jnp.clip(s_a, 0, n_slots - 1) * CAP_M
            + jnp.clip(rank, 0, CAP_M - 1),
            n_slots * CAP_M - 1,
        )
        members = (
            jnp.full((n_slots * CAP_M,), -1, dtype=jnp.int32)
            .at[flat]
            .set(jnp.where(keep, s_id, -1))
            .reshape(n_slots, CAP_M)
        )
        counts = (
            jnp.zeros((n_slots,), dtype=jnp.int32)
            .at[jnp.where(keep, s_a, n_slots - 1)]
            .add(jnp.where(keep, 1, 0))
        )
        return arrays._replace(members=members, member_counts=counts)

    def _ensure_members(self, start: int) -> None:
        if not self.ivf or self._members_ready:
            return
        self._members_ready = True
        self.arrays = self._init_members_jit(
            self.data, self.arrays, jnp.int32(start)
        )

    # -- public driver -------------------------------------------------------

    def host_adjacency(self):
        """Download the packed adjacency unpacked on device (avoids any
        host bf16 byte-order assumptions): returns np arrays
        (nb0_ids [cap+1, lm0], nb0_d f32, up_ids [U+1, LMAX*m],
        up_d f32)."""
        ids0, d0, upi, upd = _unpack_host_jit(
            self.arrays.nb0c, self.arrays.upc, self.lm0, self.m, self.mp2
        )
        return (
            np.asarray(ids0),
            np.asarray(d0),
            np.asarray(upi),
            np.asarray(upd),
        )

    def seed_first(self, first_id: int) -> None:
        self.arrays = self.arrays._replace(
            alive=self.arrays.alive.at[first_id].set(True),
            tid_counts=self.arrays.tid_counts.at[first_id].set(1),
            entry=jnp.int32(first_id),
            entry_level=self.levels[first_id],
        )

    def _ensure_rows(self, needed: int) -> None:
        """Streaming upload: dispatch corpus chunks covering rows
        [0, needed). Each chunk's device_put is issued ahead of the
        group dispatches that consume it, so its transfer overlaps the
        previous groups' device time. In-flight chunk buffers are
        throttled (~256MB) by draining a scalar from an older apply —
        bounding the HBM transient at 10M-row scale."""
        if self._chunk_rows == 0:
            return
        cap1 = self.cap + 1
        target = min(max(needed, 0), self.n)
        if self._uploaded_rows >= target:
            return
        CR = self._chunk_rows
        n = self.n
        throttle = max(2, (512 << 20) // (CR * self.dim * 4))
        while self._uploaded_rows < target:
            start = self._uploaded_rows
            rows = min(CR, cap1 - start)
            end = min(start + rows, n)
            if end - start == rows:
                host = self._host_rows[start:end]
            else:  # tail chunk: zero-pad (identical to the pad rows)
                host = np.zeros((rows, self.dim), dtype=np.float32)
                host[: end - start] = self._host_rows[start:end]
            if len(self._inflight) >= throttle:
                float(np.asarray(self._inflight.pop(0)))
            dev = jax.device_put(np.ascontiguousarray(host))
            d = self.data
            vec, bf, x2 = _stream_apply(
                d.vectors, d.vectors_bf16, d.x2, dev, jnp.int32(start)
            )
            self._inflight.append(x2[0])  # apply-done marker (eager slice)
            self.data = d._replace(vectors=vec, vectors_bf16=bf, x2=x2)
            self.vectors = vec
            self._uploaded_rows = start + rows
        if self._uploaded_rows >= n:  # rest of cap_pad is zero pads
            self._uploaded_rows = cap1
            self._host_rows = None
            self._inflight.clear()

    def _width_for(self, start: int) -> int:
        """Static scored-prefix width for a batch starting at `start`.

        ONE exact-ramp program (width = min(descent floor, capacity),
        exact top_k selection at any commit count) plus ONE
        width-independent descent program (sentinel 0) above the floor.
        Measured (phase probe, TPU v5e 2026-08-17): the per-batch sweep
        is latency-bound (~38ms at [1024, 131072] incl. top_k — the
        extra FLOPs of always scoring the full floor width are free),
        while every DISTINCT program costs 30-45s of one-time
        load/compile through the harness backend per process — the old
        doubling-width bucket ramp (6 programs) spent most of its wall
        clock there. PGV_BUILD_RAMP=buckets restores the old schedule
        for A/B.
        """
        cap1 = self.cap + 1
        if os.environ.get("PGV_BUILD_RAMP") == "buckets":
            if cap1 > self.descent_min and start + 1 > self.descent_min:
                return 0
            width = 4096
            while width < min(start + 1, cap1):
                width *= 2
            return min(width, cap1)
        if cap1 <= self.descent_min:
            return cap1  # pure ramp — no descent branch to compile
        if self.ivf:
            # the IVF member table initializes at the regime boundary
            # (run_all hook) — keep ramp/descent as separate programs
            return 0 if start + 1 > self.descent_min else min(
                self.descent_min, cap1
            )
        return -1  # merged-regime program (cond per batch)

    def run_all(self, schedule) -> None:
        """Run the whole batch schedule, folding consecutive same-bucket
        batches into single device dispatches (see _bucket_program)."""
        NB = _BATCHES_PER_DISPATCH
        debug = os.environ.get("PGV_BUILD_DEBUG")
        if debug:
            for start, size in schedule:
                self.run_batch(start, size)
            return
        groups: list[tuple[int, list]] = []
        for start, size in schedule:
            w = self._width_for(start)
            if groups and groups[-1][0] == w and len(groups[-1][1]) < NB:
                groups[-1][1].append((start, size))
            else:
                groups.append((w, [(start, size)]))
        timing = os.environ.get("PGV_BUILD_TIMING")
        collect = GROUP_STATS is not None
        for w, batches in groups:
            t0 = time.time()
            self._ensure_rows(batches[-1][0] + batches[-1][1])
            if w == 0:
                self._ensure_members(batches[0][0])
            starts = np.zeros(NB, np.int32)
            sizes = np.zeros(NB, np.int32)
            for i, (s, z) in enumerate(batches):
                starts[i] = s
                sizes[i] = z
            self.arrays = self._bucket_jit(
                self.data,
                self.arrays,
                jnp.asarray(starts),
                jnp.asarray(sizes),
                jnp.int32(len(batches)),
                width=w,
            )
            if timing or collect:
                # a tiny download, not block_until_ready: the tunneled
                # backend acks dispatches asynchronously, so only a
                # value readback actually drains the device queue
                int(np.asarray(self.arrays.entry))
                n_el = sum(z for _, z in batches)
                dt = time.time() - t0
                if collect:
                    GROUP_STATS.append((w, n_el, dt))
                if timing:
                    print(
                        f"[build] group w={w} batches={len(batches)} "
                        f"elems={n_el} {dt:.2f}s "
                        f"({n_el/max(dt,1e-9):.0f}/s)",
                        file=sys.stderr,
                        flush=True,
                    )

    def run_batch(self, start: int, size: int) -> None:
        """Insert elements [start, start+size) — one dispatch per phase
        (the instrumented/debug path; run_all is the fast path)."""
        debug = os.environ.get("PGV_BUILD_DEBUG")
        width = self._width_for(start)
        if width == -1:  # merged-regime sentinel: resolve per batch
            width = (
                0
                if start + 1 > self.descent_min
                else min(self.descent_min, self.cap + 1)
            )
        self._ensure_rows(start + size)
        if width == 0:
            self._ensure_members(start)

        t0 = time.time()
        jstart = jnp.int32(start)
        jsize = jnp.int32(size)
        sel_d, sel_ids, assign = self._search_jit(
            self.data, self.arrays, jstart, jsize, width=width
        )
        if debug:
            float(np.asarray(sel_d[0, 0, 0]))  # download-sync (tunnel)
            t1 = time.time()
            print(
                f"[build] batch@{start} n={size} w={width} "
                f"search {t1-t0:.3f}s",
                file=sys.stderr,
                flush=True,
            )

        t0 = time.time()
        if debug:
            a = self._fwd_jit(
                self.data, self.arrays, jstart, jsize, sel_d, sel_ids, assign
            )
            int(np.asarray(a.entry))
            t1 = time.time()
            nb0c = self._be0_jit(
                self.data, a.nb0c, a.alive, jstart, jsize, sel_d, sel_ids,
            )
            int(np.asarray(nb0c[0, 0]))
            t2 = time.time()
            upc = self._beu_jit(
                self.data, a.upc, a.alive, jstart, jsize, sel_d, sel_ids,
            )
            self.arrays = a._replace(nb0c=nb0c, upc=upc)
            int(np.asarray(upc[0, 0]))
            t3 = time.time()
            print(
                f"[build] batch@{start} commit {t3-t0:.3f}s "
                f"(fwd {t1-t0:.3f} be0 {t2-t1:.3f} beu {t3-t2:.3f})",
                file=sys.stderr,
                flush=True,
            )
        else:
            self.arrays = self._commit_jit(
                self.data, self.arrays, jstart, jsize, sel_d, sel_ids, assign
            )


def batch_schedule(n: int, batch_max: int):
    """Doubling schedule: 1, 1, 2, 4, ... capped at batch_max."""
    out = []
    pos = 1  # element 0 seeds the graph
    size = 1
    while pos < n:
        take = min(size, batch_max, n - pos)
        out.append((pos, take))
        pos += take
        size = min(size * 2, batch_max)
    return out


def _tids_array(ids) -> np.ndarray:
    """Id sequence -> int64 array without materializing Python ints
    (range -> arange; at 1M rows the list round trip costs ~1.5s of
    single-core host time)."""
    if isinstance(ids, range):
        return np.arange(ids.start, ids.stop, ids.step, dtype=np.int64)
    return np.asarray(list(ids) if not hasattr(ids, "__len__") else ids,
                      dtype=np.int64)


def _bit_ground_pin(index):
    """Ground pin for bit corpora (None = honor env/auto elsewhere).

    Pinning silently overriding an operator's explicit
    PGV_BUILD_GROUND A/B is invisible otherwise — say so once."""
    if index.kind != "bit":
        return None
    env = os.environ.get("PGV_BUILD_GROUND")
    if env not in (None, "", "auto", "beam"):
        warnings.warn(
            f"PGV_BUILD_GROUND={env} ignored for bit corpora: the "
            "build pins ground=beam (integer hamming ties collapse "
            "the ivf member/hop pools, DESIGN.md 6n)",
            stacklevel=3,
        )
    return "beam"


def _prepare_dense_bulk(index, data, ids):
    """Vectorized dense prepare: shape check once, vectorized cosine
    normalize + zero-norm row skip (build.rs:426-438 semantics) —
    replaces the per-row Python prepare loop, which dominates at
    millions of rows."""
    arr = np.asarray(data, dtype=np.float32)
    if arr.ndim != 2 or arr.shape[1] != index.dim:
        raise ValueError(f"expected {index.dim} dimensions")
    tids = _tids_array(ids)
    if index.metric == "cosine":
        norms = np.sqrt(
            np.sum(arr.astype(np.float64) ** 2, axis=1, keepdims=True)
        )
        keep = norms[:, 0] > 0.0
        arr = (arr[keep].astype(np.float64) / norms[keep]).astype(np.float32)
        tids = tids[keep]
    if not np.isfinite(arr).all():
        raise ValueError("NaN or infinity not allowed in vector")
    return arr, tids


def _prepare_dense_device(index, data, ids):
    """Device-side prepare for a device-resident corpus: validation,
    cosine normalize + zero-norm row skip (build.rs:426-438 semantics),
    halfvec store-dtype rounding — all on device, downloading only a
    scalar (finite check) and, for cosine, the keep mask.

    Note: cosine normalization divides in f32 on device (the host
    prepare divides in f64); the two paths may differ in the last ulp
    of normalized values.
    """
    if data.ndim != 2 or data.shape[1] != index.dim:
        raise ValueError(f"expected {index.dim} dimensions")
    tids = _tids_array(ids)
    v = data
    if v.dtype != jnp.float32:
        v = jax.jit(lambda x: x.astype(jnp.float32))(v)
    if index.metric == "cosine":
        norm2, finite = jax.jit(
            lambda x: (jnp.sum(x * x, axis=1), jnp.isfinite(x).all())
        )(v)
        if not bool(np.asarray(finite)):
            raise ValueError("NaN or infinity not allowed in vector")
        keep = np.asarray(norm2) > 0.0
        if not keep.all():
            sel = jnp.asarray(np.nonzero(keep)[0].astype(np.int32))
            v = jax.jit(lambda x, s: x[s])(v, sel)
            tids = tids[keep]
        v = jax.jit(
            lambda x: x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        )(v)
    else:
        finite = jax.jit(lambda x: jnp.isfinite(x).all())(v)
        if not bool(np.asarray(finite)):
            raise ValueError("NaN or infinity not allowed in vector")
    if index.dtype is not None and index.dtype != np.float32:
        # round through the store dtype (halfvec) — see the host path
        hdt = jnp.float16 if index.dtype == np.float16 else index.dtype
        v = jax.jit(lambda x: x.astype(hdt).astype(jnp.float32))(v)
    return v, tids


def bulk_build(index, data, ids, host_graph: bool = True,
               consume_input: bool = False) -> None:
    """Entry point called by HnswIndex.build(method='device').

    ``consume_input`` (device-resident corpus + host_graph=False only):
    the build takes ownership of ``data`` and frees it once the padded
    build buffer exists — halves the corpus HBM footprint during build,
    which is what lets a 10M x 128-d device-input build fit a 16GB
    chip. The caller's array is invalid afterwards.

    Prepares values (cosine normalize / zero-skip), assigns levels with
    the index RNG, runs the batched build, then populates the host index
    structures from the final device arrays.

    ``host_graph=False`` (serving-only mode) skips materializing the
    per-element Python graph objects — the index keeps the device
    arrays plus the value store and serves search() directly; host
    mutation paths (insert/delete/vacuum) are unavailable until a
    rebuild. Intended for large serving corpora and benchmarks where
    per-row Python materialization would dominate build time.
    """
    from ..graph.host import GraphElement

    timing = os.environ.get("PGV_BUILD_TIMING")
    _t0 = time.time()

    def _phase(name):
        nonlocal _t0
        if timing:
            t = time.time()
            print(f"[build] phase {name} {t - _t0:.2f}s",
                  file=sys.stderr, flush=True)
            _t0 = t

    if consume_input and (host_graph or not _is_device_array(data)):
        raise ValueError(
            "consume_input requires a device-resident corpus and "
            "host_graph=False"
        )
    if index.kind == "dense" and _is_device_array(data):
        vectors, kept_tids = _prepare_dense_device(index, data, ids)
        if consume_input and vectors is not data:
            data.delete()  # prepare made a transformed copy
        n = int(vectors.shape[0])
        if n == 0:
            return
    elif index.kind == "dense" and isinstance(data, np.ndarray):
        vectors, kept_tids = _prepare_dense_bulk(index, data, ids)
        if index.dtype is not None and index.dtype != np.float32:
            # round through the store dtype (halfvec): the reference
            # scores the f16-STORED value, and reload-equivalence
            # requires the serving graph to see the same rounding
            vectors = vectors.astype(index.dtype).astype(np.float32)
        n = len(vectors)
        if n == 0:
            return
    elif index.kind == "bit":
        # hamming(q, x) over {0,1} vectors IS squared l2: unpack the
        # packed rows to f32 bit columns and run the dense l2 build
        # machinery unchanged — candidate scoring, Alg-4 pruning and
        # duplicate folding (f32 row equality <=> the reference's byte
        # equality, build.rs:480-482) are all exact, since hamming
        # distances are small integers. jaccard derives from the same
        # identity (builder metric "jacbits": jac = 2·l2² /
        # (qpop + rowpop + l2²), see _l2_to_jaccard) — also exact.
        if _is_device_array(data):
            data = np.asarray(data)  # bit rows prepare on host (packbits)
        prepared = []
        kept_tids = []
        for value, tid in zip(data, ids):
            p = index.prepare_value(value)
            if p is None:
                continue
            prepared.append(p)
            kept_tids.append(int(tid))
        n = len(prepared)
        if n == 0:
            return
        bit_packed = np.stack(prepared)  # [n, nbytes] uint8
        vectors = np.unpackbits(bit_packed, axis=1)[:, : index.dim].astype(
            np.float32
        )
    else:
        prepared = []
        kept_tids = []
        for value, tid in zip(data, ids):
            p = index.prepare_value(value)
            if p is None:
                continue
            prepared.append(p)
            kept_tids.append(int(tid))
        n = len(prepared)
        if n == 0:
            return
        vectors = np.stack(prepared).astype(np.float32)
    _phase("prep")

    # MIPS build geometry (DESIGN 6t, opt-in): ip's raw order distance
    # -<x,y> is not a metric between stored points, and Algorithm-4
    # selection degrades on it at high dim (1M x 1024-d ip beam(ef=40)
    # 0.846/0.884 across grounds, DESIGN 6m/7). Build the graph in the
    # augmented-l2 space instead: rows gain a sqrt(M^2-|x|^2) column
    # (all on the radius-M sphere -> true metric), and the builder runs
    # its plain l2 machinery. Query ip ranking is exactly preserved
    # (q'=[q;0]), so serving needs no change; the augmentation column
    # is sliced back off at finalize and never reaches the store.
    ip_aug = (
        index.kind == "dense"
        and index.metric == "ip"
        and os.environ.get("PGV_BUILD_IP_AUG", "0") != "0"
    )
    build_vectors = vectors
    if ip_aug:
        if _is_device_array(vectors):
            build_vectors = _augment_ip_device(vectors)
            if consume_input:
                # serving values re-derive from the augmented buffer
                # (sliced at finalize); the original can free now
                vectors.delete()
                vectors = None
        else:
            x2h = np.sum(vectors.astype(np.float64) ** 2, axis=1)
            m2 = float(x2h.max()) if len(x2h) else 0.0
            aug = np.sqrt(np.maximum(m2 - x2h, 0.0)).astype(np.float32)
            build_vectors = np.concatenate([vectors, aug[:, None]], axis=1)
            lane_pad = (-build_vectors.shape[1]) % 128
            if lane_pad:  # see _augment_ip_device: layout, not padding
                build_vectors = np.pad(
                    build_vectors, ((0, 0), (0, lane_pad))
                )
    levels = index.random_levels(n)
    _phase("levels")

    builder = DeviceBuilder(
        (
            ("l2" if index.metric == "hamming" else "jacbits")
            if index.kind == "bit"
            else ("l2" if ip_aug else index.metric)
        ),
        build_vectors,
        levels,
        index.params.m,
        index.params.ef_construction,
        # 1024 = the largest batch validated stable through the
        # tunneled backend (2048/4096 descent batches have crashed the
        # TPU worker); also divisible by the scoring chunk, so the
        # exact buckets' transient stays [1024, width] regardless of
        # corpus size. PGV_BUILD_BATCH overrides.
        batch_max=int(
            os.environ.get("PGV_BUILD_BATCH", 0)
        )
        or min(1024, max(64, 1 << max(n // 16, 1).bit_length() >> 1)),
        consume_input=consume_input,
        # bit corpora keep the beam-descent ground even for the
        # hamming-as-l2 identity: integer hamming distances tie
        # heavily, and the ivf member/hop pools collapse under ties
        # (1M bit beam recall 0.95 -> 0.72 measured, DESIGN.md 6n)
        ground=_bit_ground_pin(index),
    )
    # finalize slices the augmentation column back off for serving
    builder.serve_slice_dim = index.dim if ip_aug else None

    _phase("builder-init")
    kept_arr = (
        kept_tids
        if isinstance(kept_tids, np.ndarray)
        else np.asarray(kept_tids, dtype=np.int64)
    )
    if isinstance(kept_tids, np.ndarray):
        kept_tids = kept_tids.tolist()
    heap_tids = [[t] for t in kept_tids]
    builder.seed_first(0)
    builder.run_all(batch_schedule(n, builder.batch_max))
    if not host_graph:
        # run_all dispatches are async: the device is still executing
        # build groups here, so the finalize programs' one-time
        # trace/compile/load (host+tunnel side, ~9.4s at 1M) rides
        # behind build compute instead of serializing after it
        _warm_finalize_programs(
            builder,
            kept_arr,
            bit_w=(index.dim + 31) // 32 if index.kind == "bit" else 0,
        )
    _phase("run_all")

    # one download of the device-side duplicate-fold decisions; apply
    # in insertion order so TID lists match sequential-fold semantics
    absorb = np.asarray(builder.arrays.absorb)[:n]
    for e in np.nonzero(absorb >= 0)[0]:
        t = int(absorb[e])
        heap_tids[t].extend(heap_tids[e])
        heap_tids[e] = []
    _phase("absorb")

    base = len(index.elements)
    assert base == 0, "device bulk build requires an empty index"
    store_dtype = index.dtype or np.float32

    if not host_graph:
        # serving-only: bulk-load the store, keep TIDs, and hand the
        # index a DeviceGraph built straight from the builder arrays
        deferred_store = False
        if index.kind == "bit":
            index.store.bulk_load(bit_packed)
        elif isinstance(vectors, np.ndarray):
            index.store.bulk_load(vectors.astype(store_dtype))
        elif consume_input:
            if ip_aug:
                # the build buffer carries the augmentation column;
                # back the store after the graph slices serving values
                deferred_store = True
            else:
                # the input buffer was freed; back the store with the
                # builder's padded buffer (sliced to n on lazy download)
                index.store.bulk_load_device(builder.data.vectors, count=n)
        else:  # device-resident input: host copy only if ever needed
            index.store.bulk_load_device(vectors)
        index.heap_tids = heap_tids
        _phase("finalize.store")
        entry = int(np.asarray(builder.arrays.entry))
        index.entry = entry if entry >= 0 else None
        _phase("finalize.entry-sync")
        index.serving_only = True
        index._device = _device_graph_from_builder(
            index, builder, heap_tids, first_tids=kept_arr
        )
        _phase("finalize.device-graph")
        g = index._device
        if deferred_store:
            if np.dtype(store_dtype) == np.dtype(g.values.dtype):
                index.store.bulk_load_device(g.values, count=n)
            else:
                # f32 store with a compact serve dtype: materialize the
                # un-augmented f32 rows for the store (the rebind block
                # below governs whether a lossy rebind replaces them)
                v32, _ = _slice_serve_jit(builder.vectors, index.dim)
                index.store.bulk_load_device(v32, count=n)
            _phase("finalize.deferred-store")
        if (
            index.kind == "dense"
            and g.values is not None
            and g.values.dtype != jnp.float32
            and getattr(index.store, "_device_rows", None) is not None
        ):
            # compact serve dtype: back the store with the compact
            # array so the padded f32 build buffer can free below
            # (halfvec 1.25M x 1024: 5.4 GB -> 2.7 GB resident store).
            # Only when LOSSLESS for the store (f16 store, f16 serve):
            # re-backing an f32 store with a bf16 serve array would
            # silently persist ROUNDED vectors on save() and feed
            # rounded rows to host scans / byte-equality duplicate
            # checks (the reference always persists full precision).
            # PGV_SERVE_REBIND_LOSSY=1 opts in anyway — the 12.5M x
            # 128-d bf16 per-chip shard needs it (the f32+bf16 pair
            # does not fit one 16 GB chip, DESIGN.md 6l).
            store_dt = np.dtype(index.dtype or np.float32)
            if store_dt == np.dtype(g.values.dtype):
                index.store.rebind_device(g.values)
            elif os.environ.get("PGV_SERVE_REBIND_LOSSY") == "1":
                warnings.warn(
                    "PGV_SERVE_REBIND_LOSSY=1: store re-backed with "
                    f"{g.values.dtype} serve rows; save()/host scans "
                    "will see rounded vectors",
                    stacklevel=2,
                )
                index.store.rebind_device(g.values)
        # Drop build-only device state NOW (packed nb0c/upc adjacency,
        # ivf member tables, upper value tables — ~5.5 GB at 10M). The
        # DeviceGraph holds its own references to everything serving
        # needs; relying on the builder's GC can defer release past the
        # first serve dispatch, and a 10M build + serve runs within a
        # few hundred MB of the 16 GB chip (the r4 ivf members array
        # alone tipped it, OOM at GT).
        builder.arrays = None
        builder.data = None
        builder.vectors = None
        gc.collect()
        _phase("finalize.free-build-state")
        return

    # ---- populate the host index from the device arrays
    if not isinstance(vectors, np.ndarray):
        vectors = np.asarray(vectors)  # host graph keeps host values
    nb0_ids, nb0_d, up_ids, up_d = builder.host_adjacency()
    neighbors0 = nb0_ids[:n]
    nbr0_dist = nb0_d[:n]
    u_pad = up_ids.shape[0]
    upper_nbrs = up_ids.reshape(u_pad, builder.lmax, builder.m)
    upper_dist = up_d.reshape(u_pad, builder.lmax, builder.m)
    upper_slot = np.asarray(builder.upper_slot)[: n]
    if ip_aug:
        # the graph was selected in the augmented-l2 surrogate; the
        # host graph stores TRUE ip neighbor distances (insert's Alg-4
        # re-pruning and vacuum's repair consume them)
        orig_dev = _slice_cols_jit(builder.vectors, index.dim)
        nbr0_dist = np.asarray(_edge_distances(
            1, orig_dev, jnp.arange(n, dtype=jnp.int32),
            jnp.asarray(neighbors0),
        ))
        if u_pad:
            slot_src = np.zeros(u_pad, dtype=np.int32)
            lv_mask = np.asarray(levels[:n]) >= 1
            slot_src[upper_slot[lv_mask]] = np.nonzero(lv_mask)[0]
            upper_dist = np.asarray(_edge_distances(
                1, orig_dev, jnp.asarray(slot_src),
                jnp.asarray(upper_nbrs.reshape(u_pad, -1)),
            )).reshape(u_pad, builder.lmax, builder.m)

    for i in range(n):
        e = GraphElement(level=int(levels[i]))
        nb0 = [
            (float(d), int(v) )
            for d, v in zip(nbr0_dist[i], neighbors0[i])
            if v >= 0
        ]
        e.neighbors[0] = nb0
        if levels[i] >= 1:
            slot = upper_slot[i]
            for lc in range(1, int(levels[i]) + 1):
                e.neighbors[lc] = [
                    (float(d), int(v))
                    for d, v in zip(upper_dist[slot, lc - 1], upper_nbrs[slot, lc - 1])
                    if v >= 0
                ]
        index.elements.append(e)
        index.store.append(
            bit_packed[i]
            if index.kind == "bit"
            else vectors[i].astype(store_dtype)
        )
        index.heap_tids.append(heap_tids[i])

    entry = int(np.asarray(builder.arrays.entry))
    index.entry = entry if entry >= 0 else None
    index._invalidate_device()


@functools.partial(jax.jit, static_argnames=("metric_code",))
def _edge_distances(metric_code, vectors, src_ids, nbr_ids):
    """Exact f32 order distances d(src, nbr) for seeded adjacency rows.

    src_ids [R], nbr_ids [R, W] (-1 pads -> inf). Used when transplanting
    an existing graph into a DeviceBuilder (bulk insert): the builder
    needs current neighbor distances for back-edge re-selection, and
    recomputing them on device is faster and exact vs. pulling
    host-side lists.
    """
    cap = vectors.shape[0] - 1
    CH = 8192
    R, W = nbr_ids.shape
    pad = (-R) % CH

    src_p = jnp.pad(src_ids, (0, pad), constant_values=cap)
    nbr_p = jnp.pad(nbr_ids, ((0, pad), (0, 0)), constant_values=-1)

    def chunk(args):
        s, nb = args  # [CH], [CH, W]
        q = vectors[jnp.clip(s, 0, cap)]  # [CH, D]
        rows = vectors[jnp.clip(nb, 0, cap)]  # [CH, W, D]
        if metric_code == 0:  # l2
            d = jnp.sum((rows - q[:, None, :]) ** 2, axis=-1)
        elif metric_code == 1:  # ip
            d = -jnp.sum(rows * q[:, None, :], axis=-1)
        elif metric_code == 2:  # cosine
            d = 1.0 - jnp.clip(jnp.sum(rows * q[:, None, :], axis=-1), -1.0, 1.0)
        else:  # l1
            d = jnp.sum(jnp.abs(rows - q[:, None, :]), axis=-1)
        return jnp.where(nb >= 0, d, jnp.inf)

    parts = jax.lax.map(
        chunk, (src_p.reshape(-1, CH), nbr_p.reshape(-1, CH, W))
    )
    return parts.reshape(-1, W)[:R]


_METRIC_CODES = {"l2": 0, "ip": 1, "cosine": 2, "l1": 3}


def _seed_builder_from_graph(builder: DeviceBuilder, g, n0: int) -> None:
    """Transplant an existing DeviceGraph (n0 committed elements) into a
    fresh builder's arrays so batches can insert on top of it."""
    mc = _METRIC_CODES[builder.metric]
    lm0 = builder.lm0
    m = builder.m

    nb0 = np.full((builder.cap + 1, lm0), -1, dtype=np.int32)
    nb0[:n0] = np.asarray(g.neighbors0)[:n0, :lm0]
    nb0_j = jnp.asarray(nb0)
    src = jnp.arange(builder.cap + 1, dtype=jnp.int32)
    nbr0_dist = _edge_distances(mc, builder.data.vectors, src, nb0_j)

    # upper adjacency: translate old slot/layout -> builder slot/layout
    old_slot = np.asarray(g.upper_slot)[:n0]
    old_upper = np.asarray(g.upper_neighbors)
    lmax_old = old_upper.shape[1] // max(g.m, 1)
    lc_common = min(lmax_old, builder.lmax)
    new_slot_all = np.asarray(builder.upper_slot)[:n0]
    eids = np.nonzero(old_slot >= 0)[0]
    up_pad = builder.upper_dump + 1
    new_upper = np.full((up_pad, builder.lmax * m), -1, dtype=np.int32)
    if len(eids):
        ns = new_slot_all[eids]
        new_upper[ns, : lc_common * m] = old_upper[
            old_slot[eids], : lc_common * m
        ]
    up_j = jnp.asarray(new_upper)
    up_dist = _edge_distances(
        mc, builder.data.vectors, builder.data.upper_ids, up_j
    )

    alive = np.zeros(builder.cap + 1, dtype=bool)
    alive[:n0] = np.asarray(g.traversable)[:n0]
    tid_counts = np.zeros(builder.cap + 1, dtype=np.int32)
    tid_counts[:n0] = np.asarray(g.tid_count)[:n0]

    builder.arrays = builder.arrays._replace(
        nb0c=_pack_nbrc_jit(nb0_j, nbr0_dist),
        upc=_upper_pack_jit(up_j, up_dist, builder.m, builder.mp2),
        alive=jnp.asarray(alive),
        tid_counts=jnp.asarray(tid_counts),
        absorb=jnp.full((builder.cap + 1,), -1, dtype=jnp.int32),
        entry=jnp.int32(g.entry),
        entry_level=jnp.int32(g.entry_level),
    )


def bulk_insert(index, data, ids) -> int:
    """Batched device insert into an EXISTING dense index — aminsert at
    bulk-build throughput.

    The reference serializes inserts per backend under UPDATE_LOCK
    (insert.rs:1281-1313); the TPU-native equivalent inserts frozen-
    snapshot batches with the same machinery as the bulk build: the
    existing graph is transplanted into builder arrays (neighbor
    distances recomputed exactly on device), new rows append to fresh
    slots, and each batch runs candidate search + Alg-4 selection +
    deterministic back-edge resolution on device. Duplicate folding
    works across old and new elements (10-TID cap); entry promotion
    follows UPDATE_ENTRY_GREATER. Deviation from aminsert: vacuumed
    free slots are NOT reused (new slots append; the sequential
    insert() path keeps exact slot-reuse parity).

    Returns the number of elements inserted (excluding folded TIDs).
    """
    if index.kind != "dense":
        raise ValueError("bulk_insert supports dense indexes only")
    dev_in = _is_device_array(data)
    if dev_in:
        arr, kept_tids = _prepare_dense_device(index, data, ids)
        n_new = int(arr.shape[0])
    else:
        arr, kept_tids = _prepare_dense_bulk(index, data, ids)
        if index.dtype is not None and index.dtype != np.float32:
            arr = arr.astype(index.dtype).astype(np.float32)
        n_new = len(arr)
    if n_new == 0:
        return 0
    n0 = len(index.elements) if not index.serving_only else index.store.count
    if n0 == 0 or index.entry is None:
        bulk_build(index, arr, kept_tids, host_graph=not index.serving_only)
        return n_new

    g = index.device_graph()
    if dev_in:
        # old rows come from the device graph itself — the whole insert
        # runs transfer-free on a device-backed index
        vectors = jnp.concatenate(
            [g.values[:n0].astype(jnp.float32), arr]
        )
    else:
        old_rows = np.asarray(index.store.rows[:n0], dtype=np.float32)
        vectors = np.concatenate([old_rows, arr])
    old_levels = (
        np.fromiter((e.level for e in index.elements), np.int32, n0)
        if not index.serving_only
        else np.asarray(g.levels)[:n0]
    )
    new_levels = index.random_levels(n_new)
    levels = np.concatenate([old_levels.astype(np.int32), new_levels])

    builder = DeviceBuilder(
        index.metric, vectors, levels, index.params.m,
        index.params.ef_construction,
        batch_max=int(os.environ.get("PGV_BUILD_BATCH", 0)) or 1024,
    )
    # the transplant recomputes edge distances of the EXISTING rows on
    # device, so those must be resident before the streaming schedule
    builder._ensure_rows(n0)
    _seed_builder_from_graph(builder, g, n0)
    levels_cl = np.asarray(builder.levels)[: n0 + n_new]  # lmax-clamped

    # Doubling sub-batches (64, 128, ... batch_max): a large insert set
    # can be mutually nearest (a new cluster); frozen-snapshot batches
    # don't see each other, so later sub-batches must supply the
    # intra-set edges earlier rows need to be reachable (the sequential
    # aminsert chain gives this for free; doubling bounds the blind
    # fraction the same way the build schedule does).
    sched = []
    pos = n0
    size = 64
    while pos < n0 + n_new:
        take = min(size, builder.batch_max, n0 + n_new - pos)
        sched.append((pos, take))
        pos += take
        size = min(size * 2, builder.batch_max)
    builder.run_all(sched)

    # --- fold duplicate TIDs (old or new targets), in insertion order
    absorb = np.asarray(builder.arrays.absorb)[: n0 + n_new]
    if isinstance(kept_tids, np.ndarray):
        kept_tids = kept_tids.tolist()
    new_tids: list[list[int]] = [[t] for t in kept_tids]

    def tids_of(e):
        return new_tids[e - n0] if e >= n0 else index.heap_tids[e]

    for e in range(n0, n0 + n_new):
        t = int(absorb[e])
        if t >= 0:
            tids_of(t).extend(new_tids[e - n0])
            new_tids[e - n0] = []

    store_dtype = index.dtype or np.float32
    if index.serving_only:
        if dev_in and index.store._device_rows is not None:
            # device-backed store stays device-backed: swap in the
            # concatenated corpus, still zero downloads
            index.store.reset_device(vectors)
        else:
            arr_host = arr if isinstance(arr, np.ndarray) else np.asarray(arr)
            for i in range(n_new):
                index.store.append(arr_host[i].astype(store_dtype))
        index.heap_tids.extend(new_tids)
        entry = int(np.asarray(builder.arrays.entry))
        index.entry = entry if entry >= 0 else None
        index._device = _device_graph_from_builder(
            index, builder, index.heap_tids
        )
        index.stats["inserts"] += n_new
        return sum(1 for t in new_tids if t)

    # --- host-graph update: append new elements; rewrite only the rows
    # whose adjacency changed (back-edge targets)
    from ..graph.host import GraphElement

    if not isinstance(arr, np.ndarray):
        arr = np.asarray(arr)  # host graph keeps host values
    nb0_new, nb0d_new, up_new, upd_new = builder.host_adjacency()
    upper_slot = np.asarray(builder.upper_slot)
    old_nb0 = np.full((n0, builder.lm0), -1, dtype=np.int32)
    old_nb0[:] = np.asarray(g.neighbors0)[:n0, : builder.lm0]
    changed = set(np.nonzero((nb0_new[:n0] != old_nb0).any(axis=1))[0].tolist())
    # upper rows: compare translated old vs new
    old_slot = np.asarray(g.upper_slot)[:n0]
    for eid in np.nonzero(old_slot >= 0)[0]:
        s = upper_slot[eid]
        lmax_old = np.asarray(g.upper_neighbors).shape[1] // max(g.m, 1)
        lc_common = min(lmax_old, builder.lmax)
        if not np.array_equal(
            up_new[s, : lc_common * builder.m],
            np.asarray(g.upper_neighbors)[old_slot[eid], : lc_common * builder.m],
        ):
            changed.add(int(eid))

    def lists_from_arrays(eid):
        lev = int(levels_cl[eid])
        e = GraphElement(level=lev)
        e.neighbors[0] = [
            (float(d), int(v))
            for d, v in zip(nb0d_new[eid], nb0_new[eid])
            if v >= 0
        ]
        if lev >= 1:
            s = upper_slot[eid]
            for lc in range(1, lev + 1):
                cols = slice((lc - 1) * builder.m, lc * builder.m)
                e.neighbors[lc] = [
                    (float(d), int(v))
                    for d, v in zip(upd_new[s, cols], up_new[s, cols])
                    if v >= 0
                ]
        return e

    for i in range(n_new):
        eid = n0 + i
        index.store.append(arr[i].astype(store_dtype))
        index.elements.append(lists_from_arrays(eid))
        index.heap_tids.append(new_tids[i])
        assert len(index.elements) == index.store.count

    for eid in changed:
        if index.elements[eid].deleted:
            continue
        old_ver = index.elements[eid].version
        repl = lists_from_arrays(eid)
        repl.version = old_ver
        index.elements[eid] = repl

    entry = int(np.asarray(builder.arrays.entry))
    index.entry = entry if entry >= 0 else None
    index.stats["inserts"] += n_new
    index._invalidate_device()
    if index._log is not None:
        if not isinstance(arr, np.ndarray):
            arr = np.asarray(arr)  # append log stores host rows
        with index._log.batch():  # group commit: one fsync per bulk
            for row, tid in zip(arr, kept_tids):
                index._log.record_insert(row, tid)
    return sum(1 for t in new_tids if t)


@functools.partial(jax.jit, static_argnames=("w",))
def _pack_words_device(vectors, w: int):
    """[n1, D] f32 0/1 rows -> [n1, w] uint32 words, MSB-first within
    each word (the ops/bits.pack_bits layout). Runs on device so a
    bit-index build never re-uploads its rows for the serving graph."""
    n1, d = vectors.shape
    pad = w * 32 - d
    b = (vectors > 0.5).astype(jnp.uint32)
    if pad:
        b = jnp.pad(b, ((0, 0), (0, pad)))
    shifts = 31 - jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(
        b.reshape(n1, w, 32) << shifts[None, None, :],
        axis=-1,
        dtype=jnp.uint32,
    )


def _emit_plan(first_tids):
    """(device ft column, seq_base) for _emit_tables_device: sequential
    ranges (the default ids=range(n) case) need ZERO upload (iota);
    otherwise the [n] first-TID column uploads once and is reused."""
    ft = np.asarray(first_tids, dtype=np.int64)
    seq = None
    if len(ft) and np.array_equal(
        ft, np.arange(ft[0], ft[0] + len(ft), dtype=np.int64)
    ):
        seq = int(ft[0])
    arg = (
        jnp.zeros((1,), jnp.int32)
        if seq is not None
        else jnp.asarray(ft.astype(np.int32))
    )
    return arg, seq


def _warm_finalize_programs(builder, first_tids, bit_w: int = 0) -> None:
    """Trace/compile/load the serving-finalize programs while the
    device is still executing the enqueued build groups. Through the
    tunneled backend each DISTINCT program pays a multi-second one-time
    host-side load at first dispatch (measured: 9.4s for this pair at
    1M rows) — issuing discarded warm calls here overlaps that load
    with build compute, and the real finalize then hits the jit cache.
    Both programs are pure (no donation), so the extra device work is
    a few scatter/slice kernels."""
    ft_arg, seq = _emit_plan(first_tids)
    builder._finalize_plan = (ft_arg, seq)
    _emit_tables_device(
        builder.arrays.absorb,
        builder.arrays.tid_counts,
        ft_arg,
        cap1=builder.cap + 1,
        seq_base=seq,
    )
    _ids_views_jit(
        builder.arrays.nb0c,
        builder.arrays.upc,
        builder.lm0,
        builder.lmax * builder.m,
    )
    if bit_w:
        _pack_words_device(builder.vectors, w=bit_w)


@functools.partial(jax.jit, static_argnames=("cap1", "seq_base"))
def _emit_tables_device(absorb, counts, tids_i32, cap1: int,
                        seq_base: int | None):
    """emit_tid [cap+1] derived on device: an element emits its first
    TID unless it was absorbed into a duplicate target or never got a
    TID. ``seq_base`` (sequential range ids — the common case) builds
    the TID column with iota, ZERO upload; otherwise ``tids_i32`` is
    the uploaded [n] first-TID column."""
    if seq_base is not None:
        col = jnp.arange(cap1, dtype=jnp.int32) + seq_base
    else:
        col = jnp.full((cap1,), -1, jnp.int32)
        col = jax.lax.dynamic_update_slice(col, tids_i32, (0,))
    return jnp.where((absorb < 0) & (counts > 0), col, -1)


@functools.partial(jax.jit, static_argnames=("dt", "d"))
def _compact_values_jit(v32, dt, d=None):
    """Compact serve-dtype values + x2 from the ROUNDED rows in ONE
    program (the f32 upcast fuses into the reduce — no [cap, D] f32
    transient). ``d``: static column slice — drops an ip-augmentation
    column (DESIGN 6t) with the slice fused into the cast, so the
    un-augmented f32 rows never materialize."""
    if d is not None:
        v32 = v32[:, :d]
    v = v32.astype(dt)
    vf = v.astype(jnp.float32)
    return v, jnp.sum(vf * vf, axis=1)


@functools.partial(jax.jit, static_argnames=("d",))
def _slice_serve_jit(v32, d):
    """Original-row serving values + x2 from an ip-augmented build
    buffer (drop the augmentation column, DESIGN 6t)."""
    v = v32[:, :d]
    return v, jnp.sum(v * v, axis=1)


@functools.partial(jax.jit, static_argnames=("d",))
def _slice_cols_jit(v, d):
    return v[:, :d]


@jax.jit
def _augment_ip_device(v):
    """MIPS -> sphere-l2 build geometry (DESIGN 6t): append
    sqrt(M^2 - |x|^2) so every row lands on the radius-M sphere, where
    squared l2 = 2M^2 - 2<x',y'> is a true metric and Algorithm-4
    neighbor selection behaves. Query-time ip ranking is EXACTLY
    preserved: for q' = [q; 0], augmented-l2 order == ip order."""
    x2 = jnp.sum(v * v, axis=1, keepdims=True)
    m2 = jnp.max(x2)
    aug = jnp.sqrt(jnp.maximum(m2 - x2, 0.0))
    out = jnp.concatenate([v, aug], axis=1)
    # zero-pad to the next lane multiple: an odd width (1025) flips
    # XLA's matmul-operand layout choice and it materializes a
    # TRANSPOSED full-corpus copy inside the build program (measured:
    # +5.04G col-major f32 + 2.52G col-major bf16 at 1.25M x 1025 —
    # OOM on a 16G chip); zero columns are distance-neutral
    lane_pad = (-out.shape[1]) % 128
    if lane_pad:
        out = jnp.pad(out, ((0, 0), (0, lane_pad)))
    return out


def _device_graph_from_builder(index, builder: DeviceBuilder, heap_tids,
                               first_tids=None):
    """Build a DeviceGraph directly from the builder's device arrays
    (no per-element host objects; see bulk_build(host_graph=False))."""
    from .device import DeviceGraph

    n = builder.cap
    if first_tids is not None:
        # device fast path: TID counts already live in the builder
        # arrays; emit_tid derives from the first-TID column — an iota
        # when the TIDs are sequential (the default ids=range(n) case,
        # zero upload), else one [n] int32 upload
        plan = getattr(builder, "_finalize_plan", None)
        ft_arg, seq = plan if plan is not None else _emit_plan(first_tids)
        emit_tid = _emit_tables_device(
            builder.arrays.absorb,
            builder.arrays.tid_counts,
            ft_arg,
            cap1=n + 1,
            seq_base=seq,
        )
        tid_count = builder.arrays.tid_counts
    else:
        emit_tid = np.full(n + 1, -1, dtype=np.int32)
        tid_count = np.zeros(n + 1, dtype=np.int32)
        for i, tids in enumerate(heap_tids):
            tid_count[i] = len(tids)
            if tids:
                emit_tid[i] = tids[0]
    # serving gathers want contiguous id-only rows: slice the id prefix
    # out of the packed build arrays once (one program per build)
    nb0_ids, up_ids = _ids_views_jit(
        builder.arrays.nb0c,
        builder.arrays.upc,
        builder.lm0,
        builder.lmax * builder.m,
    )
    # everything else the graph needs from BuildArrays, captured by
    # reference; then drop the packed/ivf build state BEFORE the value
    # conversion below — at 12.5M rows the compact-dtype cast needs
    # its output's HBM (3.35 GB bf16) and the packed nb0c/upc/members
    # (~4 GB) are pure garbage at this point (measured OOM otherwise)
    entry_i = int(np.asarray(builder.arrays.entry))
    entry_l = int(np.asarray(builder.arrays.entry_level))
    traversable = builder.arrays.alive
    builder.arrays = None
    gc.collect()
    if index.kind == "bit":
        # the builder worked on unpacked {0,1} f32 rows (hamming == l2);
        # the serving graph wants packed words — pack on device, no
        # host round-trip
        value_kwargs = dict(
            words=_pack_words_device(
                builder.vectors, w=(index.dim + 31) // 32
            )
        )
    else:
        from .device import _serve_dtype_for, _serve_value_arrays

        serve_dtype = _serve_dtype_for(index)
        sd = getattr(builder, "serve_slice_dim", None)
        if sd is not None and serve_dtype == jnp.float32:
            # ip-augmented build (DESIGN 6t): serving rows are the
            # original vectors — slice the augmentation column off and
            # recompute x2 (the build x2 is the constant M^2 sphere)
            v_s, x2_s = _slice_serve_jit(builder.vectors, sd)
            value_kwargs = dict(
                values=v_s,
                x2=x2_s,
                values_bf16=_slice_cols_jit(builder.data.vectors_bf16, sd),
            )
        elif serve_dtype == jnp.float32:
            value_kwargs = dict(
                values=builder.vectors,
                x2=builder.data.x2,
                values_bf16=builder.data.vectors_bf16,
            )
        else:
            # dtype-native serving (VERDICT r1 #6): ONE compact value
            # array + f32 x2 derived from the rounded rows. Fused in
            # one program: device._serve_value_arrays's two-call
            # astype(dt) -> astype(f32) roundtrip materialized a
            # second FULL f32 copy (5.4 GB at 1.25M x 1024) and OOMed
            # the halfvec per-chip-shard finalize; here the f32 cast
            # fuses into the x2 reduce and never materializes.
            v_c, x2_c = _compact_values_jit(builder.vectors, serve_dtype,
                                            d=sd)
            value_kwargs = dict(values=v_c, x2=x2_c, values_bf16=None)
    return DeviceGraph(
        kind=index.kind,
        metric=index.metric,
        cap=n,
        m=index.params.m,
        entry=entry_i,
        entry_level=entry_l,
        neighbors0=nb0_ids,
        upper_neighbors=up_ids,
        upper_slot=builder.upper_slot,
        levels=builder.levels,
        traversable=traversable,
        emit_tid=jnp.asarray(emit_tid),
        tid_count=jnp.asarray(tid_count),
        **value_kwargs,
    )
