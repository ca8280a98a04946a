"""Pallas fused brute-force k-NN kernel (exact search / FlatIndex hot op).

The exact-scan path computes query-base scores and a top-k in one fused
kernel instead of XLA's materialize-[B,N]-then-top_k: scores for one
(query-tile, base-tile) pair come off the MXU, and a running top-k per
query lives in VMEM scratch across base tiles (the grid's inner
dimension), so the [B, N] score matrix never touches HBM. This is the
TPU-KNN formulation (PAPERS.md) of pgvector's seqscan ordering.

Selection is exact: K passes of (row-min, mask) extract the tile's best
K, then K more passes merge them into the running best — O(K·TN) VPU
work per tile, negligible next to the MXU matmul.

For ranking, L2 uses the monotone surrogate ||x||^2 - 2 q.x (dropping
the per-query ||q||^2); callers add q2 back for true distances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = float(3.0e38)


_INT_BIG = np.int32(2**31 - 1)


def _topk_kernel(q_ref, x_ref, x2_ref, out_d_ref, out_i_ref, k: int, tn: int):
    """Grid = (B tiles, N tiles); N is innermost so the running top-k in
    out_d_ref/out_i_ref (indexed by the query tile only) accumulates.

    Leftmost-argmin / worst-slot selection use iota-min tricks (min over
    `where(cond, iota, INT_MAX)`) — Mosaic has no cumsum lowering.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_d_ref[:] = jnp.full_like(out_d_ref, _NEG_BIG)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    # scores [TB, TN]: ||x||^2 - 2 q.x  (monotone in true l2 distance;
    # with x2 == 0 this is -2 q.x, monotone in the IP order distance)
    qx = jax.lax.dot_general(
        q_ref[:],
        x_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = x2_ref[:] - 2.0 * qx  # x2 [1, TN] broadcasts

    base_col = j * tn
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base_col
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, out_d_ref.shape, 1)

    # K-pass extraction + merge with the running best
    cur_d = out_d_ref[:]
    cur_i = out_i_ref[:]
    for _ in range(k):
        m = jnp.min(scores, axis=1, keepdims=True)  # [TB, 1]
        is_min = scores == m
        # leftmost argmin via iota-min
        pick_col = jnp.min(
            jnp.where(is_min, col_ids, _INT_BIG), axis=1, keepdims=True
        )
        pick = col_ids == pick_col
        # replace the current worst slot if the tile min beats it
        worst = jnp.max(cur_d, axis=1, keepdims=True)
        worst_slot = jnp.min(
            jnp.where(cur_d == worst, slot_ids, _INT_BIG), axis=1, keepdims=True
        )
        take = (m < worst) & (slot_ids == worst_slot)
        cur_d = jnp.where(take, jnp.broadcast_to(m, cur_d.shape), cur_d)
        cur_i = jnp.where(take, jnp.broadcast_to(pick_col, cur_i.shape), cur_i)
        # knock the extracted score out of the tile
        scores = jnp.where(pick, _NEG_BIG, scores)
    out_d_ref[:] = cur_d
    out_i_ref[:] = cur_i


@functools.partial(
    jax.jit, static_argnames=("k", "use_x2", "tb", "tn", "interpret")
)
def _surrogate_topk(
    base: jax.Array,  # [N, D]
    queries: jax.Array,  # [B, D]
    k: int,
    use_x2: bool,
    tb: int,
    tn: int,
    interpret: bool,
):
    """Run the fused kernel on surrogate scores.

    use_x2=True: score = ||x||^2 - 2 q.x (monotone in squared l2).
    use_x2=False: score = -2 q.x (monotone in -dot, the IP order
    distance; with pre-normalized inputs also monotone in cosine
    distance). Returns (scores [B,k], ids [B,k]) sorted ascending.
    """
    n, d = base.shape
    b = queries.shape[0]
    pb = (-b) % tb
    pn = (-n) % tn
    q = jnp.pad(queries.astype(jnp.float32), ((0, pb), (0, 0)))
    x = jnp.pad(base.astype(jnp.float32), ((0, pn), (0, 0)))
    if use_x2:
        x2 = jnp.sum(x * x, axis=1)[None, :]
    else:
        x2 = jnp.zeros((1, x.shape[0]), jnp.float32)
    # padded base rows must never win
    if pn:
        x2 = x2.at[0, n:].set(_NEG_BIG)

    grid = (q.shape[0] // tb, x.shape[0] // tn)
    out_d, out_i = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], k), jnp.int32),
        ],
        interpret=interpret,
    )(q, x, x2)

    out_d = out_d[:b]
    out_i = out_i[:b]
    sd, si = jax.lax.sort(
        [jnp.where(out_i >= 0, out_d, jnp.inf), out_i], num_keys=1
    )
    return sd, si


def l2_topk(
    base: jax.Array,  # [N, D] f32
    queries: jax.Array,  # [B, D] f32
    k: int,
    tb: int = 128,
    tn: int = 2048,
    interpret: bool = False,
):
    """Exact k nearest (squared-l2) -> (dists [B,k], ids [B,k]), sorted."""
    sd, si = _surrogate_topk(base, queries, k, True, tb, tn, interpret)
    # surrogate -> true squared distance
    q2 = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    true_d = jnp.where(si >= 0, jnp.maximum(sd + q2, 0.0), jnp.inf)
    return true_d, si


def ip_topk(base, queries, k: int, tb: int = 128, tn: int = 2048,
            interpret: bool = False):
    """Exact k largest inner products -> IP order distances (-dot) + ids."""
    sd, si = _surrogate_topk(base, queries, k, False, tb, tn, interpret)
    return jnp.where(si >= 0, sd * 0.5, jnp.inf), si


def cosine_topk(base_normed, queries_normed, k: int, tb: int = 128,
                tn: int = 2048, interpret: bool = False):
    """Exact k nearest by cosine distance over PRE-NORMALIZED rows."""
    sd, si = _surrogate_topk(base_normed, queries_normed, k, False, tb, tn,
                             interpret)
    d = 1.0 + jnp.clip(sd * 0.5, -1.0, 1.0)
    return jnp.where(si >= 0, d, jnp.inf), si


# ---------------------------------------------------------------------------
# Fused binned-min sweep (the approx serving engine's speed-of-light path)
# ---------------------------------------------------------------------------


def _binned_kernel(q_ref, x_ref, a_ref, out_d_ref, out_i_ref, *, tn: int):
    """Grid = (B tiles, N tiles), N innermost. One MXU matmul scores the
    (query-tile, corpus-tile) pair; a running per-BIN min lives in the
    out refs (indexed by the query tile only), bin = column position
    within the tile. Unlike the exact K-pass kernel above, selection is
    THREE VPU passes per tile (compare / min / id-select), so the whole
    sweep runs at the corpus-streaming bound instead of XLA's
    materialize-[B,N]-then-approx_min_k (whose score traffic is the
    measured serving bottleneck at 1M rows). Losses are bin collisions
    only: two true top-k rows landing in the same bin keep the nearer
    one — E[recall@k] ~ 1 - (k-1)/(2·tn), i.e. 0.996 at k=10, tn=1024
    (same regime as lax.approx_min_k, PAPERS.md TPU-KNN).

    ``a_ref`` [1, tn] is the per-row additive term: ||x||^2 for l2 (0
    for ip/cosine) plus a large penalty on masked/dead/pad rows; scores
    are the monotone surrogate a - 2 q.x.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_d_ref[:] = jnp.full_like(out_d_ref, jnp.inf)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    qx = jax.lax.dot_general(
        q_ref[:],
        x_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = a_ref[:] - 2.0 * qx  # [tb, tn]

    cur_d = out_d_ref[:]
    cur_i = out_i_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, cur_d.shape, 1) + j * tn
    take = scores < cur_d
    out_d_ref[:] = jnp.where(take, scores, cur_d)
    out_i_ref[:] = jnp.where(take, col, cur_i)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tb", "tn", "interpret")
)
def binned_sweep_topk(
    base,  # [N, D] bf16 (or f32) corpus rows
    a,  # [N] f32: x2 (l2) or 0 (ip/cosine), +penalty on excluded rows
    queries,  # [B, D] f32
    k: int,
    metric: str,  # "l2" | "ip" | "cosine"
    tb: int = 256,
    tn: int = 1024,
    interpret: bool = False,
):
    """Fused bf16 sweep + binned top-k -> (order dists [B,k], ids [B,k]).

    Scoring matches the XLA approx engine (bf16 operands, f32
    accumulation, f32 x2/q2 restore); selection is tn-binned min with
    ~(k-1)/(2·tn) expected recall loss. Excluded rows must carry
    a >= _NEG_BIG; their ids come back as -1 with inf distance.
    """
    n, d = base.shape
    b = queries.shape[0]
    pb = (-b) % tb
    pn = (-n) % tn
    pd = (-d) % 128
    q32 = jnp.pad(queries.astype(jnp.float32), ((0, pb), (0, pd)))
    q = q32.astype(jnp.bfloat16)
    x = jnp.pad(base.astype(jnp.bfloat16), ((0, pn), (0, pd)))
    av = jnp.pad(
        a.astype(jnp.float32), (0, pn), constant_values=_NEG_BIG
    )[None, :]

    grid = (q.shape[0] // tb, x.shape[0] // tn)
    dp = d + pd
    out_d, out_i = pl.pallas_call(
        functools.partial(_binned_kernel, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, tn), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tn), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], tn), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], tn), jnp.int32),
        ],
        interpret=interpret,
    )(q, x, av)

    neg, slot = jax.lax.top_k(-out_d[:b], k)  # [b, k] over the tn bins
    sd = -neg
    si = jnp.take_along_axis(out_i[:b], slot, axis=1)
    bad = (sd >= _NEG_BIG * 0.5) | (si < 0)
    if metric == "l2":
        q2 = jnp.sum(q32[:b, :] * q32[:b, :], axis=1, keepdims=True)
        true_d = jnp.maximum(sd + q2, 0.0)
    elif metric == "ip":
        true_d = sd * 0.5
    else:  # cosine over pre-normalized rows
        true_d = 1.0 + jnp.clip(sd * 0.5, -1.0, 1.0)
    return jnp.where(bad, jnp.inf, true_d), jnp.where(bad, -1, si)


# ---------------------------------------------------------------------------
# Packed tile-min sweep (streaming-selection experiment, DESIGN.md §7d)
# ---------------------------------------------------------------------------


def _tilemin_kernel(q_ref, x_ref, a_ref, out_ref, *, tn: int):
    """Grid = (B tiles, N tiles). Each step emits ONE packed int32 per
    (query, corpus-tile): the tile's min score with the winning column
    OR-ed into the mantissa's low 10 bits.

    The selection epilogue is the measured bound of the approx sweep
    (DESIGN.md 6e), so this kernel spends the absolute minimum VPU work
    per score element: assemble (1 op) + OR col (1 op) + min-reduce
    (~1 op). Scores arrive pre-shifted POSITIVE (a' = a + shift), so
    their f32 bit patterns order like ints and one integer min carries
    the id along. OR-ing without clearing the low bits perturbs
    ranking only on ties at ~13-bit mantissa resolution — the same
    regime as bf16 scoring noise, and the final [B, k] columns are
    exact-rescored anyway.

    Output block is [tb, 1] per grid step (no running [tb, tn] VMEM
    rewrite like the binned kernel — that write traffic was half its
    per-element cost).
    """
    qx2 = jax.lax.dot_general(
        q_ref[:],  # pre-scaled by 2: dot yields 2 q.x
        x_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = a_ref[:] - qx2  # [tb, tn], > 0 by the caller's shift
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    # clear the mantissa's low 10 bits (id field) before OR-ing the
    # column in: the min must carry a CLEAN id. Quantizes scores to
    # ~13 mantissa bits — under bf16 scoring noise, and the final
    # [B, k] columns are exact-rescored by the engine anyway.
    packed = (
        jax.lax.bitcast_convert_type(scores, jnp.int32)
        & jnp.int32(~0x3FF)
    ) | col
    # out block is [1, tb] (tile-major): minor dim = tb keeps the
    # write lane-aligned; the caller transposes once at the end
    out_ref[:] = jnp.min(packed, axis=1)[None, :]


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tb", "tn", "interpret")
)
def tilemin_sweep_topk(
    base,  # [N, D] bf16 (or f32) corpus rows
    a,  # [N] f32: x2 (l2) or 0 (ip/cosine), +inf/big on excluded rows
    queries,  # [B, D] f32
    k: int,
    metric: str,  # "l2" | "ip" | "cosine"
    tb: int = 256,
    tn: int = 1024,
    interpret: bool = False,
):
    """Fused bf16 sweep + per-tile packed min -> (order dists, ids).

    One winner per tn-row corpus tile (selection loss ~ (k-1)/(2·N/tn),
    the binned kernel's regime with bins = tiles); the [B, N/tn] packed
    mins reduce with one small top_k, and callers exact-rescore the
    final [B, k] columns (engine contract). Excluded rows must carry
    a >= _NEG_BIG.
    """
    n, d = base.shape
    b = queries.shape[0]
    pb = (-b) % tb
    pn = (-n) % tn
    pd = (-d) % 128
    q32 = jnp.pad(queries.astype(jnp.float32), ((0, pb), (0, pd)))
    q = (2.0 * q32).astype(jnp.bfloat16)  # fold the 2x into the operand
    x = jnp.pad(base.astype(jnp.bfloat16), ((0, pn), (0, pd)))
    # shift scores positive: |2 q.x| <= q2 + x2 elementwise-bounded
    x2 = jnp.sum(
        x.astype(jnp.float32) * x.astype(jnp.float32), axis=1
    )
    q2 = jnp.sum(q32 * q32, axis=1)
    shift = jnp.max(x2) + jnp.max(q2) + 1.0
    af = jnp.pad(a.astype(jnp.float32), (0, pn), constant_values=_NEG_BIG)
    # keep the big-penalty sentinel: shifted dead rows stay >= _NEG_BIG
    av = jnp.where(af >= _NEG_BIG * 0.5, af, af + shift)[None, :]

    grid = (q.shape[0] // tb, x.shape[0] // tn)
    nc = x.shape[0] // tn
    dp = d + pd
    packed = pl.pallas_call(
        functools.partial(_tilemin_kernel, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, q.shape[0]), jnp.int32),
        interpret=interpret,
    )(q, x, av)
    packed = packed.T  # [qpad, nc]

    kk = min(k, nc)
    neg, slot = jax.lax.top_k(-packed[:b], kk)  # smallest packed ints
    v = -neg
    sd = jax.lax.bitcast_convert_type(v & ~jnp.int32(0x3FF), jnp.float32)
    sd = sd - shift
    si = slot * tn + (v & jnp.int32(0x3FF))
    bad = (sd >= _NEG_BIG * 0.5) | (si >= n)
    if kk < k:
        padk = k - kk
        sd = jnp.pad(sd, ((0, 0), (0, padk)), constant_values=jnp.inf)
        si = jnp.pad(si, ((0, 0), (0, padk)), constant_values=-1)
        bad = jnp.pad(bad, ((0, 0), (0, padk)), constant_values=True)
    if metric == "l2":
        q2b = q2[:b, None]
        true_d = jnp.maximum(sd + q2b, 0.0)
    elif metric == "ip":
        true_d = sd * 0.5
    else:  # cosine over pre-normalized rows
        true_d = 1.0 + jnp.clip(sd * 0.5, -1.0, 1.0)
    return jnp.where(bad, jnp.inf, true_d), jnp.where(bad, -1, si)


def available() -> bool:
    """True when the current default backend can run the compiled kernel."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
