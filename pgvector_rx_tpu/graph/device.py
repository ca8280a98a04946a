"""Device (JAX/XLA) HNSW graph: flat arrays + batched beam search.

This is the TPU-native replacement for the reference's page-at-a-time
on-disk search (scan.rs:302-448): the graph lives in HBM as

- ``neighbors0 [cap+1, 2M] int32``  — ground-layer adjacency, -1 padded
  (the hot array; one row per element, analog of the layer-0 slots of
  the neighbor tuple, types/hnsw.rs:152-169)
- ``upper_neighbors [U, LMAX*M] int32`` — compacted upper layers, layer
  slices flattened into the row (a trailing dim of M would tile to
  T(8,128) on TPU and pad the minor dim 8x — 14x memory blowup); only
  ~N/M elements have level >= 1 (P(level>=1) = 1/M under the geometric
  level rule, hnsw_constants.rs:132), so upper layers are stored
  separately from the hot ground layer
- ``upper_slot [cap+1] int32`` — element id -> row in upper_neighbors
- value arrays per kind (dense rows / packed bit words / padded CSR)
- ``traversable [cap+1] bool`` — live (not vacuum-deleted) elements
- ``emit_tid [cap+1] int64`` / ``tid_count [cap+1] int32`` — first heap
  TID and TID count per element (duplicate handling, 10-TID cap)

Search is a batched multi-query beam: each step expands the best
unexpanded beam member, gathers its <=2M neighbors, computes distances
in one fused gather+dot, and merges via a single sort — HNSW Algorithm 2
restructured as fixed-shape tensor ops (the TPU-KNN "beam with masking"
formulation). Termination matches graph/mod.rs:186-192: stop when the
nearest unexpanded candidate is farther than the furthest result.
Everything is jit-compiled; per-query control flow uses lax.while_loop
(vmapped, so finished queries freeze while stragglers run).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import hnsw_get_layer_m
from ..utils.jaxcache import enable as _enable_jax_cache

_enable_jax_cache()

_INT_MAX = np.int32(2**31 - 1)

#: dense-query gather formulation cap for sparse beam serving (matches
#: ops/sparse.DENSE_Q_MAX_DIM but is independently overridable)
_SPARSE_DENSE_Q_MAX_DIM = int(
    os.environ.get("PGV_SPARSE_DENSEQ_MAX", 1 << 20)
)


#: serving value-array dtype policy (VERDICT r1 #6 — dtype-native
#: serving). "auto": halfvec indexes store ONE f16 array (2 B/dim —
#: the reference scores the f16-STORED value, so f32-computed
#: distances over f16 rows are exactly its semantics), f32 indexes
#: keep f32 + a bf16 sweep copy (6 B/dim, exact distances).
#: "bf16": store ONE bf16 array for ANY dense index (2 B/dim; the
#: "exact" engine then returns distances exact w.r.t. the bf16-rounded
#: stored value — what makes 10M x 1024-d fit a 16 GB chip).
#: "f32": force the full-precision pair everywhere.
def _serve_dtype_for(index):
    # read at call time (graph construction, not a hot path) so tests
    # and serving configs can toggle without reimporting
    mode = os.environ.get("PGV_SERVE_DTYPE", "auto")
    if mode == "bf16":
        return jnp.bfloat16
    if mode == "f16":
        return jnp.float16
    if mode == "f32":
        return jnp.float32
    # auto: follow the index's stored dtype
    if index.kind == "dense" and index.dtype == np.float16:
        return jnp.float16
    return jnp.float32


def _serve_value_arrays(v32, serve_dtype):
    """(values, x2, values_bf16) under the dtype policy. ``v32`` is the
    padded [cap+1, D] f32 row matrix; compact dtypes store one array
    and derive x2 from the STORED (rounded) values so l2 order scores
    match what a gather-rescore of those rows would produce."""
    if serve_dtype == jnp.float32:
        return dict(
            values=v32,
            x2=jnp.sum(v32 * v32, axis=1),
            values_bf16=v32.astype(jnp.bfloat16),
        )
    v = v32.astype(serve_dtype)
    vf = v.astype(jnp.float32)
    return dict(values=v, x2=jnp.sum(vf * vf, axis=1), values_bf16=None)


@dataclass
class DeviceGraph:
    """Flat-array mirror of a host index (device-resident, immutable)."""

    kind: str
    metric: str
    cap: int  # number of element slots (arrays padded to cap+1)
    m: int
    entry: int  # -1 if empty
    entry_level: int
    neighbors0: jax.Array  # [cap+1, 2M] int32
    upper_neighbors: jax.Array  # [U, LMAX*M] int32 (layer-major flat)
    upper_slot: jax.Array  # [cap+1] int32
    levels: jax.Array  # [cap+1] int32
    traversable: jax.Array  # [cap+1] bool
    emit_tid: jax.Array  # [cap+1] int32 (device fast path caps TIDs at 2^31)
    tid_count: jax.Array  # [cap+1] int32
    # value arrays (dense: values; bit: words; sparse: sp_indices/sp_values)
    values: jax.Array | None = None
    words: jax.Array | None = None
    sp_indices: jax.Array | None = None
    sp_values: jax.Array | None = None
    # serving-engine caches (dense): per-row ||x||^2 and a bf16 copy so
    # the exact/approx sweeps don't recompute/recast the corpus per call
    x2: jax.Array | None = None
    values_bf16: jax.Array | None = None

    @classmethod
    def from_index(cls, index) -> "DeviceGraph":
        n = len(index.elements)
        serve_dtype = _serve_dtype_for(index)
        m = index.params.m
        lm0 = hnsw_get_layer_m(m, 0)

        neighbors0 = np.full((n + 1, lm0), -1, dtype=np.int32)
        levels = np.full(n + 1, -1, dtype=np.int32)
        traversable = np.zeros(n + 1, dtype=bool)
        emit_tid = np.full(n + 1, -1, dtype=np.int32)
        tid_count = np.zeros(n + 1, dtype=np.int32)

        upper_rows = []
        upper_slot = np.full(n + 1, -1, dtype=np.int32)
        lmax = max((e.level for e in index.elements), default=0)
        lmax = max(lmax, 1)

        for i, e in enumerate(index.elements):
            levels[i] = e.level
            traversable[i] = not e.deleted
            tids = index.heap_tids[i]
            tid_count[i] = len(tids)
            if tids:
                emit_tid[i] = tids[0]
            if e.deleted:
                continue
            l0 = e.neighbors[0] if e.neighbors else []
            for j, (_, nid) in enumerate(l0[:lm0]):
                neighbors0[i, j] = nid
            if e.level >= 1:
                upper_slot[i] = len(upper_rows)
                row = np.full(lmax * m, -1, dtype=np.int32)
                for lc in range(1, e.level + 1):
                    for j, (_, nid) in enumerate(e.neighbors[lc][:m]):
                        row[(lc - 1) * m + j] = nid
                upper_rows.append(row)

        upper_neighbors = (
            np.stack(upper_rows)
            if upper_rows
            else np.full((1, lmax * m), -1, dtype=np.int32)
        )

        kwargs = {}
        if index.kind == "dense":
            vals = np.zeros((n + 1, index.dim), dtype=np.float32)
            vals[:n] = index.store.rows[:n].astype(np.float32)
            v = jnp.asarray(vals)
            kwargs.update(_serve_value_arrays(v, serve_dtype))
        elif index.kind == "bit":
            from ..ops.bits import pack_bits

            bits_unpacked = np.unpackbits(index.store.rows[:n], axis=1)
            words = pack_bits(bits_unpacked) if n else np.zeros((0, 1), np.uint32)
            w = words.shape[1] if n else (index.dim + 31) // 32
            padded = np.zeros((n + 1, w), dtype=np.uint32)
            if n:
                padded[:n] = words
            kwargs["words"] = jnp.asarray(padded)
        else:
            si = np.full((n + 1, index.store.budget), _INT_MAX, dtype=np.int32)
            sv = np.zeros((n + 1, index.store.budget), dtype=np.float32)
            si[:n] = index.store.indices[:n]
            sv[:n] = index.store.values[:n]
            kwargs["sp_indices"] = jnp.asarray(si)
            kwargs["sp_values"] = jnp.asarray(sv)

        entry = index.entry if index.entry is not None else -1
        entry_level = (
            index.elements[index.entry].level if index.entry is not None else -1
        )
        return cls(
            kind=index.kind,
            metric=index.metric,
            cap=n,
            m=m,
            entry=entry,
            entry_level=entry_level,
            neighbors0=jnp.asarray(neighbors0),
            upper_neighbors=jnp.asarray(upper_neighbors),
            upper_slot=jnp.asarray(upper_slot),
            levels=jnp.asarray(levels),
            traversable=jnp.asarray(traversable),
            emit_tid=jnp.asarray(emit_tid),
            tid_count=jnp.asarray(tid_count),
            **kwargs,
        )


# ---------------------------------------------------------------------------
# Distance dispatch (single query row vs a gathered id set)
# ---------------------------------------------------------------------------


#: beam-loop ranking in bf16 (half the gather bytes per candidate row;
#: exact f32 distances are restored by one final re-score of the beam).
#: Default OFF: measured qps-neutral at 128-d and slightly SLOWER at
#: 768-d (TPU v5e, 1M rows) — the loop is sort/latency-bound, not
#: gather-bound, so the extra cast+re-score doesn't pay for itself.
_BEAM_BF16 = os.environ.get("PGV_BEAM_BF16", "0") != "0"


def _dist_ids_rank(g: DeviceGraph, q, ids):
    """Ranking-only distances for the beam loop.

    Dense metrics gather the bf16 corpus copy when present — the loop
    is dominated by random row gathers from HBM (~25x below sequential
    bandwidth), so halving the row bytes roughly halves the step's
    memory time. bf16 rounding only perturbs candidate ORDER; callers
    re-score the surviving beam exactly once after the loop.
    """
    if (
        _BEAM_BF16
        and g.kind == "dense"
        and g.values_bf16 is not None
        and g.metric != "l1"  # l1 accumulates many small terms
    ):
        safe = jnp.clip(ids, 0, g.cap)
        cand = g.values_bf16[safe]
        qb = q.astype(jnp.bfloat16)
        if g.metric == "l2":
            d = (cand - qb).astype(jnp.float32)
            return jnp.sum(d * d, axis=-1)
        dots = jnp.sum(
            (cand * qb).astype(jnp.float32), axis=-1
        )
        if g.metric == "ip":
            return -dots
        return 1.0 - jnp.clip(dots, -1.0, 1.0)  # cosine
    return _dist_ids(g, q, ids)


def _rank_is_approx(g: DeviceGraph) -> bool:
    return (
        _BEAM_BF16
        and g.kind == "dense"
        and g.values_bf16 is not None
        and g.metric != "l1"
    )


def _dist_ids(g: DeviceGraph, q, ids):
    """Order-distances from one query to graph rows `ids` (any shape)."""
    safe = jnp.clip(ids, 0, g.cap)
    if g.kind == "dense":
        cand = g.values[safe]
        if g.metric == "l2":
            d = cand - q
            return jnp.sum(d * d, axis=-1)
        dots = jnp.sum(cand * q, axis=-1)
        if g.metric == "ip":
            return -dots
        if g.metric == "cosine":
            return 1.0 - jnp.clip(dots, -1.0, 1.0)
        if g.metric == "l1":
            return jnp.sum(jnp.abs(cand - q), axis=-1)
    if g.kind == "bit":
        cand = g.words[safe]
        xor_pop = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(cand, q)), axis=-1
        ).astype(jnp.float32)
        if g.metric == "hamming":
            return xor_pop
        ab = jnp.sum(
            jax.lax.population_count(jnp.bitwise_and(cand, q)), axis=-1
        ).astype(jnp.float32)
        aa = jnp.sum(jax.lax.population_count(q), axis=-1).astype(jnp.float32)
        bb = jnp.sum(jax.lax.population_count(cand), axis=-1).astype(jnp.float32)
        union = aa + bb - ab
        return jnp.where(ab == 0.0, 1.0, 1.0 - ab / jnp.where(union > 0, union, 1.0))
    if g.kind == "sparse":
        if len(q) == 3:  # (qi, qv, densified query row)
            qi, qv, qd = q
            ci = g.sp_indices[safe]
            cv = g.sp_values[safe]
            return _sparse_dist_dense(g.metric, qd, qv, ci, cv)
        qi, qv = q
        ci = g.sp_indices[safe]
        cv = g.sp_values[safe]
        return _sparse_dist(g.metric, qi, qv, ci, cv)
    raise ValueError(f"bad kind {g.kind}")


def _sparse_dist_dense(metric, qd, qv, ci, cv):
    """Sparse order-distances via the dense-query gather formulation.

    ``qd [dim+1]`` is the query scattered dense (slot ``dim`` = dummy 0
    for pads); the matched query value for every candidate entry is one
    gather ``qd[ci]`` — entries the query lacks read 0, which zeroes
    exactly the terms the reference's merge join skips
    (sparsevec.rs:875-1090). Replaces the per-candidate searchsorted
    (P log P VPU work per pair) on the beam path; same trick as
    ops/sparse.pairwise_dense_q for the exact sweep.

    ci/cv [..., P]; qv [P] supplies ||q||^2 / |q| totals.
    """
    dim = qd.shape[0] - 1
    cvz = jnp.where(ci != _INT_MAX, cv, 0.0)
    g_q = qd[jnp.clip(ci, 0, dim)]  # [..., P] matched query values
    dot = jnp.sum(g_q * cvz, axis=-1)
    c_sq = jnp.sum(cvz * cvz, axis=-1)
    q_sq = jnp.sum(qv * qv)
    if metric == "l2":
        return jnp.maximum(q_sq + c_sq - 2.0 * dot, 0.0)
    if metric == "ip":
        return -dot
    if metric == "cosine":
        denom = jnp.sqrt(q_sq * c_sq)
        sim = jnp.where(denom > 0, dot / jnp.where(denom > 0, denom, 1.0), 0.0)
        return 1.0 - jnp.clip(sim, -1.0, 1.0)
    if metric == "l1":
        q_abs = jnp.sum(jnp.abs(qv))
        c_abs = jnp.sum(jnp.abs(cvz), axis=-1)
        corr = jnp.sum(
            jnp.abs(g_q - cvz) - jnp.abs(g_q) - jnp.abs(cvz), axis=-1
        )
        return q_abs + c_abs + corr
    raise ValueError(metric)


def _sparse_dist(metric, qi, qv, ci, cv):
    """Batched sparse order-distance; ci/cv [..., P], qi/qv [P]."""
    P = qi.shape[-1]

    def match(ci_row, cv_row):
        p = jnp.searchsorted(ci_row, qi)
        pc = jnp.minimum(p, P - 1)
        found = (p < P) & (ci_row[pc] == qi) & (qi != _INT_MAX)
        return jnp.where(found, cv_row[pc], 0.0), found

    flat_ci = ci.reshape(-1, P)
    flat_cv = cv.reshape(-1, P)
    mcv, found = jax.vmap(match)(flat_ci, flat_cv)
    dot = jnp.sum(qv[None, :] * mcv, axis=-1)
    c_sq = jnp.sum(flat_cv * flat_cv, axis=-1)
    q_sq = jnp.sum(qv * qv)
    if metric == "l2":
        out = jnp.maximum(q_sq + c_sq - 2.0 * dot, 0.0)
    elif metric == "ip":
        out = -dot
    elif metric == "cosine":
        denom = jnp.sqrt(q_sq * c_sq)
        sim = jnp.where(denom > 0, dot / jnp.where(denom > 0, denom, 1.0), 0.0)
        out = 1.0 - jnp.clip(sim, -1.0, 1.0)
    elif metric == "l1":
        q_abs = jnp.sum(jnp.abs(qv))
        c_abs = jnp.sum(jnp.abs(flat_cv), axis=-1)
        corr = jnp.sum(
            jnp.where(found, jnp.abs(qv[None, :] - mcv) - jnp.abs(qv[None, :]) - jnp.abs(mcv), 0.0),
            axis=-1,
        )
        out = q_abs + c_abs + corr
    else:
        raise ValueError(metric)
    return out.reshape(ci.shape[:-1])


# ---------------------------------------------------------------------------
# Batched beam search (jitted)
# ---------------------------------------------------------------------------


def _greedy_descent(g: DeviceGraph, q, entry_id, entry_dist, layer: int):
    """ef=1 greedy search at an upper layer (scan.rs:492-510 analog)."""

    def cond(state):
        _, _, moved = state
        return moved

    def body(state):
        cur, cur_d, _ = state
        slot = g.upper_slot[cur]
        off = (layer - 1) * g.m  # static per layer
        nbrs = jax.lax.dynamic_slice_in_dim(
            g.upper_neighbors[jnp.maximum(slot, 0)], off, g.m
        )  # [M]
        valid = (nbrs >= 0) & (slot >= 0) & g.traversable[jnp.clip(nbrs, 0, g.cap)]
        d = _dist_ids_rank(g, q, nbrs)
        d = jnp.where(valid, d, jnp.inf)
        best = jnp.argmin(d)
        best_d = d[best]
        moved = best_d < cur_d
        new_cur = jnp.where(moved, nbrs[best], cur)
        new_d = jnp.where(moved, best_d, cur_d)
        return new_cur, new_d, moved

    cur, cur_d, _ = jax.lax.while_loop(
        cond, body, (entry_id, entry_dist, jnp.bool_(True))
    )
    return cur, cur_d


def _ground_beam(
    g: DeviceGraph,
    q,
    entry_id,
    entry_dist,
    ef: int,
    max_steps: int,
    expand: int = 1,
):
    """Beam search at layer 0 from one entry (single query; vmapped).

    expand=1 reproduces the reference's Algorithm 2 expansion order
    exactly (graph/mod.rs:186-192); see :func:`_ground_beam_seeds`.
    """
    return _ground_beam_seeds(
        g, q, entry_id[None], entry_dist[None], ef, max_steps, expand
    )


#: beam corpora past this row count keep a per-query visited bitmap;
#: at or below it they dedup in-beam. Default 0 = ALWAYS dedup in-beam:
#: measured on TPU v5e at 1M x 128-d the [B, cap+1] bitmap's per-step
#: scatter+gather makes the beam 11-38x SLOWER (680 qps vs 26k at
#: ef=40) for identical recall — the bitmap only reproduces Algorithm
#: 2's exact no-re-expansion bookkeeping, which the in-beam dedup
#: approximates with bounded re-expansion waste. Set
#: PGV_BEAM_VISITED_MAX large to restore exact visited semantics.
_VISITED_MAX_ROWS = int(os.environ.get("PGV_BEAM_VISITED_MAX", 0))


def _ground_beam_seeds(
    g: DeviceGraph,
    q,
    seed_ids,  # [S] int32, -1 = unused slot
    seed_d,  # [S] f32
    ef: int,
    max_steps: int,
    expand: int = 1,
):
    """Beam search at layer 0 with beam size ef (single query; vmapped).

    ``expand`` > 1 pops the E best unexpanded candidates per step
    (multi-expansion beam): E x fewer sequential loop iterations at the
    cost of occasionally expanding a candidate strict best-first would
    have skipped — recall-neutral in practice and much faster on TPU,
    where the loop itself (not the expansion work) is the bottleneck.

    Multiple seeds (coarse-seeded serving) occupy the first S beam
    slots; invalid seeds (-1) are inert.

    Visited-set handling is corpus-size dependent (static): up to
    _VISITED_MAX_ROWS a per-query bitmap reproduces Algorithm 2's
    visited semantics exactly; above it the beam dedups by id during
    the merge (the expanded copy wins, so beam-resident nodes never
    re-expand — nodes that fall off the beam and return may re-expand,
    a bounded waste that keeps memory independent of corpus size).

    Returns (beam_d [ef], beam_ids [ef]) sorted nearest first + steps.
    """
    use_visited = (g.cap + 1) <= _VISITED_MAX_ROWS
    # packed beam key = id*2 + (1 - expanded), invalid slot = -2: one
    # int32 instead of separate id/expanded arrays, so both per-step
    # merge sorts are 2 operands instead of 3 (same trick as the build
    # descent beam, device_build._beam_ground_candidates — the sorts
    # are the measured hot spot of the loop). Needs id*2+1 < 2^31.
    assert g.cap < (1 << 30), "packed beam keys need cap < 2^30 rows"
    S = seed_ids.shape[0]
    ok = seed_ids >= 0
    seed_d = jnp.where(ok, seed_d, jnp.inf)
    beam_d = jnp.full((ef,), jnp.inf, dtype=jnp.float32).at[:S].set(seed_d)
    beam_key = jnp.full((ef,), -2, dtype=jnp.int32).at[:S].set(
        jnp.where(ok, seed_ids * 2 + 1, -2)
    )
    if use_visited:
        visited = jnp.zeros((g.cap + 1,), dtype=jnp.bool_).at[
            jnp.where(ok, seed_ids, g.cap)
        ].set(ok)
    else:
        visited = jnp.zeros((1,), dtype=jnp.bool_)  # unused placeholder

    def cond(state):
        beam_d, beam_key, visited, steps = state
        unexp_d = jnp.where(beam_key & 1 == 1, beam_d, jnp.inf)
        best = jnp.min(unexp_d)
        furthest = jnp.max(beam_d)  # inf while not full -> keep going
        return (best <= furthest) & jnp.isfinite(best) & (steps < max_steps)

    def body(state):
        beam_d, beam_key, visited, steps = state
        unexp_d = jnp.where(beam_key & 1 == 1, beam_d, jnp.inf)
        if expand == 1:
            pos = jnp.argmin(unexp_d)[None]  # [1]
        else:
            _, pos = jax.lax.top_k(-unexp_d, expand)  # [E] best unexpanded
        # only expand slots that are genuinely unexpanded & valid
        sel_valid = jnp.isfinite(unexp_d[pos])
        u = jnp.where(sel_valid, beam_key[pos] >> 1, -1)  # [E]
        beam_key = beam_key.at[pos].set(
            jnp.where(sel_valid, beam_key[pos] & ~1, beam_key[pos])
        )

        nbrs = g.neighbors0[jnp.maximum(u, 0)]  # [E, 2M]
        nbrs = jnp.where(sel_valid[:, None], nbrs, -1).reshape(-1)  # [E*2M]
        safe = jnp.clip(nbrs, 0, g.cap)
        mask = (nbrs >= 0) & g.traversable[safe]
        if use_visited:
            mask = mask & ~visited[safe]
            visited = visited.at[jnp.where(nbrs >= 0, nbrs, g.cap)].set(True)
        # dedupe duplicates inside this expansion batch: keep first hit
        if expand > 1:
            order = jnp.argsort(nbrs)
            srt = nbrs[order]
            dup = jnp.concatenate(
                [jnp.zeros((1,), bool), srt[1:] == srt[:-1]]
            )
            undup = jnp.zeros_like(mask).at[order].set(~dup)
            mask = mask & undup

        d_new = _dist_ids_rank(g, q, nbrs)
        d_new = jnp.where(mask, d_new, jnp.inf)
        key_new = jnp.where(mask, nbrs * 2 + 1, -2)

        all_d = jnp.concatenate([beam_d, d_new])
        all_key = jnp.concatenate([beam_key, key_new])
        if not use_visited:
            # in-beam dedup by id, expanded copy first (key order IS
            # the dedup order): kill later copies before the rank sort
            o_key, o_d = jax.lax.sort([all_key, all_d], num_keys=1)
            dup = jnp.concatenate(
                [jnp.zeros((1,), bool),
                 (o_key[1:] >> 1) == (o_key[:-1] >> 1)]
            )
            all_d = jnp.where(dup | (o_key < 0), jnp.inf, o_d)
            all_key = o_key
        sd, skey = jax.lax.sort([all_d, all_key], num_keys=2)
        return (sd[:ef], skey[:ef], visited, steps + 1)

    beam_d, beam_key, visited, steps = jax.lax.while_loop(
        cond, body, (beam_d, beam_key, visited, jnp.int32(0))
    )
    beam_ids = jnp.where(beam_key >= 0, beam_key >> 1, -1)
    if _rank_is_approx(g):
        # restore exact f32 distances for the surviving beam (one [ef]
        # gather; the bf16 values steered ranking only)
        d_exact = _dist_ids(g, q, beam_ids)
        beam_d = jnp.where(beam_ids >= 0, d_exact, jnp.inf)
    sd, sids = jax.lax.sort([beam_d, beam_ids], num_keys=2)
    return sd, sids, steps


# ---------------------------------------------------------------------------
# Resumable beam scan (iterative-scan analog for beam-scale corpora)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("ef", "spill", "max_steps", "expand", "width")
)
def _beam_scan_segment(
    g: DeviceGraph,
    q,  # [D] prepared query
    seed_ids,  # [S] int32, -1 = unused
    seed_d,  # [S] f32
    excluded,  # [cap+1] bool — already-emitted elements
    ef: int,
    spill: int,
    max_steps: int,
    expand: int = 1,
    width: int | None = None,
):
    """One iterative-scan segment: beam search from seed candidates
    under an exclusion mask, CAPTURING evicted candidates.

    The device analog of the reference's iterative scan state
    (scan.rs:311-346, :538-577): the spill buffer plays the discarded
    max-heap's role (candidates evicted from the beam, fuel for the
    next resume), and ``excluded`` plays the shared visited set's role
    for already-emitted elements (the beam's in-beam dedup covers
    intra-segment re-visits). Returns (beam_d [ef], beam_ids [ef],
    spill_d [spill], spill_ids [spill], steps) — beam sorted nearest
    first, spill sorted nearest first with id-dedup applied.

    ``width`` (>= ef, default ef): INTERNAL beam width. The host's
    Algorithm-2 keeps an unbounded to-expand candidate heap; a device
    beam of exactly ef evicts boundary candidates unexpanded, so later
    segments discover nearer items the earlier segment already emitted
    past — order regressions that strict_order then drops
    (scan.rs:801-806). A wider internal beam explores those candidates
    within the segment and emits only the top-ef, so consecutive
    segments regress rarely; the width-ef leftover is merged into the
    spill (still fuel, never dropped).
    """
    W = ef if width is None else max(width, ef)
    S = seed_ids.shape[0]
    safe_seed = jnp.clip(seed_ids, 0, g.cap)
    ok = (
        (seed_ids >= 0)
        & g.traversable[safe_seed]
        & ~excluded[safe_seed]
    )
    seed_d = jnp.where(ok, seed_d, jnp.inf)
    seed_key = jnp.where(ok, seed_ids * 2 + 1, -2)
    # nearest min(S, W) seeds enter the beam; the overflow goes
    # straight to the spill buffer — those are the reference's
    # still-unexplored discarded candidates and must not be dropped
    seed_d, seed_key = jax.lax.sort([seed_d, seed_key], num_keys=2)
    nb = min(S, W)
    beam_d = jnp.full((W,), jnp.inf, dtype=jnp.float32).at[:nb].set(
        seed_d[:nb]
    )
    beam_key = jnp.full((W,), -2, dtype=jnp.int32).at[:nb].set(
        seed_key[:nb]
    )
    spill_d0 = jnp.full((spill,), jnp.inf, dtype=jnp.float32)
    spill_key0 = jnp.full((spill,), -2, dtype=jnp.int32)
    if S > nb:
        ov = min(S - nb, spill)
        spill_d0 = spill_d0.at[:ov].set(seed_d[nb : nb + ov])
        spill_key0 = spill_key0.at[:ov].set(seed_key[nb : nb + ov])

    def cond(state):
        beam_d, beam_key, sp_d, sp_key, steps = state
        unexp_d = jnp.where(beam_key & 1 == 1, beam_d, jnp.inf)
        best = jnp.min(unexp_d)
        furthest = jnp.max(beam_d)
        return (best <= furthest) & jnp.isfinite(best) & (steps < max_steps)

    def body(state):
        beam_d, beam_key, sp_d, sp_key, steps = state
        unexp_d = jnp.where(beam_key & 1 == 1, beam_d, jnp.inf)
        if expand == 1:
            pos = jnp.argmin(unexp_d)[None]
        else:
            _, pos = jax.lax.top_k(-unexp_d, expand)
        sel_valid = jnp.isfinite(unexp_d[pos])
        u = jnp.where(sel_valid, beam_key[pos] >> 1, -1)
        beam_key = beam_key.at[pos].set(
            jnp.where(sel_valid, beam_key[pos] & ~1, beam_key[pos])
        )
        nbrs = g.neighbors0[jnp.maximum(u, 0)]
        nbrs = jnp.where(sel_valid[:, None], nbrs, -1).reshape(-1)
        safe = jnp.clip(nbrs, 0, g.cap)
        mask = (nbrs >= 0) & g.traversable[safe] & ~excluded[safe]
        d_new = _dist_ids_rank(g, q, nbrs)
        d_new = jnp.where(mask, d_new, jnp.inf)
        key_new = jnp.where(mask, nbrs * 2 + 1, -2)

        all_d = jnp.concatenate([beam_d, d_new])
        all_key = jnp.concatenate([beam_key, key_new])
        # in-beam dedup by id (expanded copy first = key order)
        o_key, o_d = jax.lax.sort([all_key, all_d], num_keys=1)
        dup = jnp.concatenate(
            [jnp.zeros((1,), bool), (o_key[1:] >> 1) == (o_key[:-1] >> 1)]
        )
        all_d = jnp.where(dup | (o_key < 0), jnp.inf, o_d)
        sd, skey = jax.lax.sort([all_d, o_key], num_keys=2)
        # evicted tail -> spill buffer (the discarded-heap analog):
        # merge this step's non-survivors with the running spill,
        # keep the `spill` nearest
        tail_d, tail_key = sd[W:], skey[W:]
        m_d = jnp.concatenate([sp_d, tail_d])
        m_key = jnp.concatenate([sp_key, tail_key])
        m_d, m_key = jax.lax.sort([m_d, m_key], num_keys=2)
        return (sd[:W], skey[:W], m_d[:spill], m_key[:spill], steps + 1)

    beam_d, beam_key, sp_d, sp_key, steps = jax.lax.while_loop(
        cond, body, (beam_d, beam_key, spill_d0, spill_key0, jnp.int32(0))
    )
    beam_ids_w = jnp.where(beam_key >= 0, beam_key >> 1, -1)
    if _rank_is_approx(g):
        d_exact = _dist_ids(g, q, beam_ids_w)
        beam_d = jnp.where(beam_ids_w >= 0, d_exact, jnp.inf)
    beam_d, beam_ids_w, beam_key = jax.lax.sort(
        [beam_d, beam_ids_w, beam_key], num_keys=2
    )
    # emit the top-ef; the width-ef leftover stays fuel — merge it into
    # the spill (keys keep the expanded bit only for ordering; spill
    # re-entries are re-seeded unexpanded either way)
    beam_ids = beam_ids_w[:ef]
    if W > ef:
        sp_d = jnp.concatenate([sp_d, beam_d[ef:]])
        sp_key = jnp.concatenate(
            [sp_key, jnp.where(beam_ids_w[ef:] >= 0,
                               beam_ids_w[ef:] * 2 + 1, -2)]
        )
    # spill dedup: by id (nearest copy wins), drop ids that ended in the
    # emitted beam (they will be emitted and excluded before the next
    # resume)
    sp_ids = jnp.where(sp_key >= 0, sp_key >> 1, -1)
    o_ids, o_d = jax.lax.sort([sp_ids, sp_d], num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), o_ids[1:] == o_ids[:-1]]
    )
    in_beam = (
        jnp.sum(
            (o_ids[:, None] == beam_ids[None, :]) & (beam_ids >= 0)[None, :],
            axis=1,
        )
        > 0
    )
    o_d = jnp.where(dup | in_beam | (o_ids < 0), jnp.inf, o_d)
    sp_d, sp_ids = jax.lax.sort([o_d, o_ids], num_keys=2)
    sp_d, sp_ids = sp_d[:spill], sp_ids[:spill]
    sp_ids = jnp.where(jnp.isfinite(sp_d), sp_ids, -1)
    return beam_d[:ef], beam_ids, sp_d, sp_ids, steps


@jax.jit
def _mark_excluded(excluded, ids):
    """Scatter emitted element ids into the exclusion mask (invalid ids
    land on the pad row, which is never admitted anyway)."""
    safe = jnp.where(ids >= 0, ids, excluded.shape[0] - 1)
    return excluded.at[safe].set(True)


@functools.partial(jax.jit, static_argnames=("n_seeds",))
def _coarse_seed_one(g: DeviceGraph, q, upper_ids, upper_rows, n_seeds: int):
    """Top-n_seeds level>=1 elements for one query (the beam scan's
    first-segment entry points; same coarse seeding as the beam serving
    engine, with exact f32 re-scored distances)."""
    U = upper_rows.shape[0]
    if g.metric == "l2":
        rf = upper_rows.astype(jnp.float32)
        a = jnp.sum(rf * rf, axis=1)
    else:
        a = jnp.zeros((U,), jnp.float32)
    scores = _exact_scores(g, q[None], upper_rows, a, approx=True)[0]
    valid = (upper_ids < g.cap) & g.traversable[jnp.clip(upper_ids, 0, g.cap)]
    scores = jnp.where(valid, scores, jnp.inf)
    neg, slots = jax.lax.top_k(-scores, min(n_seeds, U))
    seed_ids = jnp.where(jnp.isfinite(-neg), upper_ids[slots], -1)
    seed_d = _dist_ids(g, q, jnp.clip(seed_ids, 0, g.cap))
    seed_d = jnp.where(seed_ids >= 0, seed_d, jnp.inf)
    return seed_ids, seed_d


@functools.partial(jax.jit, static_argnames=("entry_level",))
def _descent_seed_one(g: DeviceGraph, q, entry_level: int):
    """Greedy upper-layer descent -> single layer-0 entry (Algorithm 5
    order) for graphs without a usable upper set."""
    entry = jnp.int32(g.entry)
    d0 = _dist_ids(g, q, entry[None])[0]
    cur, cur_d = entry, d0
    for layer in range(entry_level, 0, -1):
        cur, cur_d = _greedy_descent(g, q, cur, cur_d, layer)
    return cur[None], cur_d[None]


@functools.partial(
    jax.jit, static_argnames=("ef", "entry_level", "max_steps", "expand")
)
def _search_batch(
    g: DeviceGraph,
    queries,
    ef: int,
    entry_level: int,
    max_steps: int,
    expand: int = 1,
):
    """Full Algorithm-5 search for a batch of prepared queries."""

    def one(q):
        entry = jnp.int32(g.entry)
        d0 = _dist_ids(g, q, entry[None])[0]
        cur, cur_d = entry, d0
        for layer in range(entry_level, 0, -1):
            cur, cur_d = _greedy_descent(g, q, cur, cur_d, layer)
        return _ground_beam(g, q, cur, cur_d, ef, max_steps, expand)

    return jax.vmap(one)(queries)


def upper_row_arrays(g: DeviceGraph):
    """(ids [U_pad] int32, rows [U_pad, D] bf16) of the level>=1
    elements, computed once per DeviceGraph and cached on the object
    (coarse seeding for the beam engine; dense kinds only).

    Pad slots use id = cap (masked by callers via traversable / id
    comparisons). The cache attribute lives outside the dataclass
    fields so pytree flatten/unflatten ignores it; callers reach this
    through index.device_graph(), which returns the cached object.
    """
    cache = getattr(g, "_upper_cache", None)
    if cache is not None:
        return cache
    slot = np.asarray(g.upper_slot)[: g.cap]
    ids = np.nonzero(slot >= 0)[0].astype(np.int32)
    u_pad = max(128, 1 << int(max(len(ids), 1) - 1).bit_length())
    pad_ids = np.full(u_pad, g.cap, np.int32)
    pad_ids[: len(ids)] = ids
    ids_j = jnp.asarray(pad_ids)
    src = g.values_bf16 if g.values_bf16 is not None else g.values
    rows = src[ids_j]  # device gather, one-time
    g._upper_cache = (ids_j, rows, len(ids))
    return g._upper_cache


def _coarse_upper(g: DeviceGraph):
    """(upper_ids, upper_rows) when coarse seeding applies, else None."""
    if g.kind != "dense" or os.environ.get("PGV_BEAM_SEED") == "descent":
        return None
    ids, rows, count = upper_row_arrays(g)
    # too few upper elements for the sweep to beat plain descent (and
    # an empty set would leave the beam seedless)
    if count < 8:
        return None
    return ids, rows


@functools.partial(
    jax.jit, static_argnames=("ef", "max_steps", "expand", "n_seeds")
)
def _search_batch_coarse(
    g: DeviceGraph,
    queries,
    upper_ids,  # [U_pad] int32 (pad = cap)
    upper_rows,  # [U_pad, D] bf16
    ef: int,
    max_steps: int,
    expand: int = 4,
    n_seeds: int = 8,
):
    """Coarse-exact seeded beam: ONE bf16 MXU sweep over the ~N/m
    level>=1 rows replaces the greedy upper-layer descent, then the
    ground beam refines from the n_seeds nearest upper elements.

    TPU-native two-level serving: the upper descent's pointer chase is
    latency-bound and, on clustered data, can land in the wrong basin
    with no way to recover below (measured 29% of queries at 1M on
    separated clusters); the coarse sweep costs ~N/m * D MACs per
    query on the MXU and always lands in the right region. The graph
    layers 1..L still exist for the parity path; this engine just
    seeds layer 0 better than Algorithm 5's ef=1 descent.
    """
    U = upper_rows.shape[0]
    # ranking-only order scores (seed distances are recomputed exactly
    # below): a = x2 for l2, 0 for ip/cosine (see _exact_scores)
    if g.metric == "l2":
        a = jnp.sum(
            upper_rows.astype(jnp.float32) * upper_rows.astype(jnp.float32),
            axis=1,
        )
    else:
        a = jnp.zeros((U,), jnp.float32)
    scores = _exact_scores(g, queries, upper_rows, a, approx=True)
    valid = (upper_ids < g.cap) & g.traversable[jnp.clip(upper_ids, 0, g.cap)]
    scores = jnp.where(valid[None, :], scores, jnp.inf)
    S = min(n_seeds, U, ef)  # seeds must fit the ef-wide beam
    if U >= 16384:
        seed_d, slots = jax.lax.approx_min_k(scores, S, recall_target=0.99)
    else:
        neg, slots = jax.lax.top_k(-scores, S)
        seed_d = -neg
    seed_ids = jnp.where(jnp.isfinite(seed_d), upper_ids[slots], -1)

    def one(q, s_ids):
        # recompute seed distances exactly (f32) — the bf16 coarse
        # scores are for ranking only and must not leak into results
        s_d = _dist_ids(g, q, jnp.clip(s_ids, 0, g.cap))
        return _ground_beam_seeds(g, q, s_ids, s_d, ef, max_steps, expand)

    return jax.vmap(one)(queries, seed_ids)


jax.tree_util.register_pytree_node(
    DeviceGraph,
    lambda g: (
        (
            g.neighbors0,
            g.upper_neighbors,
            g.upper_slot,
            g.levels,
            g.traversable,
            g.emit_tid,
            g.tid_count,
            g.values,
            g.words,
            g.sp_indices,
            g.sp_values,
            g.x2,
            g.values_bf16,
        ),
        (g.kind, g.metric, g.cap, g.m, g.entry, g.entry_level),
    ),
    lambda aux, children: DeviceGraph(
        kind=aux[0],
        metric=aux[1],
        cap=aux[2],
        m=aux[3],
        entry=aux[4],
        entry_level=aux[5],
        neighbors0=children[0],
        upper_neighbors=children[1],
        upper_slot=children[2],
        levels=children[3],
        traversable=children[4],
        emit_tid=children[5],
        tid_count=children[6],
        values=children[7],
        words=children[8],
        sp_indices=children[9],
        sp_values=children[10],
        x2=children[11],
        values_bf16=children[12],
    ),
)


# ---------------------------------------------------------------------------
# Exact serving engine (dense): one MXU matmul + top-k over the live rows
# ---------------------------------------------------------------------------

# Above this many rows per chip the exact sweep's FLOPs start losing to the
# beam's bandwidth cost; overridable for benchmarking/serving tuning.
EXACT_ENGINE_MAX_ROWS = 4_000_000

#: fused Pallas binned sweep for the approx engines — EXPERIMENTAL,
#: default OFF. Measured on TPU v5e at 1M rows (2026-08-18): dense
#: 128-d l2 123k qps @ 0.996 vs the XLA approx_min_k route's 152-157k
#: @ 0.998; bit(256) hamming 79k @ 0.89 vs 98.5k @ 0.98 (concentrated
#: hamming distances make bin-collision losses worse). XLA already
#: fuses the matmul with approx_min_k's PartialReduce well enough that
#: the hand-rolled 3-VPU-pass bin update loses; kept behind
#: PGV_APPROX_PALLAS=1 as a measured reference point.
_APPROX_PALLAS = os.environ.get("PGV_APPROX_PALLAS", "0") != "0"

#: cap on the padded bf16 corpus copy the pallas sweep stages (bytes);
#: beyond it (e.g. 10M x 1024-d) fall back to the chunked XLA sweep
_APPROX_PALLAS_MAX_BYTES = int(
    os.environ.get("PGV_APPROX_PALLAS_MAX_BYTES", 4 << 30)
)

_PALLAS_PENALTY = 3.0e38  # matches ops/pallas_bruteforce._NEG_BIG


#: corpus rows per chunk of the big-corpus exact sweep: bounds the
#: [B, CH] score transient to ~1 GB at the serving chunk of 1024
#: queries (1024 * 2^18 * 4 B), so sweeps scale to any HBM corpus
_EXACT_SWEEP_CHUNK = 1 << 18


def _exact_scores(g: DeviceGraph, queries, vals, a, approx: bool):
    """[B, rows(vals)] ORDER scores for a corpus slice.

    `a` is the penalty-folded per-row term: x2 + (0|inf dead) for l2,
    (0|inf) alone for ip/cosine/l1. Scores are per-query monotone in
    the true distance but NOT the distance itself (l2 omits the +q2
    broadcast, cosine omits the 1- offset and clamp): folding the row
    mask and per-query constants out of the [B, rows] epilogue is
    worth ~12% qps on the 1M sweep (the sweep is selection-epilogue
    bound, not MXU bound — see DESIGN.md 6e). `_true_dists` restores
    real distance values on the final [B, k] columns.
    """
    if approx:
        q = queries.astype(jnp.bfloat16)
        v = vals if vals.dtype == jnp.bfloat16 else vals.astype(jnp.bfloat16)
    else:
        # compact stores (f16/bf16 values): cast up for the f32 MXU
        # pass — distances stay exact w.r.t. the STORED rounded value,
        # which is the reference's halfvec semantics (halfvec.rs: all
        # arithmetic in f32 over f16-stored values)
        q = queries
        v = vals if vals.dtype == jnp.float32 else vals.astype(jnp.float32)
    if g.metric == "l1":  # no matmul identity — direct differences
        return (
            jnp.sum(
                jnp.abs(
                    queries[:, None, :] - vals.astype(jnp.float32)[None, :, :]
                ),
                axis=-1,
            )
            + a[None, :]
        )
    dots = jax.lax.dot_general(
        q, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if g.metric == "l2":
        return a[None, :] - 2.0 * dots
    return a[None, :] - dots  # ip and cosine share the -dots order


def _true_dists(g: DeviceGraph, queries, s):
    """Recover true distances from order scores on [B, k] columns."""
    if g.metric == "l2":
        q2 = jnp.sum(queries * queries, axis=1, keepdims=True)
        return jnp.maximum(s + q2, 0.0)
    if g.metric == "cosine":
        # keep the inf dead-row sentinel (clip would map it to 2.0)
        return jnp.where(jnp.isfinite(s), 1.0 - jnp.clip(-s, -1.0, 1.0), s)
    return s  # ip: -dots IS the distance; l1: sums pass through


def _rescore_true(g: DeviceGraph, queries, s, ids):
    """Exact f32 distances for the final [B, k] columns of the approx
    sweep: its bf16 order scores rank well but must not leak into
    returned distance VALUES (same rule as the coarse beam's seed
    rescore). One [B, k, D] gather + [B, k] sort — negligible next to
    the sweep. Returns (d, ids) re-sorted by the exact distances."""
    rows = g.values[jnp.clip(ids, 0, g.cap)].astype(jnp.float32)  # [B, k, D]
    if g.metric == "l2":
        diff = rows - queries[:, None, :]
        d = jnp.sum(diff * diff, axis=-1)
    elif g.metric == "l1":
        d = jnp.sum(jnp.abs(rows - queries[:, None, :]), axis=-1)
    else:
        dots = jnp.sum(rows * queries[:, None, :], axis=-1)
        d = -dots if g.metric == "ip" else 1.0 - jnp.clip(dots, -1.0, 1.0)
    # dead-row / padding sentinel comes from the order score
    d = jnp.where(jnp.isfinite(s), d, jnp.inf)
    return jax.lax.sort([d, ids], num_keys=1)


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _exact_search_batch(g: DeviceGraph, queries, k: int, approx: bool = False,
                        row_mask=None):
    """Exact (or turbo-approximate) top-k over the index's live rows.

    TPU-first serving path: a [B, D] x [D, N] MXU matmul + top-k is
    faster than any graph traversal (whose random row gathers run ~25x
    below HBM speed-of-light) up to millions of rows/chip, and returns
    recall-1.0 results. Semantically it is the same contract as the
    HNSW scan (nearest TIDs by order distance), so
    `search(method="auto")` uses it whenever the corpus fits. Masks
    vacuum-deleted elements and zero-TID slots like search_layer_disk's
    deleted/type checks (scan.rs:155-228).

    ``approx=True`` (the "turbo" engine) scores in bfloat16 with f32
    accumulation and selects via lax.approx_min_k — the TPU-KNN
    recipe. Recall stays ~0.99 (measured per-workload by bench.py) at
    several-fold higher throughput.

    Corpora past _EXACT_SWEEP_CHUNK rows sweep in chunks with a
    running per-chunk top-k merged by one final sort, so the [B, N]
    score matrix never materializes (10M+ rows/chip supported).

    Returns (dists [B, k], element ids [B, k]) sorted nearest-first.
    """
    cap1 = g.values.shape[0]
    B = queries.shape[0]
    live = g.traversable & (g.tid_count > 0)
    if row_mask is not None:
        # attribute filtering (043/044 analog): pre-filter INSIDE the
        # sweep — recall over the filtered subset stays 1.0 at any
        # selectivity, where the reference needs iterative re-entry
        live = live & row_mask
    x2 = g.x2 if g.x2 is not None else jnp.sum(g.values * g.values, axis=1)
    vals = (
        (g.values_bf16 if g.values_bf16 is not None else g.values)
        if approx
        else g.values
    )
    if (
        approx
        and _APPROX_PALLAS
        and g.metric != "l1"
        and k <= 64
        and cap1 >= 16384
        and jax.default_backend() == "tpu"
        and cap1 * (-(-g.values.shape[1] // 128) * 128) * 2
        <= _APPROX_PALLAS_MAX_BYTES
    ):
        # fused binned sweep: one Pallas kernel streams the bf16 corpus
        # through VMEM with a running per-bin min (no [B, N] score
        # matrix in HBM). Measured SLOWER than the XLA route (see
        # _APPROX_PALLAS above) — opt-in only.
        from ..ops.pallas_bruteforce import binned_sweep_topk

        pen = jnp.where(live, 0.0, _PALLAS_PENALTY)
        a = x2 + pen if g.metric == "l2" else pen
        v_bf = vals if vals.dtype == jnp.bfloat16 else vals.astype(jnp.bfloat16)
        return binned_sweep_topk(v_bf, a, queries, k, g.metric)
    # penalty-folded per-row term: ONE [rows] op instead of per-query
    # [B, rows] where(live)/maximum/q2 passes (the sweep is epilogue
    # bound — see _exact_scores)
    pen = jnp.where(live, 0.0, jnp.inf)
    a = x2 + pen if g.metric == "l2" else pen

    l1_needs_chunks = g.metric == "l1" and cap1 > 2048
    if cap1 <= _EXACT_SWEEP_CHUNK and not l1_needs_chunks:
        scores = _exact_scores(g, queries, vals, a, approx)
        if approx:
            s, ids = jax.lax.approx_min_k(scores, k, recall_target=0.98)
            d, ids = _rescore_true(g, queries, s, ids)
        else:
            neg_s, ids = jax.lax.top_k(-scores, k)
            d = _true_dists(g, queries, -neg_s)
        return d, jnp.where(jnp.isfinite(d), ids, -1)

    # chunked sweep + merge (l1 uses small chunks: its direct-difference
    # scoring materializes [B, CH, D]). The [B, CH] score block plus
    # top_k's sort workspace must fit NEXT TO the resident graph: at 10M
    # rows the graph holds ~10GB of a 16GB chip, so bound the block at
    # ~256MB (measured: the 1GB block at [1024, 2^18] OOMs a 10M serve)
    if g.metric == "l1":
        CH = 2048
    else:
        CH = _EXACT_SWEEP_CHUNK
        budget = (256 << 20) if cap1 > (4 << 20) else (1 << 30)
        while B * CH * 4 > budget and CH > 8192:
            CH //= 2
    pad = (-cap1) % CH
    vals_p = jnp.pad(vals, ((0, pad), (0, 0)))
    a_p = jnp.pad(a, (0, pad), constant_values=jnp.inf)
    nc = vals_p.shape[0] // CH

    def chunk(args):
        v_c, a_c, off = args
        s = _exact_scores(g, queries, v_c, a_c, approx)
        kk = min(k, CH)
        if approx:
            s_c, i_c = jax.lax.approx_min_k(s, kk, recall_target=0.98)
        else:
            neg, i_c = jax.lax.top_k(-s, kk)
            s_c = -neg
        return s_c, jnp.where(jnp.isfinite(s_c), i_c + off, -1)

    offs = jnp.arange(nc, dtype=jnp.int32) * CH
    # per-chunk order scores merge by sort unchanged: the omitted
    # per-query terms shift every chunk's scores equally
    d_all, i_all = jax.lax.map(
        chunk,
        (
            vals_p.reshape(nc, CH, -1),
            a_p.reshape(nc, CH),
            offs,
        ),
    )  # [nc, B, k]
    flat_d = jnp.moveaxis(d_all, 0, 1).reshape(B, -1)
    flat_i = jnp.moveaxis(i_all, 0, 1).reshape(B, -1)
    sd, si = jax.lax.sort([flat_d, flat_i], num_keys=1)
    s_k, i_k = sd[:, :k], si[:, :k]
    if approx:
        d, i_k = _rescore_true(g, queries, s_k, i_k)
    else:
        d = _true_dists(g, queries, s_k)
    return d, jnp.where(jnp.isfinite(d), i_k, -1)


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _exact_search_bits(g: DeviceGraph, queries, k: int, approx: bool = False,
                       row_mask=None):
    """Exact top-k over packed-bit rows (hamming / jaccard).

    Two formulations, chosen statically by query-batch size, both
    masked by live slots with per-chunk top-k merged by one final sort
    (the full [B, N] score matrix would be 16GB at 1M rows x 4k
    queries):

    - **MXU sweep** (B >= 32, the serving path): unpack each chunk's
      packed words to bf16 {0,1} on device and take one f32-accumulated
      matmul against the unpacked queries — exactly popcount(AND),
      from which hamming = |q|+|row|-2·ab and jaccard = 1-ab/union
      derive. Distances are exact (0/1 products, sums < 2^24). The
      popcount formulation streams [B, CH, W] word tiles through the
      VPU — ~B·W·4 bytes of transient traffic per corpus row — while
      the matmul's traffic is the ~nbits·2-byte unpack per row,
      independent of B: the MXU path wins whenever many queries
      amortize the unpack.
    - **VPU popcount sweep** (small B): XOR/AND + population_count on
      the packed words directly, the reference's formulation
      (bitvec.rs:97-132) batched.

    ``approx=True`` keeps the exact distances but selects per chunk
    with ``lax.approx_min_k`` instead of top_k (the turbo-engine
    recipe; selection, not scoring, dominates the sweep).
    """
    B = queries.shape[0]
    cap1 = g.words.shape[0]
    nbits = g.words.shape[1] * 32
    if (
        approx
        and _APPROX_PALLAS
        and g.metric == "hamming"
        and k <= 64
        and cap1 >= 16384
        and jax.default_backend() == "tpu"
        and cap1 * nbits * 2 <= _APPROX_PALLAS_MAX_BYTES
    ):
        # hamming(q, x) over {0,1} vectors IS squared l2, so the fused
        # binned sweep serves bit rows unchanged: unpack on device
        # (bf16 rows), a = row popcount (= ||x||^2), q2 restores the
        # query popcount; distances are exact integers in f32.
        # Measured SLOWER and lower-recall than the XLA route on
        # concentrated hamming distributions (see _APPROX_PALLAS) —
        # opt-in only.
        from ..ops.bits import unpack_words_bf16
        from ..ops.pallas_bruteforce import binned_sweep_topk

        live_b = g.traversable & (g.tid_count > 0)
        if row_mask is not None:
            live_b = live_b & row_mask
        rows_bf16 = unpack_words_bf16(g.words)
        bpop = jnp.sum(
            jax.lax.population_count(g.words), axis=-1
        ).astype(jnp.float32)
        a = bpop + jnp.where(live_b, 0.0, _PALLAS_PENALTY)
        q_bits = unpack_words_bf16(queries).astype(jnp.float32)
        return binned_sweep_topk(rows_bf16, a, q_bits, k, "l2")
    mxu = B >= 32
    if mxu:
        # dense-sweep-sized chunks: few per-chunk top_k passes (those,
        # not the matmul, dominate at small chunks); bound the
        # [CH, nbits] bf16 unpack transient to ~128MB
        CH = _EXACT_SWEEP_CHUNK
        while CH * nbits * 2 > (128 << 20) and CH > 4096:
            CH //= 2
    else:  # bounds the [B, CH, W] popcount word tile
        CH = 8192
    pad = (-cap1) % CH
    words = jnp.pad(g.words, ((0, pad), (0, 0)))
    live0 = g.traversable & (g.tid_count > 0)
    if row_mask is not None:
        live0 = live0 & row_mask
    live = jnp.pad(live0, (0, pad))
    nc = words.shape[0] // CH
    q_pop = jnp.sum(jax.lax.population_count(queries), axis=-1).astype(
        jnp.float32
    )  # [B]
    kk = min(k, CH)
    if mxu:
        from ..ops.bits import unpack_words_bf16

        q_bits = unpack_words_bf16(queries)  # [B, nbits] bf16

    # mxu-hamming fold: order score (bb + pen)[None,:] - 2ab skips the
    # per-query q_pop broadcast and the [B, CH] where(live) pass (the
    # sweep is selection-epilogue bound — see _exact_scores); q_pop is
    # restored on the final [B, k] columns after the merge.
    ham_fold = mxu and g.metric == "hamming"

    def chunk(args):  # ([CH, W], [CH], off)
        w_chunk, live_c, off = args
        bb = jnp.sum(jax.lax.population_count(w_chunk), axis=-1).astype(
            jnp.float32
        )  # [CH]
        if mxu:
            b_bits = unpack_words_bf16(w_chunk)  # [CH, nbits]
            ab = jax.lax.dot_general(
                q_bits,
                b_bits,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, CH] = popcount(q AND row), exact
            if g.metric == "hamming":
                pen_c = jnp.where(live_c, 0.0, jnp.inf)
                s = (bb + pen_c)[None, :] - 2.0 * ab
            else:
                union = q_pop[:, None] + bb[None, :] - ab
                s = jnp.where(
                    ab == 0.0,
                    1.0,
                    1.0 - ab / jnp.where(union > 0, union, 1.0),
                )
        elif g.metric == "hamming":
            x = jnp.bitwise_xor(queries[:, None, :], w_chunk[None, :, :])
            s = jnp.sum(jax.lax.population_count(x), axis=-1).astype(
                jnp.float32
            )  # [B, CH]
        else:
            a = jnp.bitwise_and(queries[:, None, :], w_chunk[None, :, :])
            ab = jnp.sum(jax.lax.population_count(a), axis=-1).astype(
                jnp.float32
            )
            union = q_pop[:, None] + bb[None, :] - ab
            s = jnp.where(
                ab == 0.0, 1.0, 1.0 - ab / jnp.where(union > 0, union, 1.0)
            )
        if not ham_fold:
            s = jnp.where(live_c[None, :], s, jnp.inf)
        if approx:
            d_c, i_c = jax.lax.approx_min_k(s, kk, recall_target=0.98)
            return d_c, jnp.where(jnp.isfinite(d_c), i_c + off, -1)
        neg, i_c = jax.lax.top_k(-s, kk)
        return -neg, jnp.where(jnp.isfinite(neg), i_c + off, -1)

    offs = jnp.arange(nc, dtype=jnp.int32) * CH
    d_all, i_all = jax.lax.map(
        chunk, (words.reshape(nc, CH, -1), live.reshape(nc, CH), offs)
    )  # [nc, B, kk]
    flat_d = jnp.moveaxis(d_all, 0, 1).reshape(B, -1)
    flat_i = jnp.moveaxis(i_all, 0, 1).reshape(B, -1)
    sd, si = jax.lax.sort([flat_d, flat_i], num_keys=1)
    d = sd[:, :k]
    if ham_fold:  # restore the per-query popcount term
        d = d + q_pop[:, None]
    return d, jnp.where(jnp.isfinite(d), si[:, :k], -1)


#: dim <= factor * nnz-budget selects the densified-corpus MXU sweep
#: for sparse exact/approx serving: the matmul wastes FLOPs on zeros
#: (B*N*dim*2) but the dense-q gather formulation moves B*N*P*4 bytes
#: through gather-rate HBM — on v5e the MXU wins while
#: dim/P < ~1000 (f32) and far beyond that in bf16
_SPARSE_MATMUL_FACTOR = int(os.environ.get("PGV_SPARSE_MATMUL_FACTOR", 1024))


@functools.partial(jax.jit, static_argnames=("k", "dim", "approx"))
def _exact_search_sparse(g: DeviceGraph, q_indices, q_values, k: int,
                         dim: int = 0, row_mask=None, approx: bool = False):
    """Exact (or turbo-approximate) top-k over padded-CSR sparse rows.

    Formulation picked statically by vocabulary size `dim`:

    - **densified-corpus MXU sweep** (dim <= _SPARSE_MATMUL_FACTOR * P,
      metrics with a dot identity): scatter each corpus chunk dense
      [CH, dim+1] on device and take one matmul against the densified
      queries — all matched terms come off the MXU, no gathers. The
      zero-padding FLOPs are cheaper than gather bytes up to dim ~ 64k
      at the 64-nnz budget (measured: the gather formulation served
      4.4k qps at 100k x 30k-d where this path is matmul-bound).
      ``approx=True`` scores in bf16 + approx_min_k (the turbo recipe).
    - **dense-query gather** (larger dim): matched query values via one
      gather from the densified query matrix (pairwise_dense_q).
    - **searchsorted merge join** (dim unknown or > DENSE_Q_MAX_DIM):
      works at any dimensionality (sparsevec allows dim up to 10^9,
      sparsevec.rs:29).
    """
    from ..ops import sparse as sparse_ops

    B, P = q_indices.shape
    live = g.traversable & (g.tid_count > 0)
    if row_mask is not None:
        live = live & row_mask
    # the densified query matrix is [B, dim+1]; guard its footprint
    # (B and dim are static at trace time)
    dense_q_ok = (
        0 < dim <= sparse_ops.DENSE_Q_MAX_DIM
        and B * (dim + 1) * 4 <= (1 << 30)
    )
    use_matmul = (
        dense_q_ok
        and g.metric != "l1"  # no dot identity for l1
        and dim <= _SPARSE_MATMUL_FACTOR * P
    )
    if use_matmul:
        sdt = jnp.bfloat16 if approx else jnp.float32
        qd_s = sparse_ops.densify_queries(q_indices, q_values, dim,
                                          dtype=sdt)
        q_sq = jnp.sum(q_values * q_values, axis=-1)  # [B]
        N = g.sp_indices.shape[0]
        # ~256MB densified-chunk budget (bf16 chunks are twice as wide)
        CH = max(128, (1 << 28) // ((dim + 1) * np.dtype(sdt).itemsize))
        if approx:
            # selection cost, not the matmul, bounds this sweep: score
            # sub-chunks accumulate into a WIDE window so selection is
            # one approx_min_k PartialReduce per 16384 columns instead
            # of a full bitonic top_k per densify chunk (ApproxTopK
            # also cannot lower for narrow operands)
            W = 16384
            G = max(1, -(-W // CH))
            CH = W // G
        else:
            G = 1
            W = CH = min(CH, max(128, N))

        def score_sub(args):
            ci, cv = args  # [CH, P]
            cd = sparse_ops.densify_queries(ci, cv, dim, dtype=sdt)
            cvz = jnp.where(ci != _INT_MAX, cv, 0.0)
            c_sq = jnp.sum(cvz * cvz, axis=-1)  # [CH]
            dots = jax.lax.dot_general(
                qd_s,
                cd,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, CH]
            if g.metric == "l2":
                return jnp.maximum(
                    q_sq[:, None] + c_sq[None, :] - 2.0 * dots, 0.0
                )
            if g.metric == "ip":
                return -dots
            denom = jnp.sqrt(q_sq[:, None] * c_sq[None, :])  # cosine
            sim = jnp.where(
                denom > 0.0, dots / jnp.where(denom > 0.0, denom, 1.0), 0.0
            )
            return 1.0 - jnp.clip(sim, -1.0, 1.0)

        pad = (-N) % W
        ci_p = jnp.pad(g.sp_indices, ((0, pad), (0, 0)),
                       constant_values=_INT_MAX)
        cv_p = jnp.pad(g.sp_values, ((0, pad), (0, 0)))
        live_p = jnp.pad(live, (0, pad))
        nw = ci_p.shape[0] // W
        kk = min(k, W)

        def window(args):
            ci_w, cv_w, live_w, off = args  # [W, P], [W], scalar
            if G > 1:
                # unrolled (G is small and static): concatenation along
                # columns fuses into the [B, W] buffer without the
                # [G, B, CH] transpose a lax.map would force
                s = jnp.concatenate(
                    [
                        score_sub(
                            (
                                jax.lax.dynamic_slice_in_dim(ci_w, i * CH, CH),
                                jax.lax.dynamic_slice_in_dim(cv_w, i * CH, CH),
                            )
                        )
                        for i in range(G)
                    ],
                    axis=1,
                )
            else:
                s = score_sub((ci_w, cv_w))
            s = jnp.where(live_w[None, :], s, jnp.inf)
            if approx and W >= 16384:
                d_c, i_c = jax.lax.approx_min_k(s, kk, recall_target=0.98)
            else:
                neg, i_c = jax.lax.top_k(-s, kk)
                d_c = -neg
            return d_c, jnp.where(jnp.isfinite(d_c), i_c + off, -1)

        def rescore(s, ids):
            """Exact f32 distances for the [B, k] winners: bf16 order
            scores must not leak into returned values (the dense
            engine's _rescore_true rule). One [B, k, P] row gather +
            densified-query f32 gather-dot."""
            if not approx:
                return s, ids
            safe = jnp.clip(ids, 0, g.sp_indices.shape[0] - 1)
            ci_r = g.sp_indices[safe]  # [B, k, P]
            cv_r = jnp.where(ci_r != _INT_MAX, g.sp_values[safe], 0.0)
            qd32 = sparse_ops.densify_queries(q_indices, q_values, dim)
            col = jnp.where(ci_r != _INT_MAX, ci_r, dim)  # dump column
            qvals = jnp.take_along_axis(
                qd32[:, None, :], col, axis=2
            )  # [B, k, P]
            dots = jnp.sum(cv_r * qvals, axis=-1)
            c_sq = jnp.sum(cv_r * cv_r, axis=-1)
            if g.metric == "l2":
                d = jnp.maximum(q_sq[:, None] + c_sq - 2.0 * dots, 0.0)
            elif g.metric == "ip":
                d = -dots
            else:
                denom = jnp.sqrt(q_sq[:, None] * c_sq)
                sim = jnp.where(
                    denom > 0.0,
                    dots / jnp.where(denom > 0.0, denom, 1.0),
                    0.0,
                )
                d = 1.0 - jnp.clip(sim, -1.0, 1.0)
            d = jnp.where(jnp.isfinite(s), d, jnp.inf)
            d, ids = jax.lax.sort([d, ids], num_keys=1)
            return d, jnp.where(jnp.isfinite(d), ids, -1)

        offs = jnp.arange(nw, dtype=jnp.int32) * W
        if nw > 1:
            d_all, i_all = jax.lax.map(
                window,
                (
                    ci_p.reshape(nw, W, P),
                    cv_p.reshape(nw, W, P),
                    live_p.reshape(nw, W),
                    offs,
                ),
            )  # [nw, B, kk]
            flat_d = jnp.moveaxis(d_all, 0, 1).reshape(B, -1)
            flat_i = jnp.moveaxis(i_all, 0, 1).reshape(B, -1)
            sd, si = jax.lax.sort([flat_d, flat_i], num_keys=1)
            d, si_k = rescore(sd[:, :k], si[:, :k])
            return d, jnp.where(jnp.isfinite(d), si_k, -1)
        d, ids = window((ci_p, cv_p, live_p, jnp.int32(0)))
        return rescore(d[:, :k], ids[:, :k])
    if dense_q_ok:
        scores = sparse_ops.pairwise_dense_q(
            g.metric, dim, g.sp_indices, g.sp_values, q_indices, q_values
        )  # [B, cap+1]
    else:
        scores = sparse_ops.pairwise(
            g.metric, g.sp_indices, g.sp_values, q_indices, q_values
        )  # [B, cap+1]
    scores = jnp.where(live[None, :], scores, jnp.inf)
    neg_d, ids = jax.lax.top_k(-scores, k)
    d = -neg_d
    return d, jnp.where(jnp.isfinite(d), ids, -1)


# ---------------------------------------------------------------------------
# Single-dispatch bulk sweeps (serving steady state)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("k", "engine", "chunk", "ef", "entry_level",
                              "max_steps", "expand")
)
def _serve_sweep(
    g: DeviceGraph,
    queries,
    k: int,
    engine: str,
    chunk: int,
    ef: int = 40,
    entry_level: int = 0,
    max_steps: int = 192,
    expand: int = 4,
    upper=None,
    row_mask=None,
):
    """Top-k for a whole staged query matrix in ONE device program.

    The dev harness's tunnel charges ~0.5s per program dispatch and per
    result download regardless of size, so bulk serving must not loop
    dispatches on the host: this program lax.maps over fixed-size query
    chunks (bounding the [chunk, cap] score transient) and returns the
    full [B, k] result, downloaded once by the caller. B must be a
    multiple of `chunk` (callers pad).
    """
    B, D = queries.shape[0], queries.shape[-1]

    def one(qc):
        if engine == "beam":
            if upper is not None:
                d, ids, _ = _search_batch_coarse(
                    g, qc, upper[0], upper[1], ef, max_steps, expand
                )
            else:
                d, ids, _ = _search_batch(
                    g, qc, ef, entry_level, max_steps, expand
                )
            if row_mask is not None:
                # post-filter the ef-wide beam results (graph traversal
                # itself stays unfiltered, like the reference's executor
                # filter); recall under selective filters needs ef >>
                # k/selectivity — the exact/approx engines pre-filter
                keep = row_mask[jnp.maximum(ids, 0)] & (ids >= 0)
                d = jnp.where(keep, d, jnp.inf)
                d, ids = jax.lax.sort([d, ids], num_keys=1)
                ids = jnp.where(jnp.isfinite(d), ids, -1)
            return d[:, :k], ids[:, :k]
        if g.kind == "bit":
            # packed-word queries ([B, W] uint32): the bits sweep owns
            # both the exact and approx selections for hamming/jaccard
            return _exact_search_bits(
                g, qc, k, approx=engine == "approx", row_mask=row_mask
            )
        return _exact_search_batch(
            g, qc, k, approx=engine == "approx", row_mask=row_mask
        )

    d, ids = jax.lax.map(one, queries.reshape(-1, chunk, D))
    return d.reshape(B, -1), ids.reshape(B, -1)


def serve_topk(index, queries_dev, k: int, engine: str = "approx",
               chunk: int = 1024, ef: int = 40, filter_mask=None):
    """Bulk top-k over device-staged queries: one dispatch, one
    download. Returns (dists [B,k] np, element ids [B,k] np).

    Query layout depends on the index metric: dense metrics take
    [B, dim] float rows; hamming/jaccard take packed-word bit queries
    ([B, W] uint32, W = ceil(dim/32), as produced by
    ``ops.bits.pack_bits``) — the same packed layout the graph store
    keeps on-device.

    This is the serving fast path the benchmark measures; `search()`
    remains the semantically-complete per-call API (duplicate TID
    expansion, vacuum filtering, host conversion per call).

    ``filter_mask``: optional bool array over element ids (True =
    candidate allowed) — the attribute-filtering analog of the
    reference's executor filters + iterative scans (tests/t/043,044).
    The exact/approx engines apply it INSIDE the sweep (recall 1.0 over
    the filtered subset at any selectivity); the beam engine
    post-filters its ef-wide result like the reference's executor.
    """
    if engine not in ("exact", "approx", "beam"):
        raise ValueError(f"unknown engine {engine!r}")
    g = index.device_graph()
    row_mask = _stage_filter_mask(g, filter_mask)
    B = queries_dev.shape[0]
    pad = (-B) % chunk
    if pad:
        queries_dev = jnp.concatenate(
            [queries_dev, jnp.zeros((pad, queries_dev.shape[1]),
                                    queries_dev.dtype)]
        )
    ef_eff = max(ef, k)
    d, ids = _serve_sweep(
        g, queries_dev, k, engine, chunk,
        ef=ef_eff, entry_level=g.entry_level,
        max_steps=4 * ef_eff + 32,
        expand=int(os.environ.get("PGV_BEAM_EXPAND", 1)),
        upper=_coarse_upper(g) if engine == "beam" else None,
        row_mask=row_mask,
    )
    return np.asarray(d)[:B], np.asarray(ids)[:B]


def _stage_filter_mask(g: DeviceGraph, filter_mask):
    """Stage a user element-id filter mask as a [cap+1] device bool
    array (sentinel row False). Accepts None, numpy/jax bool arrays of
    length <= cap (unlisted tail ids are excluded)."""
    if filter_mask is None:
        return None
    cap1 = g.traversable.shape[0]
    if isinstance(filter_mask, jax.Array):
        m = filter_mask.astype(jnp.bool_)
        n = m.shape[0]
        if n > cap1 - 1:
            raise ValueError(
                f"filter_mask length {n} exceeds index capacity {cap1 - 1}"
            )
        return jnp.pad(m, (0, cap1 - n))
    m = np.asarray(filter_mask, dtype=bool)
    if m.shape[0] > cap1 - 1:
        raise ValueError(
            f"filter_mask length {m.shape[0]} exceeds index capacity {cap1 - 1}"
        )
    out = np.zeros(cap1, dtype=bool)
    out[: m.shape[0]] = m
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def prepare_query_matrix(index, q: np.ndarray):
    """Vectorized dense-query canonicalization (no per-row Python loop).

    Cosine: rows are L2-normalized; zero rows stay zero (the reference's
    normalize semantics, vector.rs:688-711).
    """
    q = np.asarray(q, dtype=np.float32)
    if index.metric == "cosine":
        n = np.linalg.norm(q, axis=1, keepdims=True)
        q = np.where(n > 0, q / np.where(n > 0, n, 1.0), 0.0).astype(np.float32)
    return jnp.asarray(q)


def prepare_queries(index, qlist):
    """Canonicalize queries to stacked device inputs."""
    if isinstance(qlist, jax.Array) and index.kind == "dense":
        q = qlist.astype(jnp.float32)
        if index.metric == "cosine":
            n = jnp.linalg.norm(q, axis=1, keepdims=True)
            q = jnp.where(n > 0, q / jnp.where(n > 0, n, 1.0), 0.0)
        return q
    if index.kind == "dense":
        # vectorized: per-row prepare_value costs more than the search
        # itself at serving batch sizes
        arr = np.asarray(qlist, dtype=np.float32)
        if arr.ndim == 2 and arr.shape[1] == index.dim:
            return prepare_query_matrix(index, arr)
    prepped = [index.prepare_value(q) for q in qlist]
    if index.kind == "dense":
        rows = [
            (p if p is not None else np.zeros(index.dim, dtype=np.float32)).astype(
                np.float32
            )
            for p in prepped
        ]
        return jnp.asarray(np.stack(rows))
    if index.kind == "bit":
        from ..ops.bits import pack_bits

        bits = np.stack(
            [np.unpackbits(np.asarray(p, dtype=np.uint8))[: index.dim] for p in prepped]
        )
        return jnp.asarray(pack_bits(bits))
    # sparse: pad to store budget
    P = index.store.budget
    qi = np.full((len(prepped), P), _INT_MAX, dtype=np.int32)
    qv = np.zeros((len(prepped), P), dtype=np.float32)
    for r, p in enumerate(prepped):
        if p is None:
            continue
        idx, val = p
        qi[r, : len(idx)] = idx
        qv[r, : len(val)] = val
    return jnp.asarray(qi), jnp.asarray(qv)


def _record_scan_stats(index, g: DeviceGraph, B: int, steps, expand: int):
    """Populate ``index.last_scan_stats`` (the EXPLAIN ANALYZE /
    pgstat-counters analog, scan.rs:718-729; SURVEY §5).

    Gated behind PGV_SCAN_STATS=1: the beam path's per-query step
    counts live on device, and downloading them costs a tunnel
    round-trip the serving hot path must not pay by default. Exact
    engines score every row, so their counters are free host math.
    """
    if os.environ.get("PGV_SCAN_STATS", "0") == "0":
        return
    from ..utils.stats import ScanStats

    st = ScanStats()
    if steps is None:  # exact/approx sweep: every row scored per query
        st.distances_computed = B * g.cap
        st.nodes_visited = B * g.cap
    else:
        total = int(np.asarray(jnp.sum(steps)))
        lm0 = g.neighbors0.shape[1]
        st.beam_steps = total
        # each step expands `expand` nodes and scores their <=2M
        # neighbor rows (estimate: pad slots counted as scored)
        st.nodes_visited = total * expand
        st.distances_computed = total * expand * lm0
    index.last_scan_stats = st


def search(index, qlist, k: int, params, engine: str = "auto",
           filter_mask=None):
    """Batched device k-NN -> (order-dists [B,k] f64, heap ids [B,k]).

    engine: "beam" walks the HNSW graph (batched beam search), "exact"
    runs the exact sweep (MXU matmul for dense, popcount for bit,
    padded-CSR for sparse), "approx" the bf16 + approx_min_k turbo
    sweep (dense), "auto" picks exact up to EXACT_ENGINE_MAX_ROWS and
    beam otherwise.

    ``filter_mask``: optional bool array over element ids — attribute
    filtering (tests/t/043,044 analog). Exact/approx engines pre-filter
    inside the sweep; the beam engine post-filters emissions.
    """
    g = index.device_graph()
    row_mask = _stage_filter_mask(g, filter_mask)
    B = len(qlist)
    if g.entry < 0 or B == 0:
        return (
            np.full((B, k), np.inf, dtype=np.float64),
            np.full((B, k), -1, dtype=np.int64),
        )
    queries = prepare_queries(index, qlist)
    ef = max(params.ef_search, 1)
    max_steps = 4 * ef + 32
    # E-way expansion: E best unexpanded candidates per step. The loop
    # (not the expansion work) is the latency bound on TPU, and the
    # step budget scales with E, which larger corpora need.
    expand = int(os.environ.get("PGV_BEAM_EXPAND", 1))
    if engine == "auto":
        # sparse merge-join sweeps cost O(N*P*logP) VPU work per query
        # batch, so the exact cutover is much lower than the MXU kinds
        limit = 200_000 if index.kind == "sparse" else EXACT_ENGINE_MAX_ROWS
        engine = "exact" if g.cap <= limit else "beam"
    steps = None  # beam loop iterations (ScanStats, scan.rs:718-729 analog)
    if engine in ("exact", "approx"):
        if index.kind == "dense":
            beam_d, beam_ids = _exact_search_batch(
                g, queries, max(k, 1), approx=engine == "approx",
                row_mask=row_mask,
            )
        elif index.kind == "bit":
            beam_d, beam_ids = _exact_search_bits(
                g, queries, max(k, 1), approx=engine == "approx",
                row_mask=row_mask,
            )
        else:
            beam_d, beam_ids = _exact_search_sparse(
                g, queries[0], queries[1], max(k, 1), dim=index.dim,
                row_mask=row_mask, approx=engine == "approx",
            )
    elif index.kind == "sparse":
        qtuple = queries
        # dense-query gather distances when the [B, dim+1] densified
        # query matrix is affordable (it almost always is: HNSW caps
        # sparse dim at 1000 nnz but dim itself can be large) —
        # replaces the per-candidate searchsorted with one gather
        use_dense_q = (
            0 < index.dim <= _SPARSE_DENSE_Q_MAX_DIM
            and B * (index.dim + 1) * 4 <= (1 << 30)
        )
        if use_dense_q:
            from ..ops.sparse import densify_queries

            qd = densify_queries(qtuple[0], qtuple[1], index.dim)
            beam_d, beam_ids, steps = jax.vmap(
                lambda qi, qv, qdr: _search_one_sparse(
                    g, (qi, qv, qdr), ef, max_steps
                )
            )(qtuple[0], qtuple[1], qd)
        else:
            beam_d, beam_ids, steps = jax.vmap(
                lambda qi, qv: _search_one_sparse(g, (qi, qv), ef, max_steps)
            )(qtuple[0], qtuple[1])
    else:
        upper = _coarse_upper(g)
        if upper is not None:
            beam_d, beam_ids, steps = _search_batch_coarse(
                g, queries, upper[0], upper[1], ef, max_steps, expand
            )
        else:
            beam_d, beam_ids, steps = _search_batch(
                g, queries, ef, g.entry_level, max_steps, expand
            )
    _record_scan_stats(index, g, B, steps, expand)
    beam_d = np.asarray(beam_d, dtype=np.float64)
    beam_ids = np.asarray(beam_ids)

    if row_mask is not None and engine not in ("exact", "approx"):
        # beam emissions post-filtered by the element mask (the
        # executor-filter analog); exact engines already pre-filtered
        host_mask = np.asarray(row_mask)
        keep = (beam_ids >= 0) & host_mask[np.maximum(beam_ids, 0)]
        beam_d = np.where(keep, beam_d, np.inf)
        beam_ids = np.where(keep, beam_ids, -1)
        order = np.argsort(beam_d, axis=1, kind="stable")
        beam_d = np.take_along_axis(beam_d, order, axis=1)
        beam_ids = np.take_along_axis(beam_ids, order, axis=1)

    tid_count = np.asarray(g.tid_count)
    emit_tid = np.asarray(g.emit_tid)

    # fast path: no duplicates / vacuumed slots among the candidates —
    # one vectorized emit_tid gather (the common serving case)
    W = beam_ids.shape[1]
    safe = np.maximum(beam_ids, 0)
    cnts = np.where(beam_ids >= 0, tid_count[safe], 1)
    if W >= k and (cnts[:, :k] == 1).all() and (beam_ids[:, :k] >= 0).all():
        out_d = beam_d[:, :k].copy()
        out_ids = emit_tid[safe[:, :k]].astype(np.int64)
        out_d[~np.isfinite(out_d)] = np.inf
        out_ids[~np.isfinite(beam_d[:, :k])] = -1
        return out_d, out_ids

    out_d = np.full((B, k), np.inf, dtype=np.float64)
    out_ids = np.full((B, k), -1, dtype=np.int64)
    for b in range(B):
        j = 0
        for d, eid in zip(beam_d[b], beam_ids[b]):
            if j >= k or eid < 0 or not np.isfinite(d):
                break
            cnt = int(tid_count[eid])
            if cnt == 0:
                continue
            if cnt == 1:
                out_d[b, j] = d
                out_ids[b, j] = emit_tid[eid]
                j += 1
            else:
                # duplicate element: emit its heap TIDs in slot order
                for tid in reversed(index.heap_tids[int(eid)]):
                    if j >= k:
                        break
                    out_d[b, j] = d
                    out_ids[b, j] = tid
                    j += 1
    return out_d, out_ids


@functools.partial(jax.jit, static_argnames=("ef", "max_steps"))
def _search_one_sparse(g, q, ef: int, max_steps: int):
    entry = jnp.int32(g.entry)
    d0 = _dist_ids(g, q, entry[None])[0]
    cur, cur_d = entry, d0
    for layer in range(g.entry_level, 0, -1):
        cur, cur_d = _greedy_descent(g, q, cur, cur_d, layer)
    return _ground_beam(g, q, cur, cur_d, ef, max_steps)


# ---------------------------------------------------------------------------
# Array-level search (shard_map-compatible: entry point is traced, so this
# works on a per-shard basis where each shard has its own entry scalar)
# ---------------------------------------------------------------------------


def beam_search_arrays(
    values,  # [cap+1, D] f32
    neighbors0,  # [cap+1, 2M] int32
    upper_neighbors,  # [U+1, LMAX*M] int32 (layer-major flat)
    upper_slot,  # [cap+1] int32
    traversable,  # [cap+1] bool
    entry,  # traced scalar int32
    entry_level,  # traced scalar int32
    queries,  # [B, D] f32
    *,
    metric: str,
    ef: int,
    lmax: int,
    max_steps: int,
):
    """Dense-metric batched search with a traced entry point.

    Same algorithm as :func:`_search_batch` but the entry level is a
    runtime value (layer loop unrolled to a static ``lmax`` with masks),
    which is what shard_map needs — each shard has its own entry.
    Returns (beam_d [B, ef], beam_ids [B, ef]).
    """
    cap = values.shape[0] - 1
    n_upper = upper_neighbors.shape[0] - 1
    m = upper_neighbors.shape[1] // lmax

    if metric == "l2":
        dist = lambda q, c: jnp.sum((c - q) ** 2, axis=-1)
    elif metric == "ip":
        dist = lambda q, c: -jnp.sum(c * q, axis=-1)
    elif metric == "cosine":
        dist = lambda q, c: 1.0 - jnp.clip(jnp.sum(c * q, axis=-1), -1.0, 1.0)
    elif metric == "l1":
        dist = lambda q, c: jnp.sum(jnp.abs(c - q), axis=-1)
    else:
        raise ValueError(metric)

    def layer_nbrs(node, layer: int):
        if layer == 0:
            return neighbors0[jnp.clip(node, 0, cap)]
        slot = upper_slot[jnp.clip(node, 0, cap)]
        row = upper_neighbors[
            jnp.clip(slot, 0, n_upper), (layer - 1) * m : layer * m
        ]
        return jnp.where(slot >= 0, row, -1)

    def one(q):
        e = jnp.clip(entry, 0, cap)
        cur = e
        cur_d = dist(q, values[e])

        for layer in range(lmax, 0, -1):
            active = layer <= entry_level

            def g_cond(state):
                return state[2]

            def g_body(state):
                c, cd, _ = state
                nbrs = layer_nbrs(c, layer)
                valid = (nbrs >= 0) & traversable[jnp.clip(nbrs, 0, cap)]
                d = dist(q, values[jnp.clip(nbrs, 0, cap)])
                d = jnp.where(valid, d, jnp.inf)
                b = jnp.argmin(d)
                moved = d[b] < cd
                return (
                    jnp.where(moved, nbrs[b], c),
                    jnp.where(moved, d[b], cd),
                    moved,
                )

            cur, cur_d, _ = jax.lax.while_loop(g_cond, g_body, (cur, cur_d, active))

        # ground beam — in-beam id dedup instead of a [cap+1] visited
        # bitmap (the bitmap's per-step scatter+gather measured 11-38x
        # slower at 1M rows on TPU for identical recall; see
        # _ground_beam_seeds)
        # packed beam key = id*2 + (1 - expanded), invalid = -2 (see
        # _ground_beam_seeds): 2-operand merge sorts per step
        beam_d = jnp.full((ef,), jnp.inf, jnp.float32).at[0].set(cur_d)
        beam_key = jnp.full((ef,), -2, jnp.int32).at[0].set(cur * 2 + 1)

        def cond(state):
            bd, bkey, steps = state
            unexp = jnp.where(bkey & 1 == 1, bd, jnp.inf)
            best = jnp.min(unexp)
            return (best <= jnp.max(bd)) & jnp.isfinite(best) & (steps < max_steps)

        def body(state):
            bd, bkey, steps = state
            unexp = jnp.where(bkey & 1 == 1, bd, jnp.inf)
            pos = jnp.argmin(unexp)
            u = bkey[pos] >> 1
            bkey = bkey.at[pos].set(bkey[pos] & ~1)
            nbrs = neighbors0[jnp.maximum(u, 0)]
            safe = jnp.clip(nbrs, 0, cap)
            mask = (nbrs >= 0) & traversable[safe]
            d_new = jnp.where(mask, dist(q, values[safe]), jnp.inf)
            key_new = jnp.where(mask, nbrs * 2 + 1, -2)
            all_d = jnp.concatenate([bd, d_new])
            all_key = jnp.concatenate([bkey, key_new])
            # dedup by id, expanded copy first, then rank by distance
            o_key, o_d = jax.lax.sort([all_key, all_d], num_keys=1)
            dup = jnp.concatenate(
                [jnp.zeros((1,), bool),
                 (o_key[1:] >> 1) == (o_key[:-1] >> 1)]
            )
            all_d = jnp.where(dup | (o_key < 0), jnp.inf, o_d)
            sd, skey = jax.lax.sort([all_d, o_key], num_keys=2)
            return (sd[:ef], skey[:ef], steps + 1)

        bd, bkey, _ = jax.lax.while_loop(
            cond, body, (beam_d, beam_key, jnp.int32(0))
        )
        bids = jnp.where(bkey >= 0, bkey >> 1, -1)
        sd, sids = jax.lax.sort([bd, bids], num_keys=2)
        return sd, sids

    return jax.vmap(one)(queries)


def bulk_build(index, data, ids, host_graph: bool = True,
               consume_input: bool = False):
    """Batched device bulk build (device_build.py: exact MXU-scored
    frozen-snapshot batch insertion)."""
    from . import device_build

    device_build.bulk_build(
        index, data, ids, host_graph=host_graph,
        consume_input=consume_input,
    )
