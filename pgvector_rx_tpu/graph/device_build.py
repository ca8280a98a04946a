"""Batched device bulk build: HNSW construction as tensor ops.

The TPU-native replacement for the reference's sequential heap-scan build
(build.rs:400-535, one graph insertion per tuple). Construction proceeds
in batches against a frozen graph snapshot:

  for each batch (size doubling until BMAX):
    1. [device] every new element searches the frozen graph (greedy
       descent + ef_construction beam per layer, Alg. 1/2) and selects
       its neighbors per layer (vectorized Alg. 4 heuristic)
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
at final capacity, batches padded to the schedule size, and per-layer
loops unrolled over a static LMAX.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import hnsw_get_layer_m


class BuildArrays(NamedTuple):
    """Mutable graph state threaded through the jitted steps."""

    neighbors0: jax.Array  # [cap+1, 2m] int32, -1 pad
    nbr0_dist: jax.Array  # [cap+1, 2m] f32, +inf pad
    upper_nbrs: jax.Array  # [U+1, LMAX, m] int32
    upper_dist: jax.Array  # [U+1, LMAX, m] f32
    entry: jax.Array  # scalar int32 (-1 empty)
    entry_level: jax.Array  # scalar int32


# ---------------------------------------------------------------------------
# distance helpers (dense f32; bit/sparse handled by the host path for now)
# ---------------------------------------------------------------------------


def _make_dist(metric: str):
    if metric == "l2":

        def d(q, c):  # q [D], c [..., D]
            diff = c - q
            return jnp.sum(diff * diff, axis=-1)

    elif metric == "ip":

        def d(q, c):
            return -jnp.sum(c * q, axis=-1)

    elif metric == "cosine":

        def d(q, c):
            return 1.0 - jnp.clip(jnp.sum(c * q, axis=-1), -1.0, 1.0)

    elif metric == "l1":

        def d(q, c):
            return jnp.sum(jnp.abs(c - q), axis=-1)

    else:
        raise ValueError(metric)
    return d


def _pair_matrix(metric: str, rows):
    """All-pairs order distances among rows [..., C, D] -> [..., C, C]."""
    if metric == "l2":
        d = rows[..., :, None, :] - rows[..., None, :, :]
        return jnp.sum(d * d, axis=-1)
    if metric == "ip":
        return -jnp.einsum("...id,...jd->...ij", rows, rows)
    if metric == "cosine":
        sims = jnp.einsum("...id,...jd->...ij", rows, rows)
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


# ---------------------------------------------------------------------------
# per-batch search step (jitted)
# ---------------------------------------------------------------------------


class DeviceBuilder:
    """Owns the device arrays + compiled steps for one bulk build."""

    def __init__(self, metric: str, vectors: np.ndarray, levels: np.ndarray, m: int,
                 ef_construction: int, batch_max: int = 1024):
        self.metric = metric
        self.m = m
        self.efc = ef_construction
        self.cap = vectors.shape[0]
        self.dim = vectors.shape[1]
        self.batch_max = batch_max
        self.lm0 = hnsw_get_layer_m(m, 0)
        self.lmax = max(int(levels.max()) if len(levels) else 0, 1)

        # capacity+1: last row is a scatter dump / gather pad target
        pad_row = np.zeros((1, self.dim), dtype=np.float32)
        self.vectors = jnp.asarray(
            np.concatenate([vectors.astype(np.float32), pad_row])
        )
        self.levels = jnp.asarray(
            np.concatenate([levels.astype(np.int32), [-1]])
        )

        upper_slot = np.full(self.cap + 1, -1, dtype=np.int32)
        ups = np.nonzero(levels >= 1)[0]
        upper_slot[ups] = np.arange(len(ups), dtype=np.int32)
        self.upper_slot = jnp.asarray(upper_slot)
        self.n_upper = len(ups)

        self.arrays = BuildArrays(
            neighbors0=jnp.full((self.cap + 1, self.lm0), -1, dtype=jnp.int32),
            nbr0_dist=jnp.full((self.cap + 1, self.lm0), jnp.inf, dtype=jnp.float32),
            upper_nbrs=jnp.full(
                (self.n_upper + 1, self.lmax, m), -1, dtype=jnp.int32
            ),
            upper_dist=jnp.full(
                (self.n_upper + 1, self.lmax, m), jnp.inf, dtype=jnp.float32
            ),
            entry=jnp.int32(-1),
            entry_level=jnp.int32(-1),
        )
        self._dist = _make_dist(metric)
        self._search_jit = jax.jit(self._search_step)
        self._commit_jit = jax.jit(self._commit_step, donate_argnums=(0,))

    # -- step 1: search + per-layer selection -------------------------------

    def _layer_nbrs(self, arrays: BuildArrays, node, layer: int):
        """Neighbor ids of `node` at static `layer` (gather)."""
        if layer == 0:
            return arrays.neighbors0[jnp.clip(node, 0, self.cap)]
        slot = self.upper_slot[jnp.clip(node, 0, self.cap)]
        row = arrays.upper_nbrs[jnp.clip(slot, 0, self.n_upper), layer - 1]
        return jnp.where(slot >= 0, row, -1)

    def _greedy(self, arrays, q, cur, cur_d, layer: int, active):
        """Masked ef=1 greedy step loop at an upper layer."""

        def cond(state):
            return state[2]

        def body(state):
            c, cd, _ = state
            nbrs = self._layer_nbrs(arrays, c, layer)
            valid = nbrs >= 0
            d = self._dist(q, self.vectors[jnp.clip(nbrs, 0, self.cap)])
            d = jnp.where(valid, d, jnp.inf)
            b = jnp.argmin(d)
            bd = d[b]
            moved = bd < cd
            return (
                jnp.where(moved, nbrs[b], c),
                jnp.where(moved, bd, cd),
                moved,
            )

        out = jax.lax.while_loop(cond, body, (cur, cur_d, active))
        return out[0], out[1]

    def _beam(self, arrays, q, ep_d, ep_ids, ef: int, layer: int, max_steps: int):
        """Masked beam search at `layer` with beam size ef (single query).

        ep_d/ep_ids [ef]: initial beam (+inf/-1 pads). Returns sorted
        (d, ids) [ef].
        """
        beam_d = ep_d
        beam_ids = ep_ids
        beam_exp = jnp.where(jnp.isfinite(ep_d), 0, 1).astype(jnp.int32)
        visited = jnp.zeros((self.cap + 1,), dtype=jnp.bool_)
        visited = visited.at[jnp.where(ep_ids >= 0, ep_ids, self.cap)].set(True)

        def cond(state):
            beam_d, beam_ids, beam_exp, visited, steps = state
            unexp = jnp.where(beam_exp == 1, jnp.inf, beam_d)
            best = jnp.min(unexp)
            furthest = jnp.max(beam_d)
            return (best <= furthest) & jnp.isfinite(best) & (steps < max_steps)

        def body(state):
            beam_d, beam_ids, beam_exp, visited, steps = state
            unexp = jnp.where(beam_exp == 1, jnp.inf, beam_d)
            pos = jnp.argmin(unexp)
            u = beam_ids[pos]
            beam_exp = beam_exp.at[pos].set(1)

            nbrs = self._layer_nbrs(arrays, u, layer)
            safe = jnp.clip(nbrs, 0, self.cap)
            mask = (nbrs >= 0) & ~visited[safe]
            visited = visited.at[jnp.where(nbrs >= 0, nbrs, self.cap)].set(True)
            d_new = self._dist(q, self.vectors[safe])
            d_new = jnp.where(mask, d_new, jnp.inf)
            ids_new = jnp.where(mask, nbrs, -1)
            exp_new = jnp.where(mask, 0, 1)

            all_d = jnp.concatenate([beam_d, d_new])
            all_ids = jnp.concatenate([beam_ids, ids_new])
            all_exp = jnp.concatenate([beam_exp, exp_new])
            sd, sids, sexp = jax.lax.sort([all_d, all_ids, all_exp], num_keys=2)
            return (sd[:ef], sids[:ef], sexp[:ef], visited, steps + 1)

        beam_d, beam_ids, _, _, _ = jax.lax.while_loop(
            cond, body, (beam_d, beam_ids, beam_exp, visited, jnp.int32(0))
        )
        return beam_d, beam_ids

    def _search_step(self, arrays: BuildArrays, new_ids, batch_mask):
        """For each new element: neighbors per layer.

        Returns sel_d, sel_ids of shape [B, LMAX+1, lm0] (layer axis 0 =
        ground; upper layers use the first m slots).
        """
        efc = self.efc
        max_steps = 2 * efc + 16

        def one(nid, active):
            q = self.vectors[jnp.clip(nid, 0, self.cap)]
            my_level = self.levels[jnp.clip(nid, 0, self.cap)]
            entry = arrays.entry
            e_level = arrays.entry_level
            d0 = self._dist(q, self.vectors[jnp.clip(entry, 0, self.cap)])
            cur, cur_d = entry, d0

            sel_d = jnp.full((self.lmax + 1, self.lm0), jnp.inf, dtype=jnp.float32)
            sel_ids = jnp.full((self.lmax + 1, self.lm0), -1, dtype=jnp.int32)

            # Phase 1: greedy descent for layers above my own
            for layer in range(self.lmax, 0, -1):
                act = active & (layer <= e_level) & (layer > my_level)
                cur, cur_d = self._greedy(arrays, q, cur, cur_d, layer, act)

            # Phase 2: beam + select per layer from min(level, entry) down
            beam_d = jnp.full((efc,), jnp.inf, dtype=jnp.float32).at[0].set(cur_d)
            beam_ids = jnp.full((efc,), -1, dtype=jnp.int32).at[0].set(cur)
            for layer in range(self.lmax, -1, -1):
                lm = hnsw_get_layer_m(self.m, layer)
                act = active & (layer <= jnp.minimum(my_level, e_level))

                new_bd, new_bids = self._beam(
                    arrays, q, beam_d, beam_ids, efc, layer, max_steps
                )
                # inactive layers keep the previous beam
                beam_d = jnp.where(act, new_bd, beam_d)
                beam_ids = jnp.where(act, new_bids, beam_ids)

                # selection for this layer (masked)
                cand_rows = self.vectors[jnp.clip(beam_ids, 0, self.cap)]
                pair = _pair_matrix(self.metric, cand_rows[None])[0]
                pair = jnp.where(
                    (beam_ids[None, :] < 0) | (beam_ids[:, None] < 0), jnp.inf, pair
                )
                sd, sids = _select_neighbors_batch(
                    beam_d[None], beam_ids[None], pair[None], lm
                )
                pad = self.lm0 - lm
                row_d = jnp.pad(sd[0], (0, pad), constant_values=jnp.inf)
                row_i = jnp.pad(sids[0], (0, pad), constant_values=-1)
                sel_d = sel_d.at[layer].set(jnp.where(act, row_d, sel_d[layer]))
                sel_ids = sel_ids.at[layer].set(
                    jnp.where(act, row_i, sel_ids[layer])
                )
            return sel_d, sel_ids

        return jax.vmap(one)(new_ids, batch_mask)

    # -- step 2: commit ------------------------------------------------------

    def _commit_step(self, arrays: BuildArrays, new_ids, sel_d, sel_ids, alive):
        """Write forward edges, resolve back edges, promote entry."""
        B = new_ids.shape[0]
        dump = self.cap  # scatter target for masked-out rows

        # ---- forward edges
        fwd_target = jnp.where(alive, new_ids, dump)
        arrays = arrays._replace(
            neighbors0=arrays.neighbors0.at[fwd_target].set(sel_ids[:, 0, :]),
            nbr0_dist=arrays.nbr0_dist.at[fwd_target].set(sel_d[:, 0, :]),
        )
        for layer in range(1, self.lmax + 1):
            slot = self.upper_slot[jnp.clip(new_ids, 0, self.cap)]
            target = jnp.where(alive & (slot >= 0), slot, self.n_upper)
            arrays = arrays._replace(
                upper_nbrs=arrays.upper_nbrs.at[target, layer - 1].set(
                    sel_ids[:, layer, : self.m]
                ),
                upper_dist=arrays.upper_dist.at[target, layer - 1].set(
                    sel_d[:, layer, : self.m]
                ),
            )

        # ---- back edges, layer by layer
        for layer in range(0, self.lmax + 1):
            lm = hnsw_get_layer_m(self.m, layer)
            K = min(lm, 16)  # max adds per target per batch
            tgt = sel_ids[:, layer, :lm].reshape(-1)  # [B*lm]
            dst = sel_d[:, layer, :lm].reshape(-1)
            src = jnp.broadcast_to(new_ids[:, None], (B, lm)).reshape(-1)
            valid = (tgt >= 0) & jnp.broadcast_to(
                alive[:, None], (B, lm)
            ).reshape(-1)
            tgt = jnp.where(valid, tgt, dump)
            dst = jnp.where(valid, dst, jnp.inf)

            # group by (target, distance)
            s_tgt, s_d, s_src = jax.lax.sort([tgt, dst, src], num_keys=2)
            R = s_tgt.shape[0]
            iota = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)[:, 0]
            head = jnp.concatenate(
                [jnp.array([True]), s_tgt[1:] != s_tgt[:-1]]
            ) & (s_tgt < dump)

            # adds window per head: rows i..i+K-1 with same target
            win_idx = iota[:, None] + jnp.arange(K)[None, :]  # [R, K]
            win_idx_c = jnp.minimum(win_idx, R - 1)
            win_tgt = s_tgt[win_idx_c]
            same = win_tgt == s_tgt[:, None]
            add_ids = jnp.where(same, s_src[win_idx_c], -1)
            add_d = jnp.where(same, s_d[win_idx_c], jnp.inf)

            # old rows
            if layer == 0:
                old_ids = arrays.neighbors0[s_tgt]
                old_d = arrays.nbr0_dist[s_tgt]
            else:
                slot = self.upper_slot[s_tgt]
                slot_c = jnp.clip(slot, 0, self.n_upper)
                old_ids = arrays.upper_nbrs[slot_c, layer - 1]
                old_d = arrays.upper_dist[slot_c, layer - 1]

            cand_ids = jnp.concatenate([old_ids, add_ids], axis=1)  # [R, lm+K]
            cand_d = jnp.concatenate([old_d, add_d], axis=1)
            order = jnp.argsort(
                jnp.where(cand_ids < 0, jnp.inf, cand_d), axis=1
            )
            cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
            cand_d = jnp.take_along_axis(cand_d, order, axis=1)
            cand_d = jnp.where(cand_ids < 0, jnp.inf, cand_d)

            # prune via Alg. 4 in chunks to bound the [chunk, C, C, D]
            # pairwise memory
            def prune(chunk):
                c_ids, c_d = chunk
                rows = self.vectors[jnp.clip(c_ids, 0, self.cap)]
                pair = _pair_matrix(self.metric, rows)
                pair = jnp.where(
                    (c_ids[:, None, :] < 0) | (c_ids[:, :, None] < 0),
                    jnp.inf,
                    pair,
                )
                return _select_neighbors_batch(c_d, c_ids, pair, lm)

            CH = 2048
            pad_to = ((R + CH - 1) // CH) * CH
            pr = pad_to - R
            ci = jnp.pad(cand_ids, ((0, pr), (0, 0)), constant_values=-1)
            cd = jnp.pad(cand_d, ((0, pr), (0, 0)), constant_values=jnp.inf)
            ci = ci.reshape(-1, CH, ci.shape[1])
            cd = cd.reshape(-1, CH, cd.shape[1])
            nd, nids = jax.lax.map(prune, (ci, cd))
            nd = nd.reshape(pad_to, lm)[:R]
            nids = nids.reshape(pad_to, lm)[:R]

            scatter_tgt = jnp.where(head, s_tgt, dump)
            if layer == 0:
                arrays = arrays._replace(
                    neighbors0=arrays.neighbors0.at[scatter_tgt].set(nids),
                    nbr0_dist=arrays.nbr0_dist.at[scatter_tgt].set(nd),
                )
            else:
                slot = self.upper_slot[jnp.clip(scatter_tgt, 0, self.cap)]
                sslot = jnp.where(head & (slot >= 0), slot, self.n_upper)
                arrays = arrays._replace(
                    upper_nbrs=arrays.upper_nbrs.at[sslot, layer - 1].set(nids),
                    upper_dist=arrays.upper_dist.at[sslot, layer - 1].set(nd),
                )

        # ---- entry promotion: first alive element reaching the batch max
        lv = jnp.where(alive, self.levels[jnp.clip(new_ids, 0, self.cap)], -1)
        batch_max = jnp.max(lv)
        promote = batch_max > arrays.entry_level
        first = jnp.argmax(lv == batch_max)
        arrays = arrays._replace(
            entry=jnp.where(promote, new_ids[first], arrays.entry),
            entry_level=jnp.where(promote, batch_max, arrays.entry_level),
        )
        return arrays

    # -- public driver -------------------------------------------------------

    def seed_first(self, first_id: int) -> None:
        self.arrays = self.arrays._replace(
            entry=jnp.int32(first_id),
            entry_level=self.levels[first_id],
        )

    def run_batch(self, ids: np.ndarray, tid_lookup, heap_tids) -> np.ndarray:
        """Insert `ids` (<= batch_max). Returns alive mask (False =
        absorbed as duplicate). `heap_tids` is the host TID table,
        mutated for duplicate folding."""
        B = self.batch_max
        n = len(ids)
        padded = np.full(B, self.cap, dtype=np.int32)
        padded[:n] = ids
        mask = np.zeros(B, dtype=bool)
        mask[:n] = True

        sel_d, sel_ids = self._search_jit(
            self.arrays, jnp.asarray(padded), jnp.asarray(mask)
        )
        sel_d_np = np.asarray(sel_d)
        sel_ids_np = np.asarray(sel_ids)

        # host duplicate folding (byte equality on zero-distance
        # layer-0 selected neighbors; build.rs:474-510)
        alive = mask.copy()
        vecs = None
        for j in range(n):
            row = sel_d_np[j, 0]
            if not (row == 0.0).any():
                continue
            if vecs is None:
                vecs = np.asarray(self.vectors).view(np.uint32)
            me = int(ids[j])
            for slot_pos in range(len(row)):
                if row[slot_pos] != 0.0:
                    break
                cand = int(sel_ids_np[j, 0, slot_pos])
                if cand < 0:
                    break
                if (
                    np.array_equal(vecs[me], vecs[cand])
                    and 0 < len(heap_tids[cand]) < 10
                ):
                    heap_tids[cand].extend(heap_tids[me])
                    heap_tids[me] = []
                    alive[j] = False
                    break

        self.arrays = self._commit_jit(
            self.arrays,
            jnp.asarray(padded),
            sel_d,
            sel_ids,
            jnp.asarray(alive),
        )
        return alive[:n]


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


def bulk_build(index, data, ids) -> None:
    """Entry point called by HnswIndex.build(method='device').

    Prepares values (cosine normalize / zero-skip), assigns levels with
    the index RNG, runs the batched build, then populates the host index
    structures from the final device arrays.
    """
    from ..graph.host import GraphElement

    n_in = len(data)
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
    levels = np.array([index.random_level() for _ in range(n)], dtype=np.int32)

    builder = DeviceBuilder(
        index.metric,
        vectors,
        levels,
        index.params.m,
        index.params.ef_construction,
        batch_max=min(1024, max(64, n // 8 or 1)),
    )

    heap_tids = [[t] for t in kept_tids]
    builder.seed_first(0)
    for start, size in batch_schedule(n, builder.batch_max):
        builder.run_batch(
            np.arange(start, start + size, dtype=np.int32), None, heap_tids
        )

    # ---- populate the host index from the device arrays
    neighbors0 = np.asarray(builder.arrays.neighbors0)[: n]
    nbr0_dist = np.asarray(builder.arrays.nbr0_dist)[: n]
    upper_nbrs = np.asarray(builder.arrays.upper_nbrs)
    upper_dist = np.asarray(builder.arrays.upper_dist)
    upper_slot = np.asarray(builder.upper_slot)[: n]

    base = len(index.elements)
    assert base == 0, "device bulk build requires an empty index"
    store_dtype = index.dtype or np.float32
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
        index.store.append(vectors[i].astype(store_dtype))
        index.heap_tids.append(heap_tids[i])

    entry = int(np.asarray(builder.arrays.entry))
    index.entry = entry if entry >= 0 else None
    index._invalidate_device()
