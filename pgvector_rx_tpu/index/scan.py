"""Index scans: k-NN search and iterative (resumable) scans.

Parity source: reference ``src/index/scan.rs``.
- :func:`get_scan_items` <-> scan.rs:458-530 (Algorithm 5: greedy descent
  ef=1 through upper layers, then ground search with ef_search)
- :func:`resume_scan_items` <-> scan.rs:538-577 (re-enter ground layer
  with up to ef_search discarded candidates, shared visited set)
- :class:`HnswScan` <-> HnswScanState + amgettuple (scan.rs:584-875):
  nearest-last result stack, per-element heap-TID emission, iterative
  off/relaxed_order/strict_order modes, max_scan_tuples cap with
  one-at-a-time discarded drain.

The batched device path (method="device") produces the same result sets
via graph/device.py and is validated against this host path.
"""

from __future__ import annotations

import heapq
import os
from typing import Optional

import numpy as np

from ..config import SearchParams
from ..constants import (
    HNSW_ITERATIVE_SCAN_OFF,
    HNSW_ITERATIVE_SCAN_RELAXED,
    HNSW_ITERATIVE_SCAN_STRICT,
)
from ..graph import host
from ..utils.stats import ScanStats


def get_scan_items(
    index,
    query,
    ef_search: int,
    visited: Optional[set] = None,
    discarded: Optional[list] = None,
    dist_many=None,
):
    """Algorithm 5. Returns candidates sorted nearest first."""
    if index.entry is None:
        return []
    entry_idx = index.entry
    if index.elements[entry_idx].deleted:
        return []
    dist_many = dist_many or index._dist_many

    ep = [(float(dist_many(query, [entry_idx])[0]), entry_idx)]
    ep_level = index.elements[entry_idx].level

    for lc in range(ep_level, 0, -1):
        w = host.search_layer(index.elements, ep, 1, lc, query, dist_many)
        if not w:
            return []
        ep = [w[0]]

    return host.search_layer(
        index.elements,
        ep,
        ef_search,
        0,
        query,
        dist_many,
        visited=visited,
        discarded=discarded,
    )


def resume_scan_items(
    index, query, ef_search: int, visited: set, discarded: list,
    dist_many=None,
):
    """Re-enter the ground layer from discarded candidates.

    Parity: scan.rs:538-577 — batch of up to ef_search entry points,
    entries NOT re-added to visited (already there).
    """
    if not discarded:
        return []
    ep = []
    for _ in range(ef_search):
        if not discarded:
            break
        ep.append(heapq.heappop(discarded))
    return host.search_layer(
        index.elements,
        ep,
        ef_search,
        0,
        query,
        dist_many or index._dist_many,
        visited=visited,
        discarded=discarded,
        add_entry_to_visited=False,
    )


class HnswScan:
    """A resumable scan over one query (amgettuple analog).

    Yields (heap_tid, operator_distance) pairs via :meth:`next` (l2
    order distances are converted from squared form at emission, so
    every scan engine emits the same distance domain), or None when
    exhausted. The visited set and discarded heap persist across
    resume re-entries — the reference's checkpoint/resume object
    (SURVEY.md §5 "Checkpoint / resume").
    """

    def __init__(self, index, query, params: SearchParams, filter_mask=None):
        self.index = index
        self.params = params
        # optional element-id filter (attribute-filtering analog,
        # tests/t/043,044): masked elements still count toward
        # max_scan_tuples — the reference's AM emits them and the
        # executor discards them, so the tuple budget is AM-side
        self.filter_mask = (
            None if filter_mask is None else np.asarray(filter_mask, bool)
        )
        self.query = index.prepare_value(query)
        if self.query is None and index.kind in ("dense", "sparse"):
            # cosine zero-norm query: reference normalize leaves zeros;
            # distances become 1 - 0 = 1 for all rows. Keep zeros.
            if index.kind == "dense":
                self.query = np.zeros(index.dim, dtype=np.float32)
            else:
                self.query = (
                    np.zeros(0, dtype=np.int32),
                    np.zeros(0, dtype=np.float32),
                )
        self.first = True
        self.results: list = []  # nearest LAST (pop from end)
        self.visited: set = set()
        self.discarded: list = []  # heapq min-heap
        self.tuples = 0
        self.previous_distance = -np.inf
        self._current: Optional[tuple] = None  # (distance, [remaining tids])
        # Elements already emitted. The reference can re-emit an element
        # across resume batches (evicted candidates are pushed to the
        # discarded heap both at eviction and again as leftover
        # candidates, scan.rs:420-437); we dedupe — a strict improvement
        # that keeps iterative scans exactly-once.
        self._emitted: set = set()
        # EXPLAIN ANALYZE analog (scan.rs:718-729, SURVEY §5): distances
        # computed, nodes visited, tuples out, resume re-entries
        self.scan_stats = ScanStats()
        _dm = index._dist_many

        def _counting_dist(q, ids):
            self.scan_stats.distances_computed += len(ids)
            return _dm(q, ids)

        self._dist_many = _counting_dist
        self.iterative = params.iterative_scan != HNSW_ITERATIVE_SCAN_OFF
        # iterative-scan memory budget (scan_mem_multiplier * work_mem):
        # estimated bytes of persistent scan state; checked before each
        # resume (see SearchParams docstring)
        self._mem_budget = params.scan_mem_multiplier * params.work_mem_bytes
        index.stats["scans"] += 1

    def _state_bytes(self) -> float:
        # CPython set entry ~60B, heap tuple entry ~80B — coarse but
        # monotone, which is all the cap needs
        return 60.0 * len(self.visited) + 80.0 * len(self.discarded)

    def _run_first(self) -> None:
        ef = self.params.ef_search
        if self.iterative:
            items = get_scan_items(
                self.index, self.query, ef, self.visited, self.discarded,
                dist_many=self._dist_many,
            )
        else:
            items = get_scan_items(
                self.index, self.query, ef, self.visited,
                dist_many=self._dist_many,
            )
        self.scan_stats.nodes_visited = len(self.visited)
        # store nearest last
        self.results = list(reversed(items))
        self.first = False

    def next(self) -> Optional[tuple]:
        """Next (heap_tid, operator_distance) or None."""
        if self.first:
            self._run_first()

        sqrt_out = self.index.metric == "l2"
        strict = self.params.iterative_scan == HNSW_ITERATIVE_SCAN_STRICT
        while True:
            if self._current is not None:
                dist, tids = self._current
                if tids:
                    tid = tids.pop()
                    if strict:
                        if dist < self.previous_distance:
                            continue
                        self.previous_distance = dist
                    self.scan_stats.tuples_returned += 1
                    if sqrt_out:
                        return tid, float(np.sqrt(max(dist, 0.0)))
                    return tid, dist
                self._current = None

            if not self.results:
                if not self.iterative:
                    return None
                if (
                    self.tuples >= self.params.max_scan_tuples
                    or self._state_bytes() > self._mem_budget
                ):
                    # Tuple or memory budget exhausted: drain discarded
                    # one at a time (scan.rs:828-841)
                    if not self.discarded:
                        return None
                    self.results.append(heapq.heappop(self.discarded))
                else:
                    self.index.stats["resumes"] += 1
                    self.scan_stats.resumes += 1
                    items = resume_scan_items(
                        self.index,
                        self.query,
                        self.params.ef_search,
                        self.visited,
                        self.discarded,
                        dist_many=self._dist_many,
                    )
                    self.scan_stats.nodes_visited = len(self.visited)
                    self.results = list(reversed(items))
                if not self.results:
                    return None

            dist, idx = self.results.pop()
            if idx in self._emitted:
                continue
            self._emitted.add(idx)
            tids = self.index.heap_tids[idx]
            if not tids:
                continue
            self.tuples += 1
            if self.filter_mask is not None and not (
                idx < len(self.filter_mask) and self.filter_mask[idx]
            ):
                continue  # executor-filtered tuple (budget already spent)
            # copy (reversed so .pop() yields slot order like the
            # reference's pop-from-end of the loaded array)
            self._current = (dist, list(reversed(tids)))

    def take(self, k: int) -> list[tuple]:
        out = []
        while len(out) < k:
            item = self.next()
            if item is None:
                break
            out.append(item)
        return out


class DeviceScan:
    """TPU-native iterative scan: stream results in exactly-ordered,
    geometrically growing exact top-k blocks.

    The structural analog of the reference's resumable iterative scan
    (visited set + discarded heap re-entering the graph,
    scan.rs:538-577) re-designed for the MXU: instead of spilling beam
    state and walking more edges, each resume re-runs the exact sweep
    at 4x the previous k and emits the new tail. Results arrive in true
    distance order, so strict_order and relaxed_order coincide and the
    filtered-recall contracts (tests/t/043,044) hold at recall 1.0;
    max_scan_tuples caps the stream exactly like the reference.

    For corpora past the exact sweep's economics, HnswScan (the graph
    path) remains the iterative engine.
    """

    def __init__(self, index, query, params: SearchParams):
        self.index = index
        self.params = params
        self.query = query
        self._block = max(params.ef_search, 16)
        self._emitted = 0  # tuples emitted
        self._buf: list = []  # pending (tid, dist), nearest first
        self._buf_pos = 0
        self._exhausted = False
        self._seen_elems = 0
        self.scan_stats = ScanStats()
        index.stats["scans"] += 1

    def _fetch(self) -> None:
        total = max(self.index.num_tuples, 1)
        # each exact block re-sweeps every stored row
        self.scan_stats.distances_computed += self.index.store.count
        k = min(self._block, total)
        dists, ids = self.index.search(
            np.atleast_2d(np.asarray(self.query, dtype=np.float32)),
            k,
            self.params,
            method="exact",
        )
        pairs = [
            (int(t), float(d))
            for t, d in zip(ids[0], dists[0])
            if t >= 0 and np.isfinite(d)
        ]
        self._buf = pairs[self._buf_pos :]
        self._buf_pos += len(self._buf)
        if k >= total:  # the sweep covered everything there is
            self._exhausted = True
        self._block *= 4

    def next(self):
        """Next (heap_tid, operator_distance) or None."""
        if self._emitted >= self.params.max_scan_tuples:
            return None
        while not self._buf:
            if self._exhausted:
                return None
            if self._buf_pos > 0:  # re-entries only (first block isn't one)
                self.scan_stats.resumes += 1
            self.index.stats["resumes"] += 1
            self._fetch()
        tid, d = self._buf.pop(0)
        self._emitted += 1
        self.scan_stats.tuples_returned += 1
        return tid, d

    def take(self, k: int) -> list[tuple]:
        out = []
        while len(out) < k:
            item = self.next()
            if item is None:
                break
            out.append(item)
        return out


class DeviceBeamScan:
    """Resumable DEVICE beam scan: the iterative scan for corpora past
    the exact sweep's economics (>4M rows/chip, where beam is the only
    engine).

    Structural port of the reference's spilled-candidate resume
    (scan.rs:538-577) to the batched device beam: each segment runs
    the fixed-shape beam (graph/device._beam_scan_segment) which
    CAPTURES its evicted candidates (the discarded-heap analog) in a
    device spill buffer; emitted elements scatter into a device
    exclusion mask (the shared visited set's role); the next segment
    re-enters the ground layer seeded by the spill. Per-resume traffic
    is O(ef) ids/distances — never a corpus re-sweep (DeviceScan's
    geometric exact blocks remain the engine below the exact cutover).

    Ordering: segments are internally sorted; across segments order can
    regress exactly like the reference's relaxed_order; strict_order
    suppresses out-of-order emissions (scan.rs:801-806).

    Windowed strict order (default on; ``PGV_STRICT_BUFFER=0`` restores
    the reference's drop-on-regression semantics): under strict_order,
    emissions are held in a sorted buffer and the global minimum is
    released only once the buffer holds more than L segments' worth of
    results (L = PGV_STRICT_BUFFER, default 4) — a sliding reorder
    window. A spill-watermark rule does NOT work here: the spill
    minimum is >= the emitted beam max by construction (anything
    nearer would be in the beam), so it never holds anything back; the
    order regressions are later segments DISCOVERING items below the
    watermark while exploring the spill, and they are overwhelmingly
    near-term — an L-segment window reorders them instead of
    permanently dropping them (scan.rs:801-806). The emitted stream
    stays nondecreasing (the strict contract); regressions deeper than
    L segments are still dropped by the strict filter. Latency cost:
    the first result waits ~L+1 segments; steady-state emission rate
    is unchanged.

    ``filter_mask`` (element-id bool mask): masked elements consume
    tuple budget and are dropped at emission, the reference's
    executor-filter semantics (tests/t/043,044).
    """

    def __init__(self, index, query, params: SearchParams, filter_mask=None):
        import jax.numpy as jnp

        from ..graph import device as dm

        if index.kind != "dense":
            raise ValueError("DeviceBeamScan supports dense indexes only")
        self.index = index
        self.params = params
        self.filter_mask = (
            None if filter_mask is None else np.asarray(filter_mask, bool)
        )
        self._dm = dm
        self.g = index.device_graph()
        q = dm.prepare_queries(index, np.atleast_2d(
            np.asarray(query, dtype=np.float32)
        ))
        self.q = q[0]
        ef = max(params.ef_search, 1)
        self._ef = ef
        # internal beam wider than the emitted ef: the device analog of
        # Algorithm 2's unbounded to-expand heap — keeps boundary
        # candidates explorable within the segment so later segments
        # rarely discover nearer items than ones already emitted (order
        # regressions that strict_order must drop, scan.rs:801-806).
        # Width 4x measured on the 044 50k contract: strict_order
        # recall 0.93-0.985 -> >=0.99 (probes/probe_beamscan_width.py)
        self._width = max(
            ef * int(os.environ.get("PGV_BEAM_SCAN_WIDTH_MULT", 4)), ef
        )
        self._spill_w = max(2 * ef, 64) + (self._width - ef)
        self._max_steps = 4 * self._width + 32
        self._expand = int(os.environ.get("PGV_BEAM_EXPAND", 1))
        self._excluded = jnp.zeros((self.g.traversable.shape[0],), jnp.bool_)
        # first-segment seeds (padded to the spill width so every
        # segment reuses ONE compiled program)
        if self.g.entry < 0:
            self._seeds = None
            self._exhausted = True
        else:
            upper = dm._coarse_upper(self.g)
            if upper is not None:
                s_ids, s_d = dm._coarse_seed_one(
                    self.g, self.q, upper[0], upper[1],
                    n_seeds=min(8, ef),
                )
            else:
                s_ids, s_d = dm._descent_seed_one(
                    self.g, self.q, self.g.entry_level
                )
            pad = self._spill_w - s_ids.shape[0]
            self._seeds = (
                jnp.pad(s_ids, (0, pad), constant_values=-1),
                jnp.pad(s_d, (0, pad), constant_values=jnp.inf),
            )
            self._exhausted = False
        self._buf: list = []  # pending (dist, element id), nearest first
        self._current: Optional[tuple] = None  # (dist, [remaining tids])
        self._spill_host: Optional[list] = None  # drain-mode buffer
        # strict-order holdback heap of (dist, id): the sliding reorder
        # window (see class docstring)
        self._hold: list = []
        self._strict_window = max(
            int(os.environ.get("PGV_STRICT_BUFFER", "4")), 0
        )
        self._pending = None  # dispatched-but-undownloaded segment
        self._first = True
        self.tuples = 0
        self.previous_distance = -np.inf
        self.scan_stats = ScanStats()
        index.stats["scans"] += 1

    def _segment_dispatch(self) -> None:
        """Issue one beam segment on device WITHOUT downloading results
        (jax dispatch is async). The scan state (seeds, exclusion mask)
        advances immediately as device arrays, so multiple scans over
        DIFFERENT devices (ShardedScan's shard-per-chip streams) can
        all be in flight at once — init/resume latency becomes
        max-over-shards instead of sum-over-shards."""
        dm = self._dm
        beam_d, beam_ids, sp_d, sp_ids, steps = dm._beam_scan_segment(
            self.g,
            self.q,
            self._seeds[0],
            self._seeds[1],
            self._excluded,
            self._ef,
            self._spill_w,
            self._max_steps,
            self._expand,
            self._width,
        )
        # everything in the returned beam will be emitted: exclude it
        # from future segments (one device scatter, no host round-trip
        # of the mask)
        self._excluded = dm._mark_excluded(self._excluded, beam_ids)
        self._seeds = (sp_ids, sp_d)
        self._pending = (beam_d, beam_ids, sp_ids, steps)

    def prefetch(self) -> None:
        """Dispatch the next segment if one would be needed, without
        blocking on its results (ShardedScan calls this on every shard
        before pulling any — the reference's scan has no analog; its
        backends are independently parallel by construction)."""
        if (
            self._pending is None
            and not self._exhausted
            and not self._buf
            and self._seeds is not None
        ):
            self._first = False
            self._segment_dispatch()

    def _segment(self) -> None:
        """Run one beam segment on device; refill the host buffer."""
        if self._pending is None:
            self._segment_dispatch()
        beam_d, beam_ids, sp_ids, steps = self._pending
        self._pending = None
        d_host = np.asarray(beam_d, dtype=np.float64)
        i_host = np.asarray(beam_ids)
        self.scan_stats.beam_steps += int(np.asarray(steps))
        lm0 = self.g.neighbors0.shape[1]
        self.scan_stats.distances_computed += (
            int(np.asarray(steps)) * self._expand * lm0
        )
        keep = (i_host >= 0) & np.isfinite(d_host)
        self._buf = list(zip(d_host[keep], i_host[keep]))
        if not self._buf:
            # segment found nothing new: the spill is the only fuel
            # left; if it is empty too the scan is exhausted
            sp_ids_h = np.asarray(sp_ids)
            if not (sp_ids_h >= 0).any():
                self._exhausted = True

    def _drain_one(self) -> None:
        """Budget exhausted: emit spilled candidates one at a time
        without further graph work (scan.rs:828-841 analog)."""
        if self._spill_host is None:
            sp_ids = np.asarray(self._seeds[0])
            sp_d = np.asarray(self._seeds[1], dtype=np.float64)
            keep = (sp_ids >= 0) & np.isfinite(sp_d)
            self._spill_host = list(zip(sp_d[keep], sp_ids[keep]))
        if self._spill_host:
            self._buf = [self._spill_host.pop(0)]
        else:
            self._exhausted = True

    def next(self) -> Optional[tuple]:
        """Next (heap_tid, operator_distance) or None."""
        sqrt_out = self.index.metric == "l2"
        strict = self.params.iterative_scan == HNSW_ITERATIVE_SCAN_STRICT
        iterative = self.params.iterative_scan != HNSW_ITERATIVE_SCAN_OFF
        buffered = strict and self._strict_window > 0
        while True:
            if self._current is not None:
                dist, tids = self._current
                if tids:
                    tid = tids.pop()
                    if strict:
                        if dist < self.previous_distance:
                            continue
                        self.previous_distance = dist
                    self.scan_stats.tuples_returned += 1
                    if sqrt_out:
                        return tid, float(np.sqrt(max(dist, 0.0)))
                    return tid, dist
                self._current = None

            if buffered and self._buf:
                for d_, i_ in self._buf:
                    heapq.heappush(self._hold, (float(d_), int(i_)))
                self._buf = []

            ready = None
            if buffered:
                # sliding reorder window: emit the global minimum only
                # once the hold exceeds L segments' worth of results
                # (0 in drain mode: pure sorted merge with the spill).
                # A dispatched-but-unconsumed segment is consumed first
                # — its arrivals belong in the reorder comparison.
                cap = (
                    0
                    if self._spill_host is not None
                    else self._strict_window * self._ef
                )
                if self._hold and self._pending is None and (
                    self._exhausted or len(self._hold) > cap
                ):
                    ready = heapq.heappop(self._hold)
            elif self._buf:
                ready = self._buf.pop(0)

            if ready is None:
                if self._exhausted:
                    if buffered and self._hold:  # exhaustion flush
                        ready = heapq.heappop(self._hold)
                    else:
                        return None
                elif self._pending is not None:
                    self._segment()  # consume a prefetched dispatch
                    continue
                elif self._first and self._seeds is not None:
                    self._first = False
                    self._segment()  # first segment
                    continue
                elif not iterative:
                    if buffered and self._hold:
                        # no further graph work will come: flush in order
                        ready = heapq.heappop(self._hold)
                    else:
                        return None
                elif self.tuples >= self.params.max_scan_tuples:
                    self._drain_one()
                    continue
                else:
                    self.index.stats["resumes"] += 1
                    self.scan_stats.resumes += 1
                    self._segment()
                    continue

            dist, idx = ready
            idx = int(idx)
            tids = self.index.heap_tids[idx]
            if not tids:
                continue
            self.tuples += 1
            if self.filter_mask is not None and not (
                idx < len(self.filter_mask) and self.filter_mask[idx]
            ):
                continue  # executor-filtered tuple (budget already spent)
            self._current = (float(dist), list(reversed(tids)))

    def take(self, k: int) -> list[tuple]:
        out = []
        while len(out) < k:
            item = self.next()
            if item is None:
                break
            out.append(item)
        return out


def search(index, queries, k: int, params: SearchParams, method: str = "auto",
           filter_mask=None):
    """Batch k-NN. Returns (distances [B,k] operator-domain, ids [B,k]).

    method="host" walks the reference scan path per query;
    method="device" uses the batched beam search over the device graph;
    method="exact" uses the MXU exact sweep (dense only); "auto" picks
    the device for dense batches >= 32 queries, letting the device layer
    choose exact vs beam by corpus size (graph/device.py).

    ``filter_mask``: optional bool array over element ids (attribute
    filtering, tests/t/043,044 analog). Device exact/approx engines
    pre-filter inside the sweep; the host path filters at emission under
    the iterative-scan budget like the reference's executor.
    """
    import jax

    if isinstance(queries, jax.Array):
        # device-staged query batch: pass through untouched (serving
        # steady state — queries already in HBM)
        single = queries.ndim == 1
        qlist = queries[None] if single else queries
    else:
        single = _is_single_query(index, queries)
        qlist = [queries] if single else list(queries)

    engine = {
        "device": "beam",
        "exact": "exact",
        "approx": "approx",
        "auto": "auto",
    }.get(method)
    use_device = method in ("device", "exact", "approx") or (
        method == "auto"
        and (
            (index.kind == "dense" and (len(qlist) >= 32 or index.serving_only))
            # serving-only non-dense indexes (device bit build) have no
            # host elements — the device engines are the only path
            or (index.kind != "dense" and index.serving_only)
        )
    )
    if use_device:
        from ..graph import device as device_mod

        dists, ids = device_mod.search(
            index, qlist, k, params, engine=engine, filter_mask=filter_mask
        )
        # order-distance -> operator-distance (l2: sqrt; others same)
        if index.metric == "l2":
            dists = np.where(
                np.isfinite(dists), np.sqrt(np.maximum(dists, 0.0)), dists
            )
    else:
        B = len(qlist)
        dists = np.full((B, k), np.inf, dtype=np.float64)
        ids = np.full((B, k), -1, dtype=np.int64)
        agg = ScanStats()
        for b, q in enumerate(qlist):
            scan = HnswScan(index, q, params, filter_mask=filter_mask)
            # HnswScan already emits operator-domain distances
            for j, (tid, d) in enumerate(scan.take(k)):
                dists[b, j] = d
                ids[b, j] = tid
            agg.merge(scan.scan_stats)
        index.last_scan_stats = agg
    if single:
        return dists[0], ids[0]
    return dists, ids


def _is_single_query(index, queries) -> bool:
    if index.kind == "sparse":
        from ..types.sparsevec import SparseVec

        return isinstance(queries, (SparseVec, tuple))
    arr = np.asarray(queries)
    return arr.ndim == 1
