"""Sharded HNSW: node-partitioned sub-graphs over a device mesh.

Design (new — the reference is single-node; SURVEY.md §5 "Distributed
communication backend"): vectors are partitioned round-robin across
shards; each shard owns an independent HNSW sub-graph built over its
partition. A query searches every shard's sub-graph in SPMD
(shard_map over a 1-D mesh), then per-shard top-k results are combined
with ONE ``jax.lax.all_gather`` over ICI followed by a local merge —
no cross-shard traffic during graph traversal, which would otherwise
serialize every hop on the interconnect.

Recall: the union of per-shard beams is a superset of what a single
monolithic graph's beam would cover at equal total ef, so recall at
matched settings is >= the single-graph recall (each shard searches
ef deep in its own partition).

Mutations: inserts route to the smallest shard (round-robin for bulk);
deletes broadcast (each shard drops its own TIDs). Each shard reuses
the single-chip build/insert/vacuum machinery.
"""

from __future__ import annotations

import functools
import sys as _sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import IndexParams, SearchParams
from ..graph import device as device_mod
from ..index.hnsw import HnswIndex, _is_device_data


class ShardedHnswIndex:
    """A dense-metric HNSW index sharded across a jax Mesh axis."""

    def __init__(self, shards: Sequence[HnswIndex], mesh: Optional[Mesh] = None):
        if not shards:
            raise ValueError("need at least one shard")
        self.shards = list(shards)
        self.metric = shards[0].metric
        self.dim = shards[0].dim
        self.params = shards[0].params
        if mesh is None:
            devs = np.array(jax.devices()[: len(shards)])
            mesh = Mesh(devs, ("shard",))
        if mesh.devices.size != len(shards):
            raise ValueError(
                f"mesh has {mesh.devices.size} devices but {len(shards)} shards"
            )
        self.mesh = mesh
        self._stacked = None

    # -- construction --------------------------------------------------------

    @classmethod
    def build(
        cls,
        data,
        n_shards: int,
        metric: str = "l2",
        params: IndexParams | None = None,
        ids: Optional[Sequence[int]] = None,
        mesh: Optional[Mesh] = None,
        method: str = "auto",
        seed: int = 0,
        host_graph: bool = True,
        dtype=None,
        checkpoint_dir=None,
    ) -> "ShardedHnswIndex":
        """Round-robin partition + per-shard build.

        ``checkpoint_dir``: per-shard build checkpointing — each
        completed shard is saved to ``{dir}/shard_{i:05d}`` the moment
        it finishes, and a rerun of the same build RESUMES by loading
        completed shards instead of rebuilding them. A timeout/crash
        mid-build therefore always leaves per-shard evidence behind
        (the r4 2M CPU-mesh attempt timed out after 7,500s with no
        partial record — this is that lesson).

        Each shard's device build runs with that shard's mesh device as
        the default (so at 100M-scale the build arrays live on the chip
        that will serve the shard); ``host_graph=False`` builds
        serving-only shards (no per-element host objects — required at
        >~10M rows/shard, where Python materialization dominates).

        No step of this path allocates O(total corpus) on host. ``data``
        may be:

        - a host numpy array — shards slice it with strided VIEWS
          (``data[s::n_shards]``, zero copy; each shard's build streams
          only its own partition to its device);
        - a device-resident ``jax.Array`` — per-shard strided slices
          move device-to-device, never through host numpy;
        - a callable ``(shard, n_shards) -> rows`` — per-shard-STREAMED
          input: each shard's partition is produced (from disk, a
          generator, another process) right before that shard builds
          and can be freed after, so no process ever holds the full
          corpus (the 100M deployment path).

        ``ids`` may likewise be a callable ``(shard, n_shards) ->
        tids`` when ``data`` is callable; otherwise callable-input
        shards default to sequential TID blocks in shard order.
        """
        import jax

        devices = (
            list(mesh.devices.flat) if mesh is not None else jax.devices()
        )
        streamed = callable(data)
        if not streamed:
            n = int(data.shape[0]) if hasattr(data, "shape") else len(data)
            if ids is not None and not callable(ids):
                ids = np.asarray(ids)
        ckpt = None
        if checkpoint_dir is not None:
            from pathlib import Path

            ckpt = Path(checkpoint_dir)
            ckpt.mkdir(parents=True, exist_ok=True)
        shards = []
        offset = 0  # sequential TID blocks for streamed input
        for s in range(n_shards):
            dev = devices[s % len(devices)]
            if ckpt is not None and (
                ckpt / f"shard_{s:05d}" / "meta.json"
            ).exists():
                import time as _time

                t0 = _time.time()
                with jax.default_device(dev):
                    shards.append(HnswIndex.load(ckpt / f"shard_{s:05d}"))
                print(
                    f"[sharded.build] shard {s}/{n_shards}: resumed "
                    f"from checkpoint ({_time.time()-t0:.1f}s, "
                    f"{shards[-1].num_tuples} tuples)",
                    file=_sys.stderr,
                    flush=True,
                )
                if streamed and ids is None:
                    # sequential TID blocks can't be reconstructed for
                    # a skipped partition (duplicate folding caps TID
                    # lists, so num_tuples is not the partition size)
                    raise ValueError(
                        "checkpoint resume with streamed data needs "
                        "callable ids (sequential TID blocks cannot "
                        "span a skipped shard)"
                    )
                continue
            if streamed:
                part = data(s, n_shards)
                if callable(ids):
                    part_ids = np.asarray(ids(s, n_shards))
                elif ids is not None:
                    part_ids = ids[s :: n_shards]
                else:
                    cnt = int(part.shape[0]) if hasattr(part, "shape") else len(part)
                    part_ids = np.arange(offset, offset + cnt)
                    offset += cnt
            else:
                # strided slice: a zero-copy view on numpy, a
                # device-local slice on jax.Array
                part = data[s::n_shards]
                part_ids = (
                    ids[s::n_shards]
                    if ids is not None
                    else np.arange(s, n, n_shards)
                )
            if _is_device_data(part):
                part = jax.device_put(part, dev)  # no-op when already there
            import time as _time

            t0 = _time.time()
            with jax.default_device(dev):
                shards.append(
                    HnswIndex.build(
                        part,
                        metric=metric,
                        params=params,
                        ids=part_ids,
                        method=method,
                        seed=seed + s,
                        host_graph=host_graph,
                        dtype=dtype,
                    )
                )
            del part  # streamed partitions free before the next shard
            dt = _time.time() - t0
            print(
                f"[sharded.build] shard {s}/{n_shards}: built "
                f"{shards[-1].num_tuples} tuples in {dt:.1f}s "
                f"({shards[-1].num_tuples/max(dt,1e-9):.0f}/s)",
                file=_sys.stderr,
                flush=True,
            )
            if ckpt is not None:
                shards[-1].save(ckpt / f"shard_{s:05d}")
        if ckpt is not None:
            import json as _json
            import os as _os

            tmp = ckpt / "sharded.json.tmp"
            tmp.write_text(_json.dumps({"sharded": True, "n_shards": n_shards}))
            _os.replace(tmp, ckpt / "sharded.json")
        return cls(shards, mesh=mesh)

    def insert(self, value, tid: Optional[int] = None):
        """Route to the shard with the fewest tuples."""
        target = min(range(len(self.shards)), key=lambda s: self.shards[s].num_tuples)
        self._stacked = None
        return self.shards[target].insert(value, tid)

    def insert_bulk(self, values, tids=None) -> int:
        """Batched insert across shards: water-fill the batch so shard
        tuple counts equalize, then run each shard's batched device
        insert (HnswIndex.insert_bulk). Dense only. Returns elements
        added across shards (folded duplicate TIDs excluded)."""
        arr = np.asarray(values, dtype=np.float32)
        n = len(arr)
        if n == 0:
            return 0
        if tids is None:
            base = self.num_tuples
            tids = range(base, base + n)
        tids = np.fromiter((int(t) for t in tids), dtype=np.int64, count=n)
        sizes = np.array([s.num_tuples for s in self.shards], dtype=np.int64)
        S = len(sizes)
        # water level T with sum(max(0, T - size)) = n, then round-robin
        # the remainder of the flooring
        lo, hi = int(sizes.min()), int(sizes.max() + n)
        while lo < hi:
            mid = (lo + hi) // 2
            if np.maximum(0, mid - sizes).sum() < n:
                lo = mid + 1
            else:
                hi = mid
        alloc = np.minimum(np.maximum(0, lo - sizes), n)
        extra = int(alloc.sum() - n)
        for s in np.argsort(-sizes):
            if extra <= 0:
                break
            take = min(extra, int(alloc[s]))
            alloc[s] -= take
            extra -= take
        self._stacked = None
        added = 0
        pos = 0
        for s, k in enumerate(alloc):
            k = int(k)
            if k == 0:
                continue
            added += self.shards[s].insert_bulk(
                arr[pos : pos + k], tids=tids[pos : pos + k].tolist()
            )
            pos += k
        return added

    def delete(self, tids) -> int:
        self._stacked = None
        return sum(s.delete(tids) for s in self.shards)

    # -- persistence ---------------------------------------------------------

    def save(self, path) -> None:
        """Checkpoint: one sub-checkpoint per shard + a mesh-shape meta
        file (durability analog of the per-shard WAL story — each shard
        reuses the single-index checkpoint format, storage.py)."""
        import json
        from pathlib import Path

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        for i, s in enumerate(self.shards):
            s.save(path / f"shard_{i:05d}")
        meta = {"sharded": True, "n_shards": len(self.shards)}
        tmp = path / "sharded.json.tmp"
        tmp.write_text(json.dumps(meta))
        import os as _os

        _os.replace(tmp, path / "sharded.json")

    @classmethod
    def load(cls, path, mesh: Optional[Mesh] = None) -> "ShardedHnswIndex":
        """Reload a sharded checkpoint, placing each shard's device
        arrays on its mesh device (reload-equivalence: searches on the
        loaded index match the saved one, the 010_hnsw_wal model)."""
        import json
        from pathlib import Path

        path = Path(path)
        meta = json.loads((path / "sharded.json").read_text())
        n_shards = int(meta["n_shards"])
        devices = (
            list(mesh.devices.flat) if mesh is not None else jax.devices()
        )
        shards = []
        for i in range(n_shards):
            with jax.default_device(devices[i % len(devices)]):
                shards.append(HnswIndex.load(path / f"shard_{i:05d}"))
        return cls(shards, mesh=mesh)

    @property
    def num_tuples(self) -> int:
        return sum(s.num_tuples for s in self.shards)

    # -- iterative scan -------------------------------------------------------

    def scan(self, query, params: SearchParams | None = None):
        """Sharded resumable scan (BASELINE's 100M iterative config).

        Each shard contributes its own exactly-ordered result stream
        (DeviceScan when serving-only, HnswScan otherwise); a k-way
        heap merge yields one globally ordered stream, so
        relaxed_order and strict_order coincide — the merged stream is
        already in true distance order. max_scan_tuples caps the
        MERGED stream (the per-shard scans inherit the same params, so
        each shard also never scans past the global budget).
        """
        params = params or SearchParams()
        return ShardedScan(self, query, params)

    # -- stacked device arrays ----------------------------------------------

    def _stack(self):
        """Assemble per-shard DeviceGraphs into [S, ...] arrays sharded
        over the mesh's 'shard' axis — WITHOUT any host round-trip.

        Each shard's arrays are padded to the common capacity by a
        device-local jit program on that shard's own device, then the
        global sharded arrays are assembled from the per-device blocks
        with ``jax.make_array_from_single_device_arrays``. Nothing
        O(shard) (let alone O(corpus)) ever touches host numpy, so the
        100M shape (12.5M rows/chip x 8) stacks in per-chip HBM only.
        """
        if self._stacked is not None:
            return self._stacked
        graphs = [s.device_graph() for s in self.shards]
        if graphs[0].values is None:
            raise ValueError("sharded search supports dense metrics only")
        cap = max(g.cap for g in graphs)
        m = graphs[0].m
        n_up = max(g.upper_neighbors.shape[0] for g in graphs)
        # upper rows are layer-major flat [U, lmax*m]: a shorter-lmax
        # shard's layers keep their offsets in the wider row's prefix
        lmax = max(g.upper_neighbors.shape[1] // m for g in graphs)
        lm0 = max(g.neighbors0.shape[1] for g in graphs)
        devs = list(self.mesh.devices.flat)

        names = (
            "neighbors0",
            "upper",
            "upper_slot",
            "traversable",
            "values",
            "emit_tid",
        )
        blocks = {k: [] for k in names}
        for g, dev in zip(graphs, devs):
            with jax.default_device(dev):
                parts = _pad_shard_block(
                    g.neighbors0,
                    g.upper_neighbors,
                    g.upper_slot,
                    g.traversable,
                    g.values,
                    g.emit_tid,
                    cap1=cap + 1,
                    lm0=lm0,
                    n_up=n_up,
                    up_w=lmax * m,
                    dim=self.dim,
                )
            for k, p in zip(names, parts):
                blocks[k].append(jax.device_put(p, dev))
        S = len(graphs)
        shd = NamedSharding(self.mesh, P("shard"))
        stacked = {
            k: jax.make_array_from_single_device_arrays(
                (S,) + blocks[k][0].shape[1:], shd, blocks[k]
            )
            for k in names
        }
        # per-shard scalars: [S] arrays, trivially small
        stacked["entry"] = jax.device_put(
            np.array([g.entry for g in graphs], dtype=np.int32), shd
        )
        stacked["entry_level"] = jax.device_put(
            np.array([g.entry_level for g in graphs], dtype=np.int32), shd
        )
        self._stacked = stacked
        self._stacked["_lmax"] = lmax
        return self._stacked

    # -- search --------------------------------------------------------------

    def search(
        self,
        queries,
        k: int,
        params: SearchParams | None = None,
        engine: str = "auto",
        filter_mask=None,
    ):
        """SPMD search: per-shard local search, all-gather + merge.

        engine="exact" sweeps each shard's rows with one MXU matmul +
        top-k (recall 1.0); "beam" walks each shard's HNSW sub-graph;
        "auto" picks exact while every shard fits the single-chip exact
        cutover. Either way cross-shard traffic is ONE all_gather of
        per-shard top-k over ICI.

        ``filter_mask``: optional bool array indexed by GLOBAL heap tid
        (attribute filtering; it must cover the largest tid). The exact
        engine pre-filters inside each shard's sweep (recall 1.0 over
        the subset); beam post-filters before the merge.

        Returns (operator-distances [B, k] f64, heap ids [B, k]).
        """
        params = params or SearchParams()
        single = np.asarray(queries).ndim == 1
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if self.metric == "cosine":
            from ..ops.distances import normalize_rows

            q = np.asarray(normalize_rows(jnp.asarray(q)))

        st = self._stack()
        if engine == "auto":
            engine = (
                "exact"
                if st["values"].shape[1] - 1 <= device_mod.EXACT_ENGINE_MAX_ROWS
                else "beam"
            )
        ef = max(params.ef_search, k)
        lmax = st["_lmax"]
        filtered = filter_mask is not None
        fn = _sharded_search_fn(
            self.mesh, self.metric, ef, k, lmax, 4 * ef + 32, engine,
            filtered,
        )
        qr = jax.device_put(q, NamedSharding(self.mesh, P()))
        fm = (
            np.asarray(filter_mask, dtype=bool)
            if filtered
            else np.zeros(1, dtype=bool)
        )
        fmr = jax.device_put(fm, NamedSharding(self.mesh, P()))
        d, tids = fn(
            st["values"],
            st["neighbors0"],
            st["upper"],
            st["upper_slot"],
            st["traversable"],
            st["emit_tid"],
            st["entry"],
            st["entry_level"],
            qr,
            fmr,
        )
        d = np.asarray(d, dtype=np.float64)
        tids = np.asarray(tids, dtype=np.int64)
        if self.metric == "l2":
            d = np.where(np.isfinite(d), np.sqrt(np.maximum(d, 0.0)), d)
        if single:
            return d[0], tids[0]
        return d, tids


class ShardedScan:
    """K-way merge of per-shard resumable scans into one globally
    ordered stream (iterative-scan analog for the sharded index)."""

    def __init__(self, index: ShardedHnswIndex, query, params: SearchParams):
        import heapq

        self._heapq = heapq
        self.params = params
        self._emitted = 0
        # per-shard scans; "auto" picks DeviceScan for serving-only
        # shards (exactly ordered) and HnswScan otherwise
        self._scans = [s.scan(query, params) for s in index.shards]
        # issue every shard's first device segment BEFORE blocking on
        # any (each shard's graph lives on its own device, so the S
        # dispatches execute concurrently; init latency is the slowest
        # shard, not the sum — round-2 review ask #6)
        for sc in self._scans:
            prefetch = getattr(sc, "prefetch", None)
            if prefetch is not None:
                prefetch()
        self._heap: list = []
        for i, sc in enumerate(self._scans):
            item = sc.next()
            if item is not None:
                tid, d = item
                # every scan engine emits operator-domain distances,
                # so the heap merge is domain-consistent
                heapq.heappush(self._heap, (d, tid, i))

    def next(self):
        """Next (heap_tid, distance) in global distance order, or None."""
        if self._emitted >= self.params.max_scan_tuples or not self._heap:
            return None
        d, tid, i = self._heapq.heappop(self._heap)
        nxt = self._scans[i].next()
        if nxt is not None:
            self._heapq.heappush(self._heap, (nxt[1], nxt[0], i))
        self._emitted += 1
        return tid, d

    def take(self, k: int) -> list[tuple]:
        out = []
        while len(out) < k:
            item = self.next()
            if item is None:
                break
            out.append(item)
        return out

    @property
    def scan_stats(self):
        """Merged per-shard ScanStats (EXPLAIN ANALYZE analog)."""
        from ..utils.stats import ScanStats

        agg = ScanStats()
        for sc in self._scans:
            st = getattr(sc, "scan_stats", None)
            if st is not None:
                agg.merge(st)
        return agg


@functools.partial(
    jax.jit, static_argnames=("cap1", "lm0", "n_up", "up_w", "dim")
)
def _pad_shard_block(nb0, up, uslot, trav, vals, etid,
                     cap1: int, lm0: int, n_up: int, up_w: int, dim: int):
    """Pad one shard's graph arrays to the fleet-common shapes, on the
    shard's own device, returning [1, ...] blocks for
    make_array_from_single_device_arrays. One compiled program serves
    every shard that shares a capacity bucket."""

    def pad2(a, r, c, fill):
        out = jnp.full((r, c), fill, a.dtype)
        return jax.lax.dynamic_update_slice(out, a, (0, 0))

    def pad1(a, r, fill):
        out = jnp.full((r,), fill, a.dtype)
        return jax.lax.dynamic_update_slice(out, a, (0,))

    return (
        pad2(nb0, cap1, lm0, -1)[None],
        pad2(up, n_up, up_w, -1)[None],
        pad1(uslot, cap1, -1)[None],
        pad1(trav, cap1, False)[None],
        # values keep their serving dtype (f16/bf16 compact stores stay
        # compact across the mesh; the search fn casts per use)
        pad2(vals, cap1, dim, 0.0)[None],
        pad1(etid, cap1, -1)[None],
    )


@functools.lru_cache(maxsize=32)
def _cached_fn(mesh_key, metric, ef, k, lmax, max_steps, engine, filtered,
               mesh_ref):
    mesh = mesh_ref[0]

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("shard"),
            P("shard"),
            P("shard"),
            P("shard"),
            P("shard"),
            P("shard"),
            P("shard"),
            P("shard"),
            P(),
            P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def fn(values, nb0, upper, uslot, trav, etid, entry, entry_level, queries,
           fmask):
        # tid-keyed filter -> local element mask (clip-gather; tids
        # outside the mask's range are excluded)
        def tid_ok(t):
            inb = (t >= 0) & (t < fmask.shape[0])
            return inb & fmask[jnp.clip(t, 0, fmask.shape[0] - 1)]

        # local block: leading dim 1 (this shard)
        if engine == "exact":
            vals = values[0].astype(jnp.float32)
            dots = jax.lax.dot_general(
                queries,
                vals,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if metric == "l2":
                x2 = jnp.sum(vals * vals, axis=1)
                q2 = jnp.sum(queries * queries, axis=1, keepdims=True)
                scores = jnp.maximum(q2 + x2[None, :] - 2.0 * dots, 0.0)
            elif metric == "ip":
                scores = -dots
            elif metric == "cosine":
                scores = 1.0 - jnp.clip(dots, -1.0, 1.0)
            else:
                scores = jnp.sum(
                    jnp.abs(queries[:, None, :] - vals[None, :, :]), axis=-1
                )
            livemask = trav[0]
            if filtered:  # pre-filter inside the sweep (recall 1.0)
                livemask = livemask & tid_ok(etid[0])
            scores = jnp.where(livemask[None, :], scores, jnp.inf)
            neg_d, beam_ids = jax.lax.top_k(-scores, ef)
            beam_d = -neg_d
        else:
            beam_d, beam_ids = device_mod.beam_search_arrays(
                values[0],
                nb0[0],
                upper[0],
                uslot[0],
                trav[0],
                entry[0],
                entry_level[0],
                queries,
                metric=metric,
                ef=ef,
                lmax=lmax,
                max_steps=max_steps,
            )
        # element ids -> heap TIDs before leaving the shard
        tids = jnp.where(beam_ids >= 0, etid[0][jnp.maximum(beam_ids, 0)], -1)
        if filtered and engine != "exact":  # beam: post-filter emissions
            tids = jnp.where(tid_ok(tids), tids, -1)
        beam_d = jnp.where(tids >= 0, beam_d, jnp.inf)
        # one collective: every shard contributes its top-ef
        all_d = jax.lax.all_gather(beam_d, "shard")  # [S, B, ef]
        all_t = jax.lax.all_gather(tids, "shard")
        S, B, E = all_d.shape
        flat_d = jnp.transpose(all_d, (1, 0, 2)).reshape(B, S * E)
        flat_t = jnp.transpose(all_t, (1, 0, 2)).reshape(B, S * E)
        sd, stt = jax.lax.sort([flat_d, flat_t], num_keys=1)
        return sd[:, :k], stt[:, :k]

    return fn


def _sharded_search_fn(mesh, metric, ef, k, lmax, max_steps, engine="beam",
                       filtered=False):
    # lru_cache keyed on mesh identity + static config
    return _cached_fn(
        (id(mesh), tuple(mesh.axis_names), mesh.devices.shape),
        metric,
        ef,
        k,
        lmax,
        max_steps,
        engine,
        filtered,
        (mesh,),
    )
