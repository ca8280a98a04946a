"""Sub-phase timing probe: attribute per-batch cost at emulated big-N
shapes (PGV_BUILD_CAP_FLOOR / PGV_BUILD_UPPER_FLOOR) to individual
blocks — commit pieces (fwd / be0 / beu split jits) and the search-side
seed sweep + upper-selection machinery — so optimization effort lands
on the real cost. Complements probe_phase.py (which only splits
search vs commit).

Usage: python probe_phase2.py [N]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import os
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    dim = 128

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(jax.devices(), file=sys.stderr, flush=True)

    from bench import make_dataset_device
    from pgvector_rx_tpu.graph import device_build as db
    from pgvector_rx_tpu.graph.device_build import (
        DeviceBuilder,
        batch_schedule,
    )

    data, _ = make_dataset_device(n, dim, 16)
    levels_rng = np.random.default_rng(1)
    m = 16
    ml = 1.0 / np.log(m)
    levels = np.minimum(
        np.floor(-np.log(levels_rng.random(n)) * ml).astype(np.int32), 30
    )
    b = DeviceBuilder("l2", data, levels, m, 64)
    b.seed_first(0)

    def sync(x=None):
        if x is None:
            int(np.asarray(b.arrays.entry))
        else:
            np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

    # build the graph to the descent regime with the normal fused path
    sched = batch_schedule(n, b.batch_max)
    cut = [i for i, (s, z) in enumerate(sched) if s + 1 > b.descent_min]
    assert cut, "corpus too small to reach descent regime"
    b.run_all(sched[: cut[0]])
    sync()
    start0, size0 = sched[cut[0]]
    print(f"[probe2] graph built to {start0}", file=sys.stderr, flush=True)

    B = b.batch_max
    REPS = 8

    def timeit(label, fn, *args, **kw):
        # compile
        out = fn(*args, **kw)
        sync(out)
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args, **kw)
        sync(out)
        dt = (time.time() - t0) / REPS
        print(f"[{label}] {dt*1000:.1f}ms", file=sys.stderr, flush=True)
        return out

    start = jnp.int32(start0)
    size = jnp.int32(size0)

    # --- search side -------------------------------------------------
    sel_d, sel_ids, assign = b._search_jit(
        b.data, b.arrays, start, size, width=0
    )
    sync((sel_d, sel_ids))

    dmy = b.data
    cap = b.cap

    @jax.jit
    def seed_block(data, arrays, start, size):
        """Replica of the descent arm's merged upper scan."""
        iota_b = jnp.arange(B, dtype=jnp.int32)
        batch_mask = iota_b < size
        new_ids = jnp.where(batch_mask, start + iota_b, cap)
        q_rows = data.vectors[jnp.clip(new_ids, 0, cap)]
        u_ids = data.upper_ids
        width_u = data.upper_vectors.shape[0]
        u_colmask = (u_ids < start) & arrays.alive[
            jnp.clip(u_ids, 0, cap)
        ]
        u_pen = jnp.where(u_colmask, 0.0, jnp.inf)
        a_col = data.upper_x2 + u_pen
        KK = min(64, width_u)

        def seed_chunk(q_chunk):
            sc = b._upper_order_scores(data, q_chunk, a_col)
            if width_u >= db._APPROX_TOPK_MIN:
                return jax.lax.approx_min_k(sc, KK, recall_target=0.98)
            neg, slots = jax.lax.top_k(-sc, KK)
            return -neg, slots

        CQ = 256 if (B % 256 == 0 and width_u > (1 << 17)) else B
        if CQ < B:
            sd_c, sl_c = jax.lax.map(
                seed_chunk, q_rows.reshape(-1, CQ, dim)
            )
            ord_all = sd_c.reshape(B, KK)
            slots_all = sl_c.reshape(B, KK)
        else:
            ord_all, slots_all = seed_chunk(q_rows)
        sel_rows = data.upper_vectors[slots_all]
        d_exact = b._dist_point_rows(q_rows, sel_rows)
        d_exact = jnp.where(jnp.isfinite(ord_all), d_exact, jnp.inf)
        return jax.lax.sort([d_exact, slots_all], num_keys=1)

    @jax.jit
    def beam_block(data, arrays, start, size, seed_d, seed_slots):
        iota_b = jnp.arange(B, dtype=jnp.int32)
        batch_mask = iota_b < size
        new_ids = jnp.where(batch_mask, start + iota_b, cap)
        q_rows = data.vectors[jnp.clip(new_ids, 0, cap)]
        S = min(16, data.upper_vectors.shape[0] - 1, max(b.efc - 1, 1))
        seed_ids = jnp.where(
            jnp.isfinite(seed_d[:, :S]),
            data.upper_ids[seed_slots[:, :S]],
            -1,
        )
        sd = jnp.where(
            jnp.isfinite(seed_d[:, :S]), seed_d[:, :S], jnp.inf
        )
        import math as _math

        steps = max(16, int(_math.log2(cap + 1)) - 4)
        return b._beam_ground_candidates(
            data, arrays.nb0c, arrays.alive, arrays.entry, q_rows,
            sd, seed_ids, steps, 4, True,
        )

    @jax.jit
    def sel0_block(data, cand_d, cand_idx):
        return b._candidates_to_selection(data, cand_d, cand_idx)

    d_seed, s_seed = timeit(
        "seed-sweep", seed_block, dmy, b.arrays, start, size
    )
    cand = timeit(
        "ground-beam", beam_block, dmy, b.arrays, start, size,
        d_seed, s_seed,
    )
    timeit("sel0(alg4)", sel0_block, dmy, *cand)
    timeit(
        "search(all)", b._search_jit, dmy, b.arrays, start, size, width=0
    )

    # --- commit side (split jits; donation consumes arrays each call,
    # so re-feed the returned arrays) ---------------------------------
    arrays = b.arrays

    def run_fwd():
        return b._fwd_jit(dmy, arrays, start, size, sel_d, sel_ids, assign)

    a2 = run_fwd()
    sync(a2)
    t0 = time.time()
    for _ in range(REPS):
        a2 = b._fwd_jit(dmy, a2, start, size, sel_d, sel_ids, assign)
    sync(a2)
    print(f"[fwd] {(time.time()-t0)/REPS*1000:.1f}ms", file=sys.stderr,
          flush=True)

    nb0c = a2.nb0c
    t0 = time.time()
    for _ in range(REPS):
        nb0c = b._be0_jit(dmy, nb0c, a2.alive, start, size, sel_d, sel_ids)
    np.asarray(nb0c[:1, :1])
    print(f"[be0] {(time.time()-t0)/REPS*1000:.1f}ms", file=sys.stderr,
          flush=True)

    upc = a2.upc
    t0 = time.time()
    for _ in range(REPS):
        upc = b._beu_jit(dmy, upc, a2.alive, start, size, sel_d, sel_ids)
    np.asarray(upc[:1, :1])
    print(f"[beu] {(time.time()-t0)/REPS*1000:.1f}ms", file=sys.stderr,
          flush=True)

    a3 = a2._replace(nb0c=nb0c, upc=upc)
    t0 = time.time()
    for _ in range(REPS):
        a3 = b._commit_jit(dmy, a3, start, size, sel_d, sel_ids, assign)
    sync(a3)
    print(f"[commit(all)] {(time.time()-t0)/REPS*1000:.1f}ms",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
