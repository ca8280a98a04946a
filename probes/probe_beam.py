"""Build-beam variant matrix: time + candidate quality per config.

The descent-regime ground beam is the dominant search-side block at the
10M shape (60.8ms of 85.4ms, probe_phase2 2026-08-19). Its knobs
(steps, expand, dedup) are explicit arguments, so ONE process can A/B
every variant against the same as-built graph — immune to both the
trace-time-env trap and cross-run tunnel variance (DESIGN.md 6e).

Quality metric: candidate recall — fraction of the exact top-16
committed neighbors present in the beam's efc-wide candidate output
(the input Alg-4 selection sees). Build-quality effects are downstream
of this, so equal candidate recall at lower cost is a safe swap.

Usage: PGV_BUILD_CAP_FLOOR=10485760 python probe_beam.py [N=500000]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import math
import os
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
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

    def sync():
        int(np.asarray(b.arrays.entry))

    sched = batch_schedule(n, b.batch_max)
    cut = [i for i, (s, z) in enumerate(sched) if s + 1 > b.descent_min]
    assert cut, "corpus too small to reach descent regime"
    # build well into the descent regime so the graph routes realistically
    upto = min(cut[0] + 256, len(sched) - 1)
    b.run_all(sched[:upto])
    sync()
    start0, size0 = sched[upto]
    print(f"[probe] graph built to {start0}", file=sys.stderr, flush=True)

    B = b.batch_max
    start = jnp.int32(start0)
    size = jnp.int32(size0)
    cap = b.cap

    # ---- shared seeds (the merged upper scan, replicated) ----------
    import functools

    @jax.jit
    def seeds_and_q(data, arrays, start, size):
        iota_b = jnp.arange(B, dtype=jnp.int32)
        batch_mask = iota_b < size
        new_ids = jnp.where(batch_mask, start + iota_b, cap)
        q_rows = data.vectors[jnp.clip(new_ids, 0, cap)]
        u_ids = data.upper_ids
        width_u = data.upper_vectors.shape[0]
        u_colmask = (u_ids < start) & arrays.alive[jnp.clip(u_ids, 0, cap)]
        u_pen = jnp.where(u_colmask, 0.0, jnp.inf)
        a_col = data.upper_x2 + u_pen
        S = min(16, width_u - 1, max(b.efc - 1, 1))
        KK = min(64, width_u)

        sc = b._upper_order_scores(data, q_rows, a_col)
        if width_u >= db._APPROX_TOPK_MIN:
            od, slots = jax.lax.approx_min_k(sc, KK, recall_target=0.98)
        else:
            neg, slots = jax.lax.top_k(-sc, KK)
            od = -neg
        sel_rows = data.upper_vectors[slots]
        d_exact = b._dist_point_rows(q_rows, sel_rows)
        d_exact = jnp.where(jnp.isfinite(od), d_exact, jnp.inf)
        d_all, slots = jax.lax.sort([d_exact, slots], num_keys=1)
        seed_ids = jnp.where(
            jnp.isfinite(d_all[:, :S]), u_ids[slots[:, :S]], -1
        )
        seed_d = jnp.where(jnp.isfinite(d_all[:, :S]), d_all[:, :S], jnp.inf)
        return q_rows, seed_d, seed_ids

    q_rows, seed_d, seed_ids = seeds_and_q(b.data, b.arrays, start, size)
    np.asarray(seed_d[:1, :1])

    # ---- exact ground truth over the committed prefix (MXU sweep) --
    GK = 16

    @jax.jit
    def exact_gt(data, arrays, q_rows, start):
        ids_all = jnp.arange(cap + 1, dtype=jnp.int32)
        colmask = (ids_all < start) & arrays.alive
        pen = jnp.where(colmask, 0.0, jnp.inf)
        a_col = data.x2 + pen

        def chunk(q_c):
            dots = jax.lax.dot_general(
                q_c.astype(jnp.bfloat16),
                data.vectors_bf16,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sc = a_col[None, :] - 2.0 * dots
            return jax.lax.approx_min_k(sc, 4 * GK, recall_target=0.99)

        d_c, i_c = jax.lax.map(chunk, q_rows.reshape(-1, 128, dim))
        ids = i_c.reshape(B, 4 * GK)
        rows = data.vectors[jnp.clip(ids, 0, cap)]
        dlt = rows - q_rows[:, None, :]
        d = jnp.where(
            jnp.isfinite(d_c.reshape(B, 4 * GK)),
            jnp.sum(dlt * dlt, axis=-1),
            jnp.inf,
        )
        d, ids = jax.lax.sort([d, ids], num_keys=1)
        return ids[:, :GK], d[:, :GK]

    gt_ids, gt_d = exact_gt(b.data, b.arrays, q_rows, start)
    gt_ids = np.asarray(gt_ids)
    gt_d_np = np.asarray(gt_d)
    print("[probe] GT ready", file=sys.stderr, flush=True)

    REPS = 8
    variants = []
    base_steps = max(16, int(math.log2(cap + 1)) - 4)
    for steps in sorted({base_steps, 16, 12}):
        variants.append((steps, 4, True, "sort"))
        variants.append((steps, 4, True, "rank"))
    variants += [
        (base_steps, 4, False, "sort"),
        (base_steps, 8, True, "rank"),
        (12, 8, True, "rank"),
        (8, 8, True, "rank"),
    ]

    fns = {}
    for steps, expand, dedup, merge in variants:
        fns[(steps, expand, dedup, merge)] = jax.jit(
            functools.partial(
                b._beam_ground_candidates,
                steps=steps, expand=expand, dedup=dedup, merge=merge,
            )
        )

    for (steps, expand, dedup, merge), fn in fns.items():
        out = fn(
            b.data, b.arrays.nb0c, b.arrays.alive, b.arrays.entry,
            q_rows, seed_d, seed_ids,
        )
        np.asarray(out[0][:1, :1])  # compile+run
        t0 = time.time()
        for _ in range(REPS):
            out = fn(
                b.data, b.arrays.nb0c, b.arrays.alive, b.arrays.entry,
                q_rows, seed_d, seed_ids,
            )
        np.asarray(out[0][:1, :1])
        dt = (time.time() - t0) / REPS
        cd, cids = np.asarray(out[0]), np.asarray(out[1])
        hits = 0
        total = 0
        for r in range(B):
            valid = gt_ids[r][np.isfinite(gt_d_np[r])]
            if len(valid) == 0:
                continue
            hits += len(set(cids[r].tolist()) & set(valid.tolist()))
            total += len(valid)
        print(
            f"[beam steps={steps:2d} expand={expand} dedup={int(dedup)} "
            f"merge={merge}] {dt*1000:6.1f}ms "
            f"cand-recall@{GK}={hits/max(total,1):.4f}",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
