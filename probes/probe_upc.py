"""Micro-probe: upper-adjacency gather/scatter lowering strategies.

The beu ablation showed `_backedge_upper_compact` costs ~41ms/batch at
upper_pad=1M vs ~0 at small pads — its computed-column 2D gather +
scatter on the flat [U+1, LMAX*(m+mp2)] table hits a slow lowering once
the table is HBM-resident. This times each half and the candidate
replacements on synthetic data of the real shapes.

Usage: python probe_upc.py [U=1048576]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    U = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(jax.devices(), file=sys.stderr, flush=True)

    m, mp2, lmax = 16, 8, 6
    RU = 2048
    W = lmax * (m + mp2)  # 144
    dump = U

    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (U + 1, W), 0, 1 << 20, jnp.int32)
    slot = jax.random.randint(key, (RU,), 0, U, jnp.int32)
    lidx = jax.random.randint(key, (RU,), 0, lmax, jnp.int32)
    vals = jax.random.randint(key, (RU, m + mp2), 0, 1 << 20, jnp.int32)

    def ucols_of(lidx):
        return jnp.concatenate(
            [
                lidx[:, None] * m + jnp.arange(m)[None, :],
                lmax * m
                + lidx[:, None] * mp2
                + jnp.arange(mp2)[None, :],
            ],
            axis=1,
        )

    @jax.jit
    def gather_cols(table, slot, lidx):
        return table[slot[:, None], ucols_of(lidx)]

    @jax.jit
    def scatter_cols(table, slot, lidx, vals):
        return table.at[slot[:, None], ucols_of(lidx)].set(vals)

    @jax.jit
    def gather_slices(table, slot, lidx):
        rows = table[slot]  # [RU, W] full-row gather
        outs = []
        for blk, width, base in ((0, m, 0), (1, mp2, lmax * m)):
            picked = jnp.zeros((RU, width), jnp.int32)
            for l in range(lmax):
                seg = rows[:, base + l * width : base + (l + 1) * width]
                picked = jnp.where((lidx == l)[:, None], seg, picked)
            outs.append(picked)
        return jnp.concatenate(outs, axis=1)

    @jax.jit
    def scatter_slices(table, slot, lidx, vals):
        for l in range(lmax):
            rs = jnp.where(lidx == l, slot, dump)
            table = table.at[rs, l * m : (l + 1) * m].set(vals[:, :m])
            cb = lmax * m + l * mp2
            table = table.at[rs, cb : cb + mp2].set(vals[:, m:])
        return table

    @jax.jit
    def scatter_fullrow(table, slot, lidx, vals):
        rows = table[slot]  # [RU, W]
        col = jnp.arange(W)[None, :]
        lay_id = col // m
        j_id = col % m
        lay_d = (col - lmax * m) // mp2
        j_d = (col - lmax * m) % mp2
        is_id = col < lmax * m
        lay = jnp.where(is_id, lay_id, lay_d)
        j = jnp.where(is_id, j_id, m + j_d)
        newv = jnp.take_along_axis(
            vals, jnp.broadcast_to(j, (RU, W)), axis=1
        )
        rows = jnp.where(lay == lidx[:, None], newv, rows)
        return table.at[slot].set(rows)

    def timeit(label, fn, *args):
        out = fn(*args)
        np.asarray(out[:1, :1] if out.ndim == 2 else out[:1])
        t0 = time.time()
        for _ in range(16):
            out = fn(*args)
        np.asarray(out[:1, :1] if out.ndim == 2 else out[:1])
        dt = (time.time() - t0) / 16
        print(f"[{label}] {dt*1000:7.2f}ms", file=sys.stderr, flush=True)
        return out

    g0 = timeit("gather cols (current)", gather_cols, table, slot, lidx)
    timeit("gather fullrow+mask   ", gather_slices, table, slot, lidx)
    timeit("scatter cols (current)", scatter_cols, table, slot, lidx, vals)
    timeit("scatter per-layer slc ", scatter_slices, table, slot, lidx, vals)
    timeit("scatter fullrow       ", scatter_fullrow, table, slot, lidx, vals)

    # sanity: replacements agree with the current lowering
    g1 = gather_slices(table, slot, lidx)
    assert np.array_equal(np.asarray(g0), np.asarray(g1))
    s0 = scatter_cols(table, slot, lidx, vals)
    s1 = scatter_slices(table, slot, lidx, vals)
    # drop rows hit more than once (scatter order may differ) and the
    # dump row (per-layer variant parks inactive rows there)
    slot_np = np.asarray(slot)
    uniq, counts = np.unique(slot_np, return_counts=True)
    once = uniq[counts == 1]
    a0, a1 = np.asarray(s0)[once], np.asarray(s1)[once]
    assert np.array_equal(a0, a1)
    s2 = scatter_fullrow(table, slot, lidx, vals)
    a2 = np.asarray(s2)[once]
    assert np.array_equal(a0, a2)
    print("[probe] agreement OK", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
