"""Micro-probe 2: upc scatter cost with DONATED operands (no per-call
copy), separating buffer-copy cost from the scatter lowering itself.

Usage: python probe_upc2.py [U=1048576]
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
    W = lmax * (m + mp2)
    dump = U

    key = jax.random.PRNGKey(0)
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

    def scatter_cols(table, slot, lidx, vals):
        return table.at[slot[:, None], ucols_of(lidx)].set(vals)

    def scatter_fullrow(table, slot, lidx, vals):
        rows = table[slot]
        col = jnp.arange(W)[None, :]
        is_id = col < lmax * m
        lay = jnp.where(is_id, col // m, (col - lmax * m) // mp2)
        j = jnp.where(is_id, col % m, m + (col - lmax * m) % mp2)
        newv = jnp.take_along_axis(
            vals, jnp.broadcast_to(j, (RU, W)), axis=1
        )
        rows = jnp.where(lay == lidx[:, None], newv, rows)
        return table.at[slot].set(rows)

    def rowset_only(table, slot, lidx, vals):
        # pure row scatter, no gather dependency on the table
        newv = jnp.tile(vals, (1, W // (m + mp2)))
        return table.at[slot].set(newv)

    for name, fn in (
        ("cols   ", scatter_cols),
        ("fullrow", scatter_fullrow),
        ("rowset ", rowset_only),
    ):
        jf = jax.jit(fn, donate_argnums=(0,))
        table = jax.random.randint(key, (U + 1, W), 0, 1 << 20, jnp.int32)
        table = jf(table, slot, lidx, vals)
        np.asarray(table[:1, :1])
        t0 = time.time()
        for _ in range(16):
            table = jf(table, slot, lidx, vals)
        np.asarray(table[:1, :1])
        dt = (time.time() - t0) / 16
        print(
            f"[scatter {name} donated] {dt*1000:7.2f}ms",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
