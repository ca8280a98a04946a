"""Micro-probe 3: does TPU XLA scatter speed up with unique_indices /
indices_are_sorted / OOB-drop pads, and how does cost scale with item
count (the be0 shape scatters 32768 rows into [10.5M, 48])?

Usage: python probe_upc3.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(jax.devices(), file=sys.stderr, flush=True)

    key = jax.random.PRNGKey(0)

    def timeit(label, jf, table, *args):
        table = jf(table, *args)
        np.asarray(table[:1, :1])
        t0 = time.time()
        for _ in range(16):
            table = jf(table, *args)
        np.asarray(table[:1, :1])
        dt = (time.time() - t0) / 16
        print(f"[{label}] {dt*1000:7.2f}ms", file=sys.stderr, flush=True)

    for N, W, R in ((1 << 20, 144, 2048), (10 << 20, 48, 32768)):
        vals = jax.random.randint(key, (R, W), 0, 1 << 20, jnp.int32)
        # sorted unique in-bounds rows with ~25% OOB/dump pads mixed in
        base = np.sort(
            np.random.default_rng(1).choice(N, size=R, replace=False)
        ).astype(np.int32)
        pad_mask = np.random.default_rng(2).random(R) < 0.25
        idx_dump = jnp.asarray(np.where(pad_mask, N, base))  # dump row N
        idx_oob = jnp.asarray(np.where(pad_mask, N + 5, base))  # OOB

        def s_plain(table, idx, vals):
            return table.at[idx].set(vals)

        def s_uniq(table, idx, vals):
            return table.at[idx].set(
                vals, unique_indices=True, mode="drop"
            )

        def s_uniq_sorted(table, idx, vals):
            return table.at[idx].set(
                vals, unique_indices=True, indices_are_sorted=True,
                mode="drop",
            )

        print(f"--- table [{N+1}, {W}] R={R}", file=sys.stderr, flush=True)
        for label, fn, idx in (
            ("plain dump-row        ", s_plain, idx_dump),
            ("unique drop dump-row  ", s_uniq, idx_dump),
            ("unique drop OOB       ", s_uniq, idx_oob),
            ("unique sorted drop OOB", s_uniq_sorted, idx_oob),
        ):
            jf = jax.jit(fn, donate_argnums=(0,))
            table = jnp.zeros((N + 1, W), jnp.int32)
            timeit(label, jf, table, idx, vals)


if __name__ == "__main__":
    main()
