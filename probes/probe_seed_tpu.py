"""Attribute the 10M build's flat +41 ms/batch premium (DESIGN 6g):
standalone timings of the two upper-width-scaled suspects at the 1M
upper shape vs the 128k one, plus full-cap scatter costs.

  1. seed sweep: bf16 [1024, D] x [D, W] + approx_min_k(K) + rescore
     at W = 131072 (1M build shape) vs 1048576 (10M build shape),
     CQ chunking 256 vs 512 vs 1024.
  2. row scatter: donated at[idx].set of 1024 rows into [cap, 48] i32
     and [cap, 128] bf16 at cap = 1M vs 10M (is scatter in-place or a
     full-array copy at the 10M shape?).
  3. 3-operand sort at the back-edge merge width (is sort width-u
     scaled? it shouldn't be).

One process. Run (quiet host): timeout 1800 python probes/probe_seed_tpu.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print("[seed]", *a, file=sys.stderr, flush=True)


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def timeit(fn, *args, reps=20):
    sync(fn(*args))  # warm/compile
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    return (time.time() - t0) / reps


def main():
    log("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    D, B, KK = 128, 1024, 80

    # --- 1. seed sweep at both upper widths -------------------------
    for W in (131072, 1048576):
        tbl = jax.random.normal(key, (W, D), jnp.bfloat16)
        x2 = jnp.sum(tbl.astype(jnp.float32) ** 2, axis=1)
        tblf = tbl.astype(jnp.float32)
        q = jax.random.normal(key, (B, D), jnp.float32)

        @functools.partial(jax.jit, static_argnames=("cq",))
        def seed(q, tbl, x2, tblf, cq):
            def chunk(qc):
                dots = jax.lax.dot_general(
                    qc.astype(jnp.bfloat16), tbl,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sc = x2[None, :] - 2.0 * dots
                return jax.lax.approx_min_k(sc, KK, recall_target=0.98)

            if cq < B:
                d, s = jax.lax.map(chunk, q.reshape(-1, cq, D))
                d, s = d.reshape(B, KK), s.reshape(B, KK)
            else:
                d, s = chunk(q)
            rows = tblf[s]
            diff = rows - q[:, None, :]
            de = jnp.sum(diff * diff, axis=-1)
            return jax.lax.sort([de, s], num_keys=1)[0]

        for cq in (256, 512, 1024):
            dt = timeit(seed, q, tbl, x2, tblf, cq=cq)
            log(f"seed W={W} CQ={cq}: {dt*1e3:.2f} ms/batch")
        del tbl, x2, tblf

    # --- 2. donated row scatter at both caps ------------------------
    for cap in (1 << 20, 10485760):
        nb = jnp.zeros((cap, 48), jnp.int32)
        vec = jnp.zeros((cap, D), jnp.bfloat16)
        idx = jax.random.randint(key, (B,), 0, cap, jnp.int32)
        rows_i = jnp.ones((B, 48), jnp.int32)
        rows_v = jnp.ones((B, D), jnp.bfloat16)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scat_i(nb, idx, rows):
            return nb.at[idx].set(rows)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scat_v(vec, idx, rows):
            return vec.at[idx].set(rows)

        # keep the chain donated: nb is replaced each call
        sync(scat_i(nb, idx, rows_i)[:1, :1])
        nb = jnp.zeros((cap, 48), jnp.int32)
        t0 = time.time()
        for _ in range(20):
            nb = scat_i(nb, idx, rows_i)
        sync(nb[:1, :1])
        log(f"scatter [cap={cap},48]i32: {(time.time()-t0)/20*1e3:.2f} ms")
        sync(scat_v(vec, idx, rows_v)[:1, :1])
        vec = jnp.zeros((cap, D), jnp.bfloat16)
        t0 = time.time()
        for _ in range(20):
            vec = scat_v(vec, idx, rows_v)
        sync(vec[:1, :1])
        log(f"scatter [cap={cap},{D}]bf16: {(time.time()-t0)/20*1e3:.2f} ms")
        del nb, vec

    # --- 3. wide 3-operand sort (back-edge merge width) -------------
    for R in (2048, 4096):
        a = jax.random.randint(key, (R * 33,), 0, 1 << 30, jnp.int32)
        b = jax.random.normal(key, (R * 33,), jnp.float32)
        c = jax.random.randint(key, (R * 33,), 0, 1 << 30, jnp.int32)

        @jax.jit
        def srt(a, b, c):
            return jax.lax.sort([a, b, c], num_keys=2)[1]

        dt = timeit(srt, a, b, c)
        log(f"3-op sort len={R*33}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
