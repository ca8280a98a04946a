"""Microbenchmark: bf16 vs int8 MXU sweep on the tunnel TPU.

Times the approx engine's core shapes — [B=1024, 128] queries against
a [1M, 128] corpus — for (a) bf16 matmul + approx_min_k (the current
approx engine recipe), (b) int8 matmul (int32 accumulate) +
approx_min_k, (c) matmul-only variants to isolate the selection cost.
Decides whether a ScaNN-style int8-score + exact-rescore engine is
worth building.

Run: python probe_int8.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np

os.environ.setdefault("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["PGV_JAX_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, D, B, K = 1_000_000, 128, 1024, 10

rng = np.random.default_rng(0)
v = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
v_bf16 = v.astype(jnp.bfloat16)
sv = jnp.max(jnp.abs(v)) / 127.0
v_i8 = jnp.clip(jnp.round(v / sv), -127, 127).astype(jnp.int8)
x2 = jnp.sum(v * v, axis=1)


def sync(x):
    return int(np.asarray(jnp.sum(x).astype(jnp.int32)))


@jax.jit
def bf16_full(q, v16, x2):
    qb = q.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        qb, v16, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = x2[None, :] - 2.0 * dots
    return jax.lax.approx_min_k(s, K, recall_target=0.98)[1]


@jax.jit
def i8_full(q, v8, x2, sv):
    sq = jnp.max(jnp.abs(q)) / 127.0
    q8 = jnp.clip(jnp.round(q / sq), -127, 127).astype(jnp.int8)
    dots = jax.lax.dot_general(
        q8, v8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    s = x2[None, :] - (2.0 * sv * sq) * dots.astype(jnp.float32)
    return jax.lax.approx_min_k(s, K, recall_target=0.98)[1]


@jax.jit
def bf16_mm(q, v16):
    qb = q.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        qb, v16, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return jnp.sum(dots, axis=1)  # cheap reduce, no top-k


@jax.jit
def i8_mm(q, v8):
    sq = jnp.max(jnp.abs(q)) / 127.0
    q8 = jnp.clip(jnp.round(q / sq), -127, 127).astype(jnp.int8)
    dots = jax.lax.dot_general(
        q8, v8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return jnp.sum(dots, axis=1)


def bench(name, fn, *args, iters=8):
    sync(fn(*args))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    dt = (time.time() - t0) / iters
    qps = B / dt
    print(f"{name}: {dt*1e3:.2f} ms/batch = {qps:,.0f} qps "
          f"(x{N:,} rows)", flush=True)
    return dt


t_bf = bench("bf16 mm + approx_min_k", bf16_full, q, v_bf16, x2)
t_i8 = bench("int8 mm + approx_min_k", i8_full, q, v_i8, x2, sv)
t_bfm = bench("bf16 mm only          ", bf16_mm, q, v_bf16)
t_i8m = bench("int8 mm only          ", i8_mm, q, v_i8)
print(f"speedup full: {t_bf/t_i8:.2f}x   mm-only: {t_bfm/t_i8m:.2f}x")
print(f"selection overhead: bf16 {1e3*(t_bf-t_bfm):.2f} ms, "
      f"int8 {1e3*(t_i8-t_i8m):.2f} ms")

# recall of the int8 ids vs exact f32 top-k (one batch)
s_exact = x2[None, :] - 2.0 * (q @ v.T)
gt = jax.lax.top_k(-s_exact, K)[1]
ids8 = i8_full(q, v_i8, x2, sv)
gtn, i8n = np.asarray(gt), np.asarray(ids8)
rec = np.mean([len(set(gtn[b]) & set(i8n[b])) / K for b in range(B)])
print(f"int8 top-{K} recall vs f32 exact (no rescore): {rec:.4f}")
