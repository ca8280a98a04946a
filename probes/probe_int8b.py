"""Microbenchmark 2: the approx sweep is epilogue-bound, not MXU-bound.

probe_int8.py showed bf16 [1024,128]x[128,1M] + approx_min_k runs at
~13% MXU peak with int8 giving only 1.06x — the per-element selection
epilogue (elementwise score assembly + PartialReduce) is the bound.
This probe measures epilogue variants:

  v0: current engine's score expression (q2 + x2 - 2dots, maximum 0,
      where(live)) + approx_min_k(aggregate_to_topk=True)
  v1: minimal scores (a - 2dots, a = x2 + livepenalty precomputed)
  v2: v1 with aggregate_to_topk=False + device gather-rescore top-k
      (exact f32 distances on the L candidates)
  v3: v2 at recall_target 0.9
  v4: v2 with B=4096 chunks
  v5: v2 scores in bf16 (halve epilogue element bytes)

Run: python probe_int8b.py
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

N, D, K = 1_000_000, 128, 10

rng = np.random.default_rng(0)
v = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
q_all = jnp.asarray(rng.standard_normal((4096, D)).astype(np.float32))
v_bf16 = v.astype(jnp.bfloat16)
x2 = jnp.sum(v * v, axis=1)
live = jnp.ones((N,), jnp.bool_)
a = x2 + jnp.where(live, 0.0, jnp.inf)  # precomputed penalty row


def sync(x):
    return int(np.asarray(jnp.sum(x).astype(jnp.int32)))


def dots_of(q, vv):
    return jax.lax.dot_general(
        q.astype(vv.dtype), vv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def v0(q, v16, x2, live):
    dots = dots_of(q, v16)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    s = jnp.maximum(q2 + x2[None, :] - 2.0 * dots, 0.0)
    s = jnp.where(live[None, :], s, jnp.inf)
    return jax.lax.approx_min_k(s, K, recall_target=0.98)[1]


@jax.jit
def v1(q, v16, a):
    s = a[None, :] - 2.0 * dots_of(q, v16)
    return jax.lax.approx_min_k(s, K, recall_target=0.98)[1]


def rescore(q, ids):
    rows = v[jnp.clip(ids, 0, N - 1)]  # [B, L, D] f32
    diff = rows - q[:, None, :]
    s = jnp.sum(diff * diff, axis=-1)
    s = jnp.where(ids < 0, jnp.inf, s)
    d, j = jax.lax.top_k(-s, K)
    return -d, jnp.take_along_axis(ids, j, axis=1)


@jax.jit
def v2(q, v16, a):
    s = a[None, :] - 2.0 * dots_of(q, v16)
    _, ids = jax.lax.approx_min_k(
        s, K, recall_target=0.98, aggregate_to_topk=False
    )
    return rescore(q, ids)[1]


@jax.jit
def v3(q, v16, a):
    s = a[None, :] - 2.0 * dots_of(q, v16)
    _, ids = jax.lax.approx_min_k(
        s, K, recall_target=0.90, aggregate_to_topk=False
    )
    return rescore(q, ids)[1]


@jax.jit
def v5(q, v16, a):
    s = (a[None, :] - 2.0 * dots_of(q, v16)).astype(jnp.bfloat16)
    _, ids = jax.lax.approx_min_k(
        s, K, recall_target=0.98, aggregate_to_topk=False
    )
    return rescore(q, ids)[1]


def bench(name, fn, B, *args, iters=8):
    q = q_all[:B]
    sync(fn(q, *args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(q, *args)
    sync(r)
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms/{B}-batch = {B/dt:,.0f} qps", flush=True)
    return r


s_exact = x2[None, :] - 2.0 * (q_all[:1024] @ v.T)
gt = np.asarray(jax.lax.top_k(-s_exact, K)[1])


def recall(ids):
    i = np.asarray(ids)[:1024]
    return np.mean([len(set(i[b]) & set(gt[b])) / K for b in range(1024)])


r0 = bench("v0 current epilogue        ", v0, 1024, v_bf16, x2, live)
r1 = bench("v1 minimal scores          ", v1, 1024, v_bf16, a)
r2 = bench("v2 no-aggregate + rescore  ", v2, 1024, v_bf16, a)
r3 = bench("v3 v2 @ recall_target 0.90 ", v3, 1024, v_bf16, a)
r4 = bench("v4 v2 @ B=4096             ", v2, 4096, v_bf16, a)
r5 = bench("v5 v2 bf16 scores          ", v5, 1024, v_bf16, a)
for name, r in [("v0", r0), ("v1", r1), ("v2", r2), ("v3", r3),
                ("v4", r4), ("v5", r5)]:
    print(f"recall {name}: {recall(r):.4f}")
