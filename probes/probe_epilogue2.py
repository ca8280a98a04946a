"""Microbenchmark 3: epilogue variants that KEEP aggregate_to_topk=True
(aggregate_to_topk=False dies at the tunnel's remote-compile size
limit — CLAUDE.md gotcha).

  v1 : penalty-folded f32 scores, rt 0.98  (the shipped engine)
  v1b: scores cast to bf16 before approx_min_k (halve epilogue bytes)
  v1c: f32 scores, recall_target 0.95
  v1d: f32 scores, recall_target 0.90

Run: python probe_epilogue2.py
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
q = jnp.asarray(rng.standard_normal((1024, D)).astype(np.float32))
v_bf16 = v.astype(jnp.bfloat16)
x2 = jnp.sum(v * v, axis=1)


def sync(x):
    return int(np.asarray(jnp.sum(x).astype(jnp.int32)))


def dots_of(qq, vv):
    return jax.lax.dot_general(
        qq.astype(jnp.bfloat16), vv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def make(cast_bf16, rt):
    @jax.jit
    def f(qq, v16, a):
        s = a[None, :] - 2.0 * dots_of(qq, v16)
        if cast_bf16:
            s = s.astype(jnp.bfloat16)
        return jax.lax.approx_min_k(s, K, recall_target=rt)[1]
    return f


variants = [
    ("v1  f32 rt.98 ", make(False, 0.98)),
    ("v1b bf16 rt.98", make(True, 0.98)),
    ("v1c f32 rt.95 ", make(False, 0.95)),
    ("v1d f32 rt.90 ", make(False, 0.90)),
]

s_exact = x2[None, :] - 2.0 * (q @ v.T)
gt = np.asarray(jax.lax.top_k(-s_exact, K)[1])


def recall(ids):
    i = np.asarray(ids)
    return float(np.mean([len(set(i[b]) & set(gt[b])) / K
                          for b in range(1024)]))


res = {}
for name, f in variants:
    sync(f(q, v_bf16, x2))
    t0 = time.time()
    for _ in range(8):
        r = f(q, v_bf16, x2)
    sync(r)
    dt = (time.time() - t0) / 8
    res[name] = r
    print(f"{name}: {dt*1e3:.2f} ms = {1024/dt:,.0f} qps", flush=True)
for name, r in res.items():
    print(f"recall {name}: {recall(r):.4f}")
