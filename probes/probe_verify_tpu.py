"""Independent correctness cross-check, TPU side.

Generates the bench dataset ON the TPU (bench.make_dataset_device —
jax's threefry PRNG is platform-deterministic, so a CPU process can
regenerate the identical corpus), builds the device index, then dumps
the exact/approx/beam engine ids for the first PROBE_Q queries plus
corpus/query checksums to /tmp/pgv_verify_tpu.npz. probe_verify_cpu.py
recomputes exact top-k with numpy against the same regenerated corpus
and compares — an end-to-end honesty check that the serving numbers
come from real full-corpus computation (recall vs an INDEPENDENT
implementation on INDEPENDENT hardware, not self-agreement).

Run: python probe_verify_tpu.py [N]  (default 1,000,000)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PROBE_Q = 64
K = 10

os.environ.setdefault("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.environ["PGV_JAX_CACHE"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from bench import make_dataset_device  # noqa: E402
from pgvector_rx_tpu.graph import device as device_mod  # noqa: E402
from pgvector_rx_tpu.index.hnsw import HnswIndex  # noqa: E402

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
data_dev, queries_dev = make_dataset_device(N, 128, 16384)
# checksums of the generated arrays (compared against the CPU regen)
data_sum = float(jnp.sum(data_dev.astype(jnp.float64) if False else data_dev))
q_sum = float(jnp.sum(queries_dev))
print(f"data_sum={data_sum} q_sum={q_sum}", file=sys.stderr, flush=True)

t0 = time.time()
index = HnswIndex.build(
    data_dev, metric="l2", method="device", seed=1, host_graph=False
)
print(f"build {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

out = {}
probe = queries_dev[:PROBE_Q]
for engine in ("exact", "approx", "beam"):
    t0 = time.time()
    d, ids = device_mod.serve_topk(index, probe, K, engine=engine)
    print(f"{engine}: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    out[f"{engine}_d"] = d
    out[f"{engine}_ids"] = ids

# timed full-size exact sweep with explicit pre/post sync, as a second
# opinion on the bench's qps numbers (dispatch->download wall time)
full_q = queries_dev
_ = device_mod.serve_topk(index, full_q, K, engine="exact")  # warm
t0 = time.time()
_, ids_full = device_mod.serve_topk(index, full_q, K, engine="exact")
dt = time.time() - t0
print(
    f"full exact sweep: {full_q.shape[0]} queries in {dt:.3f}s = "
    f"{full_q.shape[0]/dt:.0f} qps",
    file=sys.stderr, flush=True,
)

np.savez(
    "/tmp/pgv_verify_tpu.npz",
    n=N,
    data_sum=np.float32(data_sum),
    q_sum=np.float32(q_sum),
    probe_q=PROBE_Q,
    **out,
)
print("saved /tmp/pgv_verify_tpu.npz", file=sys.stderr, flush=True)
