"""A/B probe: XLA approx_min_k sweep vs Pallas tile-min sweep vs Pallas
binned sweep, back-to-back in ONE process (DESIGN.md 6e variance rule).

The tile-min kernel spends the minimum VPU work per score element
(assemble + mask/OR-pack + one integer min-reduce, and only [tb, 1]
VMEM writes per tile) — the DESIGN.md 7d "streaming variant" question:
can anything beat XLA's fused approx_min_k PartialReduce?

Usage: python probe_tilemin.py [N]  (default 1_000_000, device datagen)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_q = int(os.environ.get("PGV_PROBE_Q", 16384))
    dim = 128
    k = 10

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(jax.devices(), file=sys.stderr, flush=True)

    from bench import make_dataset_device
    from pgvector_rx_tpu.graph import device as dm
    from pgvector_rx_tpu.index.hnsw import HnswIndex
    from pgvector_rx_tpu.ops.pallas_bruteforce import (
        binned_sweep_topk,
        tilemin_sweep_topk,
    )

    data, queries = make_dataset_device(n, dim, n_q)
    t0 = time.time()
    index = HnswIndex.build(
        data, metric="l2", method="device", seed=1, host_graph=False
    )
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    g = index.device_graph()

    import functools

    chunk = 1024

    @functools.partial(jax.jit, static_argnames=("kernel", "tb", "tn"))
    def serve_pallas(vals_bf16, a, q_all, kernel: str, tb: int, tn: int):
        def one(qc):
            fn = tilemin_sweep_topk if kernel == "tilemin" else (
                binned_sweep_topk
            )
            return fn(vals_bf16, a, qc, k, "l2", tb=tb, tn=tn)

        d, i = jax.lax.map(one, q_all.reshape(-1, chunk, dim))
        return d.reshape(n_q, -1), i.reshape(n_q, -1)

    live = g.traversable & (g.tid_count > 0)
    pen = jnp.where(live, 0.0, 3.0e38)
    a = g.x2 + pen
    vals = g.values_bf16 if g.values_bf16 is not None else g.values

    def timed(label, fn):
        fn()  # warm/compile
        t0 = time.time()
        d, ids = fn()
        ids = np.asarray(ids)
        dt = time.time() - t0
        return label, dt, ids

    def xla():
        return dm.serve_topk(index, queries, k, engine="approx")

    runs = [("xla_approx", xla)]
    for tb in (256, 512):
        for tn in (1024, 2048):
            runs.append(
                (
                    f"tilemin tb={tb} tn={tn}",
                    lambda tb=tb, tn=tn: (
                        lambda r: (np.asarray(r[0]), np.asarray(r[1]))
                    )(serve_pallas(vals, a, queries, "tilemin", tb, tn)),
                )
            )
    runs.append(
        (
            "binned tb=256 tn=1024",
            lambda: (lambda r: (np.asarray(r[0]), np.asarray(r[1])))(
                serve_pallas(vals, a, queries, "binned", 256, 1024)
            ),
        )
    )

    # ground truth from the exact engine (recall-1.0)
    _, gt = dm.serve_topk(index, queries, k, engine="exact")

    def recall(ids):
        return float(
            np.mean(
                [len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)]
            )
        )

    results = []
    for label, fn in runs:
        lab, dt, ids = timed(label, fn)
        r = recall(ids)
        qps = n_q / dt
        results.append((lab, qps, r))
        print(f"{lab:24s} qps={qps:8.0f} recall@10={r:.4f}",
              file=sys.stderr, flush=True)
    # repeat the XLA arm last to bracket drift
    lab, dt, ids = timed("xla_approx (re-run)", xla)
    print(
        f"{lab:24s} qps={n_q/dt:8.0f} recall@10={recall(ids):.4f}",
        file=sys.stderr,
        flush=True,
    )


if __name__ == "__main__":
    main()
