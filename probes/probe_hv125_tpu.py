"""halfvec(1024) BASELINE config 3 per-chip shard on the REAL chip
(VERDICT r3 next #3).

The 10M x 1024-d corpus does NOT fit one 16 GB v5e — measured HBM
math, not guesswork:
  f16 serving store  10M x 1024 x 2 B = 20.5 GB        (> chip alone)
  build-time values  f32 + bf16 pair  = 6 KB/row -> ~61 GB at 10M
The deployment shape is a v5e-8 slice at 1.25M rows/chip
(configs/halfvec_10m.py). This probe builds and serves EXACTLY that
per-chip shard on the one real chip: 1.25M x 1024-d, metric=ip,
dtype=float16 (values round through the f16 store dtype on device —
halfvec.rs:869-880 semantics), host_graph=False, consume_input.

Reports: build rate, HBM high-water, exact/approx/beam qps + recall
vs the exact engine (GT w.r.t. the f16-stored values — the halfvec
contract), and DeviceBeamScan resume latency.

Optionally push the single-chip CEILING: argv N (e.g. 2000000) — a
fresh process per attempt (an OOM poisons the process).

Run (quiet host): timeout 5400 python probes/probe_hv125_tpu.py [N]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def log(*a):
    print("[hv125]", *a, file=sys.stderr, flush=True)


def hbm(dev):
    try:
        s = dev.memory_stats()
        return (f"in_use={s.get('bytes_in_use', 0)/2**30:.2f}GiB "
                f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f}GiB")
    except Exception as e:
        return f"memory_stats unavailable: {e}"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_250_000
    dim, n_q, k = 1024, 4096, 10
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    log("devices:", jax.devices())

    from bench import make_dataset_device
    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.graph import device as dm
    from pgvector_rx_tpu.index.hnsw import HnswIndex
    from pgvector_rx_tpu.index.scan import DeviceBeamScan

    t0 = time.time()
    data, queries = make_dataset_device(n, dim, n_q, seed=6, intrinsic=32)
    float(np.asarray(data[0, 0]))  # tunnel sync (block_until_ready no-ops)
    log(f"datagen {time.time()-t0:.1f}s; hbm {hbm(dev)}")

    t0 = time.time()
    index = HnswIndex.build(
        data, metric="ip", method="device", seed=1, dtype=np.float16,
        host_graph=False, consume_input=True,
    )
    dt = time.time() - t0
    log(f"build {dt:.1f}s = {n/dt:.0f} vec/s; hbm {hbm(dev)}")

    _, gt = dm.serve_topk(index, queries, k, engine="exact")
    log(f"post-GT hbm {hbm(dev)}")
    for engine in ("exact", "approx", "beam"):
        dm.serve_topk(index, queries, k, engine=engine)  # warm
        best = None
        for _ in range(3):
            t0 = time.time()
            _, ids = dm.serve_topk(index, queries, k, engine=engine)
            d = time.time() - t0
            best = d if best is None else min(best, d)
        rec = float(np.mean(
            [len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)]
        ))
        log(f"serve {engine}: {n_q/best:.0f} qps recall@10={rec:.4f}")
    log(f"post-serve hbm {hbm(dev)}")

    q_host = np.asarray(queries[:9]).astype(np.float32)
    params = SearchParams(ef_search=40, iterative_scan="relaxed_order")
    sc = DeviceBeamScan(index, q_host[0], params)
    sc.take(2)
    inits, nexts = [], []
    for b in range(1, 9):
        t0 = time.time()
        sc = DeviceBeamScan(index, q_host[b], params)
        sc.next()
        inits.append(time.time() - t0)
        t0 = time.time()
        got = sc.take(400)
        nexts.append((time.time() - t0) / max(len(got), 1))
    log(f"beamscan: init {np.mean(inits)*1e3:.0f}ms | "
        f"next {np.mean(nexts)*1e6:.0f}us; final hbm {hbm(dev)}")


if __name__ == "__main__":
    main()
