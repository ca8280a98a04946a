"""One REAL 12.5M-row serving-only shard on the chip (VERDICT r3 next
#2): the deployment unit of configs/sharded_100m.py (100M rows /
v5e-8 = 12.5M rows/chip), built and served on the one real v5e —
converting the config's HBM budget from extrapolation to measurement.

One process, in order:
  1. device-resident datagen (12.5M x 128-d f32 = 6.4 GB) + queries
  2. device build, host_graph=False, consume_input=True; report rate
  3. HBM high-water via device memory_stats after build
  4. serving qps: exact / approx / beam(ef=40); recall vs exact
  5. DeviceBeamScan init / amortized next / per-resume segment

Run (quiet host): timeout 5400 python probes/probe_shard125_tpu.py [N]
bf16 serving-store arm (the iterative-scan deployment config) needs
BOTH knobs: PGV_SERVE_DTYPE=bf16 PGV_SERVE_REBIND_LOSSY=1 — the
second frees the f32 build buffer by re-backing the store with the
rounded serve rows (f32+bf16 pair does not fit at 12.5M, DESIGN 6l).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np


def log(*a):
    print("[shard125]", *a, file=sys.stderr, flush=True)


def hbm(dev):
    try:
        s = dev.memory_stats()
        return (f"in_use={s.get('bytes_in_use', 0)/2**30:.2f}GiB "
                f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f}GiB "
                f"limit={s.get('bytes_limit', 0)/2**30:.2f}GiB")
    except Exception as e:  # axon may not expose stats
        return f"memory_stats unavailable: {e}"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12_500_000
    n_q, k = 4096, 10
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
    data, queries = make_dataset_device(n, 128, n_q)
    # block_until_ready is a no-op through the tunnel; sync by scalar
    float(np.asarray(data[0, 0]))
    log(f"datagen {time.time()-t0:.1f}s; hbm {hbm(dev)}")

    t0 = time.time()
    index = HnswIndex.build(
        data, metric="l2", method="device", seed=1, host_graph=False,
        consume_input=True,
    )
    dt = time.time() - t0
    log(f"build {dt:.1f}s = {n/dt:.0f} vec/s; hbm {hbm(dev)}")

    if os.environ.get("PGV_SHARD125_ONLY") == "beamscan":
        # lean mode: the serve sweeps' transients fragment HBM enough
        # that a later beam-scan compile OOMs at this scale — measure
        # the resumable scan against the freshly built index alone
        _beamscan(index, queries, dev)
        return

    # serving: exact GT then approx/beam recall + qps
    t0 = time.time()
    _, gt = dm.serve_topk(index, queries, k, engine="exact")
    log(f"exact warm+run {time.time()-t0:.1f}s; hbm {hbm(dev)}")
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

    _beamscan(index, queries, dev)


def _beamscan(index, queries, dev):
    import numpy as np

    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.index.scan import DeviceBeamScan

    # resumable beam scan (the per-shard iterative engine)
    q_host = np.asarray(queries[:9])
    params = SearchParams(ef_search=40, iterative_scan="relaxed_order")
    sc = DeviceBeamScan(index, q_host[0], params)
    sc.take(2)  # warm segment program
    inits, resumes, nexts = [], [], []
    for b in range(1, 9):
        t0 = time.time()
        sc = DeviceBeamScan(index, q_host[b], params)
        sc.next()
        inits.append(time.time() - t0)
        t0 = time.time()
        got = sc.take(5 * 40 * 4)
        d = time.time() - t0
        nexts.append(d / max(len(got), 1))
        resumes.append(d / max(sc.scan_stats.resumes, 1))
    log(f"beamscan: init {np.mean(inits)*1e3:.0f}ms | "
        f"next {np.mean(nexts)*1e6:.0f}us | "
        f"resume-seg {np.mean(resumes)*1e3:.0f}ms")
    log(f"final hbm {hbm(dev)}")


if __name__ == "__main__":
    main()
