"""Round-3 TPU measurement chain — ONE process (the tunnel charges
380-750s backend init to every fresh process's first dispatch, so all
TPU measurements batch here; see CLAUDE.md).

Stages (each fenced; a crash in one does not kill the rest):
  1. bench.main() at default 1M      — warms the full 1M program set
     (build + serving + pallas GT) for the driver's end-of-round bench
     and reports the current build/serve numbers (round-3 ask #2).
  2. 10M device-resident HnswIndex.build with PGV_BUILD_TIMING=1 —
     end-to-end rate + per-group rate curve: a curve that DEGRADES
     with fill means gather locality, a FLAT 2x-of-1M curve means
     static-shape cost (round-3 ask #3 diagnosis).
  3. DeviceBeamScan init/next/resume latency ON the 10M index —
     per-shard resume cost at 10M rows/shard (round-3 ask #6's
     ">=1M rows/shard" number, measured at 10x that).
  4. probe_phase split search/commit timings at the 10M static shapes
     (CAP_FLOOR emulation, low fill) — attributes stage 2's per-batch
     cost to the search or the commit program.
  5. probe_bitbeam back-to-back hamming beam variance (ask #5).

Usage: python probes/probe_r3_tpu.py [stages, e.g. 1,2,3]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import gc
import importlib.util
import os
import sys
import time
import traceback

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def _load_probe(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_HERE, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

STAGES = (
    set(int(x) for x in sys.argv[1].split(","))
    if len(sys.argv) > 1
    else {1, 2, 3, 4, 5}
)


def log(*a):
    print("[r3]", *a, file=sys.stderr, flush=True)


def fence(name):
    def deco(fn):
        def run(*a, **k):
            t0 = time.time()
            log(f"=== stage {name} start")
            try:
                out = fn(*a, **k)
                log(f"=== stage {name} ok [{time.time()-t0:.0f}s]")
                return out
            except Exception:
                traceback.print_exc()
                log(f"=== stage {name} FAILED [{time.time()-t0:.0f}s]")
                return None

        return run

    return deco


@fence("1-bench1m")
def stage1():
    import bench

    bench.main()


@fence("2-build10m")
def stage2():
    os.environ["PGV_BUILD_TIMING"] = "1"
    import jax.numpy as jnp  # noqa: F401

    from bench import make_dataset_device
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    n = int(os.environ.get("PGV_R3_N10M", 10_000_000))
    t0 = time.time()
    data, queries = make_dataset_device(n, 128, 16)
    int(np.asarray(queries[0, 0] * 0))
    log(f"10M datagen {time.time()-t0:.1f}s")
    q_host = np.asarray(queries)
    t0 = time.time()
    index = HnswIndex.build(
        data, metric="l2", method="device", seed=1, host_graph=False,
        consume_input=True,
    )
    dt = time.time() - t0
    log(f"10M BUILD {dt:.1f}s = {n/dt:.0f} vec/s")
    os.environ.pop("PGV_BUILD_TIMING", None)
    return index, q_host


@fence("3-resume10m")
def stage3(index, q_host):
    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.index.scan import DeviceBeamScan

    params = SearchParams(ef_search=40, iterative_scan="relaxed_order")
    sc = DeviceBeamScan(index, q_host[0], params)
    sc.take(2)  # warm the segment program
    inits, nexts, per_res = [], [], []
    for b in range(1, 9):
        t0 = time.time()
        sc = DeviceBeamScan(index, q_host[b], params)
        sc.next()
        inits.append(time.time() - t0)
        t0 = time.time()
        got = sc.take(5 * 40 * 4)  # force several segment resumes
        dt = time.time() - t0
        nexts.append(dt / max(len(got), 1))
        per_res.append(dt / max(sc.scan_stats.resumes, 1))
    log(
        f"10M DeviceBeamScan: init(first item) {np.mean(inits)*1e3:.0f}ms"
        f" | amortized next() {np.mean(nexts)*1e6:.0f}us"
        f" | per-resume segment {np.mean(per_res)*1e3:.0f}ms"
    )


@fence("4-split10mshape")
def stage4():
    os.environ["PGV_BUILD_CAP_FLOOR"] = "10485760"
    os.environ["PGV_BUILD_UPPER_FLOOR"] = "1048576"
    os.environ["PGV_PROBE_STOP_ELEMS"] = "400000"
    sys.argv = ["probe_phase", "524288"]
    _load_probe("probe_phase").main()
    for k in (
        "PGV_BUILD_CAP_FLOOR",
        "PGV_BUILD_UPPER_FLOOR",
        "PGV_PROBE_STOP_ELEMS",
    ):
        os.environ.pop(k, None)


@fence("5-bitbeam")
def stage5():
    sys.argv = ["probe_bitbeam"]
    _load_probe("probe_bitbeam").main()


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())

    if 1 in STAGES:
        stage1()
        gc.collect()
    index = q_host = None
    if 2 in STAGES:
        out = stage2()
        if out:
            index, q_host = out
    if 3 in STAGES and index is not None:
        stage3(index, q_host)
    del index
    gc.collect()
    if 4 in STAGES:
        stage4()
        gc.collect()
    if 5 in STAGES:
        stage5()


if __name__ == "__main__":
    main()
