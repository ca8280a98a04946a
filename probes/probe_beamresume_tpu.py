"""DeviceBeamScan resume latency at 1M rows on the real TPU (round-3
ask #6: "nobody has timed a resume at >=1M rows/shard").

One process (first-dispatch init amortized): device-build 1M x 128-d,
then time a resumable beam scan's init (first item), steady next(),
and per-resume segment refills, at the default width multiplier and
at 1x for comparison. A shard of the 100M sharded config is exactly
this object, so per-resume cost here IS the per-shard resume cost.

Usage: python probes/probe_beamresume_tpu.py [N=1000000]
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
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(jax.devices(), file=sys.stderr, flush=True)

    from bench import make_dataset_device
    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.index.hnsw import HnswIndex
    from pgvector_rx_tpu.index.scan import DeviceBeamScan

    data, queries = make_dataset_device(n, 128, 16)
    t0 = time.time()
    index = HnswIndex.build(
        data, metric="l2", method="device", seed=1, host_graph=False,
        consume_input=True,
    )
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    q_host = np.asarray(queries)

    params = SearchParams(ef_search=40, iterative_scan="relaxed_order")
    for mult in (4, 1):
        os.environ["PGV_BEAM_SCAN_WIDTH_MULT"] = str(mult)
        # warm the segment program for this width
        sc = DeviceBeamScan(index, q_host[0], params)
        sc.take(2)
        inits, resumes, nexts = [], [], []
        for b in range(1, 9):
            t0 = time.time()
            sc = DeviceBeamScan(index, q_host[b], params)
            sc.next()
            inits.append(time.time() - t0)
            # drain 5 segments' worth to force resumes
            t0 = time.time()
            got = sc.take(5 * 40 * mult)
            dt = time.time() - t0
            nexts.append(dt / max(len(got), 1))
            resumes.append(
                dt / max(sc.scan_stats.resumes, 1)
            )
        print(
            f"width={mult}x: init(first item) {np.mean(inits)*1e3:.0f}ms"
            f" | amortized next() {np.mean(nexts)*1e6:.0f}us"
            f" | per-resume segment {np.mean(resumes)*1e3:.0f}ms",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
