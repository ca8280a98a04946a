"""ShardedScan init/resume latency: prefetch (parallel per-shard
dispatch) vs serial pulls — round-3 ask #6.

Builds an 8-shard sharded index on the CPU mesh, forces the per-shard
streams onto DeviceBeamScan (the >4M-rows/shard engine — the 100M
shape's stream), then times:
  - init (first item from every shard): with prefetch, all 8 first
    segments are in flight before any download; without, 8 serial
    segment round-trips.
  - steady next() and per-resume (segment refill) latency.

Usage: python probes/probe_shardedscan.py [rows_per_shard=65536]
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgvector_rx_tpu.config import SearchParams  # noqa: E402
from pgvector_rx_tpu.index.hnsw import HnswIndex  # noqa: E402
from pgvector_rx_tpu.index.scan import DeviceBeamScan  # noqa: E402
from pgvector_rx_tpu.parallel.sharded import ShardedHnswIndex  # noqa: E402


def main():
    n_per = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    S, dim = 8, 32
    rng = np.random.default_rng(7)

    t0 = time.time()
    shards = []
    for s in range(S):
        data = rng.standard_normal((n_per, dim)).astype(np.float32)
        shards.append(
            HnswIndex.build(
                data, metric="l2", method="device", seed=s,
                host_graph=False,
            )
        )
        print(f"  shard {s} built [{time.time()-t0:.0f}s]", flush=True)
    idx = ShardedHnswIndex(shards)
    q = rng.standard_normal(dim).astype(np.float32)
    params = SearchParams(ef_search=40, iterative_scan="relaxed_order")

    # force beam-backed per-shard streams (the 100M shape's engine)
    orig_scan = HnswIndex.scan

    def beam_scan(self, query, params=None, method="auto", filter_mask=None):
        return DeviceBeamScan(self, query, params, filter_mask=filter_mask)

    HnswIndex.scan = beam_scan
    try:
        for arm in ("prefetch", "serial"):
            if arm == "serial":
                saved = DeviceBeamScan.prefetch
                DeviceBeamScan.prefetch = lambda self: None
            # warm compile (programs cached after first scan)
            sc = idx.scan(q, params)
            sc.take(5)
            t0 = time.time()
            sc = idx.scan(q, params)
            first = sc.take(1)
            t_init = time.time() - t0
            t0 = time.time()
            sc.take(200)
            t_steady = (time.time() - t0) / 200
            # force resumes: drain well past the first segments
            t0 = time.time()
            sc.take(8 * 40 * 3)
            t_deep = time.time() - t0
            print(
                f"{arm}: init(first item)={t_init*1e3:.1f}ms "
                f"steady next()={t_steady*1e6:.0f}us "
                f"960-deep drain={t_deep:.2f}s "
                f"(resumes={sc.scan_stats.resumes})",
                flush=True,
            )
            if arm == "serial":
                DeviceBeamScan.prefetch = saved
    finally:
        HnswIndex.scan = orig_scan


if __name__ == "__main__":
    main()
