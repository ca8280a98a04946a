"""Bit-hamming beam variance probe (VERDICT r1 #9 / DESIGN.md 7b).

Round-1 measured the 1M bit(256) hamming beam at 4.7k qps one day and
9.0k another at identical recall. This re-measures it back-to-back in
ONE process (the only valid comparison through this harness — see
DESIGN.md 6e tunnel-variance rule): build once, then serve the beam
arm N times interleaved with the approx arm as a drift bracket.

Usage: python probe_bitbeam.py [N] (default 1_000_000)
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
    nbits = int(os.environ.get("PGV_PROBE_BITS", 256))
    n_q = int(os.environ.get("PGV_PROBE_Q", 16384))
    k = 10
    reps = int(os.environ.get("PGV_PROBE_REPS", 3))

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(jax.devices(), file=sys.stderr, flush=True)

    from pgvector_rx_tpu.graph import device as dm
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    rng = np.random.default_rng(7)
    # clustered bit rows (same generator family as bench_suite bit256)
    centers = rng.integers(0, 2, size=(1000, nbits), dtype=np.uint8)
    assign = rng.integers(0, 1000, size=n)
    flip = (rng.random((n, nbits)) < 0.12)
    bits = np.bitwise_xor(centers[assign], flip.astype(np.uint8))
    qsel = rng.integers(0, n, size=n_q)
    qflip = (rng.random((n_q, nbits)) < 0.05)
    qbits = np.bitwise_xor(bits[qsel], qflip.astype(np.uint8))

    t0 = time.time()
    index = HnswIndex.build(bits, metric="hamming", method="device",
                            host_graph=False, seed=3)
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    from pgvector_rx_tpu.ops.bits import pack_bits

    q_dev = jnp.asarray(pack_bits(qbits))
    _, gt = dm.serve_topk(index, q_dev, k, engine="exact")

    def recall(ids):
        return float(np.mean(
            [len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)]
        ))

    for engine in ("beam", "approx"):
        dm.serve_topk(index, q_dev, k, engine=engine)  # warm
    for r in range(reps):
        for engine in ("beam", "approx"):
            t0 = time.time()
            _, ids = dm.serve_topk(index, q_dev, k, engine=engine)
            dt = time.time() - t0
            print(
                f"rep {r} {engine:7s} qps={n_q/dt:8.0f} "
                f"recall@10={recall(ids):.4f}",
                file=sys.stderr, flush=True,
            )


if __name__ == "__main__":
    main()
