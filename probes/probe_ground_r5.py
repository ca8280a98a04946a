"""r5 ground-quality arms (VERDICT r4 #2/#6): ivf hop/stride variants
vs the beam ground, measured by BUILD steady rate + beam(ef=40)
serving recall on the resulting graph — the quantity that matters
wherever the graph IS the engine (iterative scans, >4M corpora).

One process, arms sequential (each arm constructs a fresh
DeviceBuilder, whose jit wrappers are per-instance, so env-knob arms
retrace correctly — no same-process A/B trap). The corpus is generated
once on device and shared; each arm's index is dropped before the
next. Steady rates from device_build.GROUP_STATS exclude the ramp and
one-time compile windows, so arm order doesn't bias the comparison.

Usage:
  timeout 3600 python probes/probe_ground_r5.py <metric> <dim> <n> arm...
arms: default | hopNN | hopNNsK (hop NN, stride K) | beam | probesNN
e.g.  python probes/probe_ground_r5.py l2 128 1000000 default hop32 hop32s2
      python probes/probe_ground_r5.py cosine 768 1000000 default hop32 beam
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import gc
import os
import re
import sys
import time

import numpy as np


def log(*a):
    print("[ground]", *a, file=sys.stderr, flush=True)


ARM_KNOBS = (
    "PGV_BUILD_GROUND",
    "PGV_BUILD_IVF_HOP",
    "PGV_BUILD_IVF_HOP_STRIDE",
    "PGV_BUILD_IVF_PROBES",
)


def arm_env(arm: str) -> dict:
    if arm == "default":
        return {}
    if arm == "beam":
        return {"PGV_BUILD_GROUND": "beam"}
    m = re.fullmatch(r"hop(\d+)(?:s(\d+))?", arm)
    if m:
        env = {"PGV_BUILD_IVF_HOP": m.group(1)}
        if m.group(2):
            env["PGV_BUILD_IVF_HOP_STRIDE"] = m.group(2)
        return env
    m = re.fullmatch(r"probes(\d+)", arm)
    if m:
        return {"PGV_BUILD_IVF_PROBES": m.group(1)}
    raise SystemExit(f"unknown arm {arm!r}")


def main():
    metric, dim, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    arms = sys.argv[4:] or ["default"]
    n_q, k = 4096, 10
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())
    import jax.numpy as jnp  # noqa: F401

    from bench import make_dataset_device
    from pgvector_rx_tpu.graph import device as dm
    from pgvector_rx_tpu.graph import device_build
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    t0 = time.time()
    intrinsic = 16 if dim <= 256 else (24 if dim <= 768 else 32)
    data, queries = make_dataset_device(
        n, dim, n_q, seed=5, intrinsic=intrinsic
    )
    float(np.asarray(data[0, 0]))  # sync
    log(f"datagen {time.time()-t0:.1f}s ({n}x{dim}, {metric})")

    results = []
    for arm in arms:
        env = arm_env(arm)
        old = {k_: os.environ.get(k_) for k_ in ARM_KNOBS}
        for k_ in ARM_KNOBS:
            os.environ.pop(k_, None)
        os.environ.update(env)
        try:
            device_build.GROUP_STATS = stats = []
            t0 = time.time()
            index = HnswIndex.build(
                data, metric=metric, method="device", seed=1,
                host_graph=False,
            )
            build_s = time.time() - t0
            device_build.GROUP_STATS = None
            import bench

            steady, cold = bench.steady_build_rate(stats)

            qd = dm.prepare_queries(index, queries)
            _, gt = dm.serve_topk(index, qd, k, engine="exact")
            dm.serve_topk(index, qd, k, engine="beam", ef=40)  # warm
            t0 = time.time()
            _, ids = dm.serve_topk(index, qd, k, engine="beam", ef=40)
            beam_s = time.time() - t0
            rec = float(np.mean(
                [len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)]
            ))
            results.append((arm, steady, build_s, cold, rec))
            log(
                f"arm {arm}: steady {steady:.0f}/s (e2e {build_s:.1f}s,"
                f" one-time {cold:.1f}s) | beam(ef=40) recall@10="
                f"{rec:.4f} ({n_q/beam_s:.0f} qps)"
            )
            del index, qd, gt, ids
            gc.collect()
        finally:
            for k_, v in old.items():
                if v is None:
                    os.environ.pop(k_, None)
                else:
                    os.environ[k_] = v
    log("=== summary ===")
    for arm, steady, build_s, cold, rec in results:
        log(
            f"{arm:12s} steady={steady:8.0f}/s e2e={build_s:7.1f}s "
            f"beam40={rec:.4f}"
        )


if __name__ == "__main__":
    main()
