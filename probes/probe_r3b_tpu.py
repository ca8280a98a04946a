"""Round-3 10M-build attribution + fix A/B — ONE process (tunnel
charges ~380-750s init per process; batch everything).

Context (probe_r3_tpu stage 2, 2026-08-21): the 10M device build runs
a perfectly FLAT 16.45s per 128-batch group (128.4 ms/batch, 7.97k
vec/s) from 2% fill to 100% fill — static-shape cost, zero gather-
locality effect. The 1M shape runs ~87.5 ms/batch. This probe breaks
the +41 ms down and A/Bs the candidate fixes at the 10M static shapes
(CAP_FLOOR/UPPER_FLOOR emulation, 786k elements per arm).

Stages:
  1. gather microbench — pure row-gather cost of the beam's two hot
     gathers at 1M vs 10M table heights ([131072] random rows from
     [cap,128]bf16 and [cap,48]i32): is the per-step cost bytes or op?
  2. build-arm A/B at 10M shapes: base / steps=16 / CQ512 / ivf
     (PGV_BUILD_GROUND=ivf). Each arm: fresh DeviceBuilder (env knobs
     are read at trace time; a fresh instance gets fresh jit caches),
     6 groups, report per-group seconds.
  3. ivf quality check at REAL 1M: full build with ivf candidates,
     then beam-serving recall vs exact GT (is the ivf graph as good?).

Usage: python probes/probe_r3b_tpu.py [stages]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import gc
import os
import sys
import time
import traceback

import numpy as np

STAGES = (
    set(int(x) for x in sys.argv[1].split(","))
    if len(sys.argv) > 1
    else {1, 2, 3, 4, 5}
)


def log(*a):
    print("[r3b]", *a, file=sys.stderr, flush=True)


def fence(name, fn, *a, **k):
    t0 = time.time()
    log(f"=== {name} start")
    try:
        out = fn(*a, **k)
        log(f"=== {name} ok [{time.time()-t0:.0f}s]")
        return out
    except Exception:
        traceback.print_exc()
        log(f"=== {name} FAILED [{time.time()-t0:.0f}s]")
        return None


def stage1_gathers():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    @jax.jit
    def gather_sum(tbl, idx):
        return tbl[idx].astype(jnp.float32).sum()

    for cap, label in ((1 << 20, "1M"), (10485760, "10M")):
        vec = jax.random.normal(key, (cap, 128), jnp.bfloat16)
        nbr = jax.random.randint(key, (cap, 48), 0, cap, jnp.int32)
        idx = jax.random.randint(key, (131072,), 0, cap, jnp.int32)
        for name, tbl in (("vec[.,128]bf16", vec), ("nbr[.,48]i32", nbr)):
            float(np.asarray(gather_sum(tbl, idx)))  # warm
            t0 = time.time()
            reps = 30
            for _ in range(reps):
                r = gather_sum(tbl, idx)
            float(np.asarray(r))
            dt = (time.time() - t0) / reps
            bytes_ = 131072 * (256 if "vec" in name else 192)
            log(
                f"gather {label} {name}: {dt*1e3:.2f} ms/call "
                f"({bytes_/dt/1e9:.1f} GB/s effective)"
            )
        vec = nbr = idx = None
        gc.collect()


def _run_arm(label, n, env: dict, batch_max=1024):
    """Fresh builder at 10M static shapes; run ~6 groups, print times."""
    import jax.numpy as jnp  # noqa: F401

    from bench import make_dataset_device
    from pgvector_rx_tpu.graph.device_build import (
        DeviceBuilder,
        batch_schedule,
    )

    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    os.environ["PGV_BUILD_CAP_FLOOR"] = "10485760"
    os.environ["PGV_BUILD_UPPER_FLOOR"] = "1048576"
    os.environ["PGV_BUILD_TIMING"] = "1"
    try:
        data, _ = make_dataset_device(n, 128, 16)
        rng = np.random.default_rng(1)
        m = 16
        levels = np.minimum(
            np.floor(-np.log(rng.random(n)) / np.log(m)).astype(np.int32),
            30,
        )
        t0 = time.time()
        # consume_input: free the datagen buffer once the padded build
        # copy exists — the 10M-cap arrays + run transients peak within
        # a few hundred MB of the 16GB chip (arm-base OOMed its first
        # group with the buffer kept; the real 10M build consumes too)
        b = DeviceBuilder("l2", data, levels, m, 64, batch_max=batch_max,
                          consume_input=True)
        data = None
        b.seed_first(0)
        log(f"arm {label}: builder init {time.time()-t0:.1f}s")
        t0 = time.time()
        b.run_all(batch_schedule(n, b.batch_max))
        int(np.asarray(b.arrays.entry))
        log(f"arm {label}: total {time.time()-t0:.1f}s for {n} elems")
        del b, data
        gc.collect()
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        for k in (
            "PGV_BUILD_CAP_FLOOR",
            "PGV_BUILD_UPPER_FLOOR",
            "PGV_BUILD_TIMING",
        ):
            os.environ.pop(k, None)


ARMS = {
    "base": {},
    "steps16": {"PGV_BUILD_BEAM_STEPS": "16"},
    "cq512": {"PGV_BUILD_SEED_CQ": "512"},
    "ivf": {"PGV_BUILD_GROUND": "ivf"},
    "e8s9": {"PGV_BUILD_BEAM_STEPS": "9", "PGV_BUILD_BEAM_EXPAND": "8"},
}


def stage2_arms():
    """One arm per PROCESS (PGV_R3B_ARM): an OOM poisons the chip for
    the rest of the process (arm-base's OOM took down every later
    stage on 2026-08-21 — buffers never freed), and the trace-time env
    knobs need process isolation anyway."""
    n = int(os.environ.get("PGV_R3B_N", 524288))
    which = os.environ.get("PGV_R3B_ARM")
    for name, env in ARMS.items():
        if which and name != which:
            continue
        fence(f"arm-{name}", _run_arm, name, n, env)


def stage4_resume1m():
    """DeviceBeamScan init/next/resume at 1M rows on the real chip
    (round-3 ask #6's >=1M-rows/shard number; the 10M in-process
    attempt OOMs next to the resident 10M index)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "probe_beamresume_tpu",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "probe_beamresume_tpu.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sys.argv = ["probe_beamresume_tpu"]
    m.main()


def stage5_bitbeam():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "probe_bitbeam",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "probe_bitbeam.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sys.argv = ["probe_bitbeam"]
    m.main()


def stage3_ivf_quality():
    import jax.numpy as jnp

    from bench import make_dataset_device
    from pgvector_rx_tpu.graph import device as dm
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    n, n_q, k = 1_000_000, 16384, 10
    os.environ["PGV_BUILD_GROUND"] = "ivf"
    try:
        data, queries = make_dataset_device(n, 128, n_q)
        t0 = time.time()
        index = HnswIndex.build(
            data, metric="l2", method="device", seed=1, host_graph=False,
        )
        log(f"ivf 1M build {time.time()-t0:.1f}s = {n/(time.time()-t0):.0f}/s")
        _, gt = dm.serve_topk(index, queries, k, engine="exact")
        for engine in ("beam", "approx"):
            t0 = time.time()
            _, ids = dm.serve_topk(index, queries, k, engine=engine)
            dt = time.time() - t0
            rec = float(
                np.mean(
                    [len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)]
                )
            )
            log(f"ivf-graph {engine}: recall@10={rec:.4f} "
                f"qps={n_q/dt:.0f}")
    finally:
        os.environ.pop("PGV_BUILD_GROUND", None)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())
    if 1 in STAGES:
        fence("1-gathers", stage1_gathers)
    if 2 in STAGES:
        fence("2-arms", stage2_arms)
    if 3 in STAGES:
        fence("3-ivfquality", stage3_ivf_quality)
        gc.collect()
    if 4 in STAGES:
        fence("4-resume1m", stage4_resume1m)
        gc.collect()
    if 5 in STAGES:
        fence("5-bitbeam", stage5_bitbeam)


if __name__ == "__main__":
    main()
