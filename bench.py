"""Benchmark: serving QPS/chip at recall@10 >= 0.95 (BASELINE.json headline).

Builds a dense f32 L2 HNSW index on SIFT-like clustered synthetic data
(128-d; SIFT1M itself is not fetchable in this zero-egress image) with
the batched exact-scored device build, then measures steady-state
batched query throughput for each serving engine and reports the
fastest one whose measured recall@10 (vs exact ground truth) clears
0.95:

- "exact":  one MXU matmul + top-k over live rows (recall 1.0)
- "approx": bf16 scoring + lax.approx_min_k (TPU-KNN recipe)
- "beam":   batched HNSW graph beam search at ef_search=40
  (PGV_BENCH_BEAM=0 to skip; it is the parity path, not the fast path)

Each engine serves the whole staged query matrix in ONE device program
and ONE result download (graph.device.serve_topk) — the dev harness's
tunnel charges ~0.5s per dispatch and per download regardless of size,
so per-batch host loops measure the tunnel, not the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 20000 (BASELINE.md: >= 20k QPS/chip target).

Env knobs: PGV_BENCH_N (default 1000000), PGV_BENCH_Q (16384 queries),
PGV_BENCH_DIM (128), PGV_BENCH_BEAM (1), PGV_BENCH_DEVICE_INPUT
(default 1: corpus generated device-resident, zero-transfer ingest;
0 = host numpy ingest, which through the dev harness's tunnel mostly
measures tunnel bandwidth).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_sift_like(n, d, seed=0, n_clusters=1000):
    """Pathological variant: well-separated full-rank Gaussian balls.

    Kept for robustness experiments (PGV_BENCH_DATA=hard). This is NOT
    SIFT-like difficulty: cluster separation is ~5.7x the cluster
    radius (graph descent gets one shot at picking the right basin and
    cannot recover below it), and within a ball the points are iid
    128-d Gaussian — distance concentration leaves no local structure
    for ANY graph-ANN method to exploit. Real SIFT has intrinsic
    dimensionality ~12-16 and continuous density.
    """
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    data = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    return data.astype(np.float32)


def make_dataset(n, d, n_q, seed=0, n_clusters=1000, intrinsic=16):
    """SIFT-like synthetic corpus + queries (the bench default).

    Matches the two properties that make SIFT1M tractable for graph
    ANN: LOW INTRINSIC DIMENSIONALITY (points live near a random
    `intrinsic`-dim linear manifold — SIFT's is ~12-16) and
    OVERLAPPING cluster structure (latent centers at ~1.4x the cluster
    radius: non-uniform density but no isolated basins). Queries are
    latent-space perturbations of database points, like SIFT's query
    set being descriptors of the same scene distribution.
    """
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((intrinsic, d)).astype(np.float32)
    proj /= np.sqrt(intrinsic)
    centers_z = rng.standard_normal((n_clusters, intrinsic)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    z = centers_z[assign] + rng.standard_normal((n, intrinsic)).astype(
        np.float32
    )
    data = z @ proj
    data += 0.05 * rng.standard_normal((n, d)).astype(np.float32)

    qrng = np.random.default_rng(seed + 99)
    qsel = qrng.integers(0, n, size=n_q)
    qz = z[qsel] + 0.3 * qrng.standard_normal((n_q, intrinsic)).astype(
        np.float32
    )
    queries = qz @ proj + 0.05 * qrng.standard_normal((n_q, d)).astype(
        np.float32
    )
    return data.astype(np.float32), queries.astype(np.float32)


def make_dataset_device(n, d, n_q, seed=0, n_clusters=1000, intrinsic=16):
    """make_dataset's structure generated ON DEVICE (jax PRNG): same
    SIFT-like geometry (low intrinsic dim, overlapping clusters), zero
    host<->device transfer. Used by PGV_BENCH_DEVICE_INPUT=1, where the
    whole bench — corpus, queries, build, ground truth, serving — runs
    device-resident (the tunneled dev harness's transfer bandwidth
    fluctuates by orders of magnitude and would otherwise dominate)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen():
        ks = jax.random.split(jax.random.PRNGKey(seed), 8)
        proj = jax.random.normal(ks[0], (intrinsic, d), jnp.float32)
        proj = proj / jnp.sqrt(float(intrinsic))
        centers_z = jax.random.normal(
            ks[1], (n_clusters, intrinsic), jnp.float32
        )
        assign = jax.random.randint(ks[2], (n,), 0, n_clusters)
        z = centers_z[assign] + jax.random.normal(
            ks[3], (n, intrinsic), jnp.float32
        )
        data = z @ proj + 0.05 * jax.random.normal(
            ks[4], (n, d), jnp.float32
        )
        qsel = jax.random.randint(ks[5], (n_q,), 0, n)
        qz = z[qsel] + 0.3 * jax.random.normal(
            ks[6], (n_q, intrinsic), jnp.float32
        )
        queries = qz @ proj + 0.05 * jax.random.normal(
            ks[7], (n_q, d), jnp.float32
        )
        return data, queries

    return gen()


def steady_build_rate(stats):
    """(steady vec/s, one-time seconds) from per-group build timings.

    A group that catches a one-time program compile/load window runs
    at a fraction of its neighbors' rate (40-55s billed into a ~5-15s
    group); the early ramp groups (doubling batch schedule over the
    exact-sweep prefix) are also inherently below the descent rate.
    Steady = total elems / total time over groups at >= half the
    elems-weighted median rate; the excluded groups' excess time over
    the steady rate is reported as ramp/one-time seconds, so a cold
    window is visible in the output instead of silently billed.
    """
    if not stats:
        return float("nan"), 0.0
    rates = sorted(
        ((el / max(dt, 1e-9)), el, dt) for _, el, dt in stats
    )
    total_el = sum(el for _, el, dt in rates)
    acc = 0
    median = rates[-1][0]
    for r, el, _ in rates:
        acc += el
        if acc >= total_el / 2:
            median = r
            break
    kept = [(el, dt) for r, el, dt in rates if r >= median / 2]
    ke = sum(el for el, _ in kept)
    kt = sum(dt for _, dt in kept)
    steady = ke / max(kt, 1e-9)
    cold = sum(
        dt - el / steady for r, el, dt in rates if r < median / 2
    )
    return steady, max(cold, 0.0)


def main():
    n = int(os.environ.get("PGV_BENCH_N", 1_000_000))
    n_q = int(os.environ.get("PGV_BENCH_Q", 16384))
    dim = int(os.environ.get("PGV_BENCH_DIM", 128))
    run_beam = os.environ.get("PGV_BENCH_BEAM", "1") != "0"
    # ground-truth source: the fused Pallas kernel stages a SECOND
    # corpus copy — past ~2GB of corpus that plus the builder state
    # OOMs a 16GB chip (measured at 10M x 128-d), so big runs default
    # to the index's own exact sweep (also recall-1.0). PGV_BENCH_GT
    # overrides either way.
    gt_engine = os.environ.get(
        "PGV_BENCH_GT",
        "engine" if n * dim * 4 > (2 << 30) else "pallas",
    ) == "engine"
    k = 10

    import jax

    # persistent compilation cache: repeat runs skip the (minutes-long)
    # XLA compiles of the build/search programs
    cache_dir = os.environ.get("PGV_JAX_CACHE", "/root/.cache/pgv_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    log(f"devices: {jax.devices()}")
    import jax.numpy as jnp

    from pgvector_rx_tpu.graph import device as device_mod
    from pgvector_rx_tpu.graph import device_build
    from pgvector_rx_tpu.index.hnsw import HnswIndex
    from pgvector_rx_tpu.utils.profiling import trace

    # Flush the backend's one-time init (tunnel/worker spin-up: the
    # FIRST dispatch+readback of a fresh process has measured 380-750s
    # through the dev harness's tunnel) so it bills to this line, not
    # to whatever op happens to run first (r4's driver capture billed
    # it to "datagen").
    t0 = time.time()
    int(np.asarray(jnp.zeros((8, 8))[0, 0]))
    log(f"backend init: {time.time()-t0:.1f}s")

    # PGV_PROFILE=<dir>: capture an xprof trace of the build + serving
    # device work (the EXPLAIN ANALYZE analog at the XLA level)
    profile_dir = os.environ.get("PGV_PROFILE")

    # Default to the device-resident corpus (the TPU-native production
    # story: embeddings are produced by a model on the same chip, the
    # index ingests them with zero host transfer). PGV_BENCH_DEVICE_INPUT=0
    # opts into the host-numpy ingest path, whose wall time through the
    # dev harness's tunnel measures tunnel bandwidth (146-812s at 1M
    # measured same-day), not the build engine.
    device_mode = (
        os.environ.get("PGV_BENCH_DEVICE_INPUT", "1") == "1"
        and os.environ.get("PGV_BENCH_DATA") != "hard"
    )
    data = queries = None
    if device_mode:
        log(f"generating {n}x{dim} SIFT-like data ON DEVICE...")
        t0 = time.time()
        data_dev, queries_stage = make_dataset_device(n, dim, n_q)
        int(np.asarray(queries_stage[0, 0] * 0))  # sync (tunnel)
        log(f"  device datagen: {time.time()-t0:.1f}s")
    elif os.environ.get("PGV_BENCH_DATA") == "hard":
        log(f"generating {n}x{dim} separated-ball data...")
        # pathological separated-ball variant (robustness experiments)
        data = make_sift_like(n, dim)
        rng = np.random.default_rng(99)
        qsel = rng.integers(0, n, size=n_q)
        queries = data[qsel] + 0.3 * rng.standard_normal(
            (n_q, dim)
        ).astype(np.float32)
    else:
        log(f"generating {n}x{dim} SIFT-like data...")
        data, queries = make_dataset(n, dim, n_q)

    save_path = os.environ.get("PGV_BENCH_SAVE")
    steady_rate = float("nan")
    cold_s = 0.0
    if save_path and os.path.exists(save_path):
        log(f"loading index from {save_path}...")
        t0 = time.time()
        index = HnswIndex.load(save_path)
        build_s = time.time() - t0
        build_rate = float("nan")
        log(f"  load: {build_s:.1f}s")
    else:
        # ---- warmup: pay every one-time program compile/load BEFORE
        # the build timer. A small corpus built at the big build's
        # exact static shapes (PGV_BUILD_CAP_FLOOR pins the padded
        # capacity, so the ramp/descent/member-init/finalize programs
        # are byte-identical HLO) compiles + loads the whole program
        # set into the server cache; the timed build then runs warm
        # even on a fresh server-cache window. r4's driver capture
        # read 4,537 vec/s (220s) purely because these windows billed
        # into the timer; warm the same code measures 11.5k.
        warm_knob = os.environ.get("PGV_BENCH_WARM", "auto")
        descent_min = device_build._DESCENT_MIN_WIDTH
        do_warm = (
            warm_knob == "1"
            or (
                warm_knob == "auto"
                # past ~4M the warm builder's cap-shaped arrays would
                # sit in HBM next to the full corpus (10M: ~10 GB
                # builder state + 5 GB corpus > 16 GB chip) — big runs
                # accept the one-time windows instead
                and n <= 4_000_000
                and n > descent_min
            )
        )
        if do_warm:
            n_warm = min(n, descent_min + 1024)
            log(
                f"warming build program set ({n_warm} rows at the "
                f"{n}-row static shapes)..."
            )
            t0 = time.time()
            warm_input = (
                data_dev[:n_warm] if device_mode else data[:n_warm]
            )
            # pin EVERY data-dependent shape to the main build's: the
            # element capacity (CAP_FLOOR) and the upper/sub-table pads
            # (UPPER_FLOOR/SUB_FLOORS, derived from the main build's
            # seed-deterministic level draws) — otherwise the warmed
            # programs miss on those shapes and the timed build pays
            # 45-171s recompiles (r5 truly-cold run: 2,724 vec/s e2e)
            probe_idx = HnswIndex(dim, metric="l2", seed=1)
            uf, subs = device_build.shape_floors_for(
                n, probe_idx.params.m, probe_idx.random_levels(n)
            )
            del probe_idx
            os.environ["PGV_BUILD_CAP_FLOOR"] = str(
                device_build.cap_pad_for(n)
            )
            os.environ["PGV_BUILD_UPPER_FLOOR"] = str(uf)
            os.environ["PGV_BUILD_SUB_FLOORS"] = subs
            try:
                warm_idx = HnswIndex.build(
                    warm_input, metric="l2", method="device", seed=1,
                    host_graph=False,
                )
            finally:
                del os.environ["PGV_BUILD_CAP_FLOOR"]
                del os.environ["PGV_BUILD_UPPER_FLOOR"]
                del os.environ["PGV_BUILD_SUB_FLOORS"]
            del warm_idx, warm_input
            import gc

            gc.collect()
            log(f"  warmup: {time.time()-t0:.1f}s")
        # device_mode: the corpus is already device-resident (the
        # TPU-native production story — embeddings produced on the same
        # chip) and the build runs transfer-free end to end. When the
        # ground truth reuses the index's own exact sweep (engine GT),
        # the build may consume the corpus buffer — required to fit a
        # 10M x 128-d build + serve in one 16GB chip.
        build_input = data_dev if device_mode else data
        consume = device_mode and gt_engine
        if consume:
            data_dev = None  # ownership moves to the build
        log("building index (batched device build)...")
        device_build.GROUP_STATS = stats = []
        t0 = time.time()
        with trace(profile_dir and os.path.join(profile_dir, "build")):
            index = HnswIndex.build(
                build_input, metric="l2", method="device", seed=1,
                host_graph=False, consume_input=consume,
            )
        del build_input
        build_s = time.time() - t0
        device_build.GROUP_STATS = None
        build_rate = n / build_s
        steady_rate, cold_s = steady_build_rate(stats)
        for w, el, dt in stats:  # where the build time went
            log(
                f"    group w={w} elems={el} {dt:.2f}s "
                f"({el/max(dt,1e-9):.0f}/s)"
            )
        log(
            f"  build: {build_s:.1f}s = {build_rate:.0f} vectors/sec "
            f"(steady {steady_rate:.0f}/s, ramp/one-time "
            f"{cold_s:.1f}s)"
        )
        if save_path:
            index.save(save_path)
            log(f"  saved to {save_path}")

    # stage queries in HBM once: serving steady state measures the
    # engines, not the harness's host-device tunnel
    queries_dev = queries_stage if device_mode else jnp.asarray(queries)

    log("computing exact ground truth...")
    from pgvector_rx_tpu.ops.pallas_bruteforce import available, l2_topk

    t0 = time.time()
    if available() and not gt_engine:
        # independent GT via the fused Pallas kernel (stages a second
        # corpus copy — at 10M rows that exceeds HBM; PGV_BENCH_GT=engine
        # reuses the index's own exact sweep, which is also recall-1.0)
        base = data_dev if device_mode else jnp.asarray(data)
        gt_parts = [
            l2_topk(base, queries_dev[s : s + 1024], k)[1]
            for s in range(0, n_q, 1024)
        ]
        gt = np.asarray(jnp.concatenate(gt_parts))
        del base, gt_parts
    else:  # engine GT / CPU smoke runs
        _, gt = device_mod.serve_topk(index, queries_dev, k, engine="exact")
    log(f"  gt in {time.time()-t0:.1f}s")

    def recall_of(ids):
        return float(
            np.mean([len(set(ids[b]) & set(gt[b])) / k for b in range(n_q)])
        )

    def run_engine(name, engine):
        """One-dispatch sweep over the staged queries: (recall, qps)."""
        device_mod.serve_topk(index, queries_dev, k, engine=engine)  # warm
        t0 = time.time()
        with trace(profile_dir and os.path.join(profile_dir, engine)):
            _, ids = device_mod.serve_topk(
                index, queries_dev, k, engine=engine
            )
        dt = time.time() - t0
        rec = recall_of(ids)
        qps = n_q / dt
        log(f"  {name}: recall@10={rec:.4f} qps={qps:.0f}")
        return rec, qps

    results = {}
    results["exact"] = run_engine("exact", "exact")
    results["approx"] = run_engine("approx", "approx")
    if run_beam:
        results["beam(ef=40)"] = run_engine("beam(ef=40)", "beam")

    # headline: fastest engine clearing the 0.95 recall bar
    ok = {e: (r, q) for e, (r, q) in results.items() if r >= 0.95}
    best = max(ok, key=lambda e: ok[e][1])
    rec, qps = ok[best]

    detail = ", ".join(
        f"{e}: {q:.0f} qps @ r={r:.3f}" for e, (r, q) in results.items()
    )
    log(f"RESULT: N={n} engine={best} recall@10={rec:.4f} qps={qps:.0f}")
    print(
        json.dumps(
            {
                "metric": (
                    f"serving_qps_per_chip_at_recall10>=0.95 "
                    f"(N={n}, d={dim}, l2, engine={best}; "
                    f"build={build_rate:.0f} vec/s e2e, "
                    f"{steady_rate:.0f} steady, "
                    f"{cold_s:.0f}s ramp/one-time; {detail})"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 20000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
