"""Phase-level timing probe: search vs commit cost per batch, in the
largest exact bucket (w=131072) and the descent regime (w=0).

Runs the normal fused build (cached programs) up to each regime
boundary, then times the split search/commit programs per batch with a
scalar readback sync per dispatch (~40ms tunnel round trip, negligible
vs the >100ms phases being measured).

Usage: python probe_phase.py [N]   (default 393216 = ramp + 2 descent
groups' worth). Device-generated corpus (zero transfer).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 393216
    dim = 128

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(jax.devices(), file=sys.stderr, flush=True)

    from bench import make_dataset_device
    from pgvector_rx_tpu.graph.device_build import (
        DeviceBuilder,
        batch_schedule,
    )

    data, _ = make_dataset_device(n, dim, 16)
    levels_rng = np.random.default_rng(1)
    m = 16
    ml = 1.0 / np.log(m)
    levels = np.minimum(
        np.floor(-np.log(levels_rng.random(n)) * ml).astype(np.int32), 30
    )
    import os

    b = DeviceBuilder(
        "l2", data, levels, m, 64,
        batch_max=int(os.environ.get("PGV_BUILD_BATCH", 0)) or 1024,
    )
    b.seed_first(0)

    def sync():
        int(np.asarray(b.arrays.entry))

    sched = batch_schedule(n, b.batch_max)
    NPROBE = 6

    def split_timed(batches, width, label):
        """Per-batch search/commit with syncs for the first NPROBE
        batches of this group, fused bucket program for the rest."""
        probed = batches[:NPROBE]
        rest = batches[NPROBE:]
        for bi, (s, z) in enumerate(probed):
            t0 = time.time()
            sel = b._search_jit(
                b.data, b.arrays, jnp.int32(s), jnp.int32(z), width=width
            )
            float(np.asarray(sel[0][0, 0, 0]))
            t1 = time.time()
            b.arrays = b._commit_jit(
                b.data, b.arrays, jnp.int32(s), jnp.int32(z), *sel
            )
            sync()
            t2 = time.time()
            print(
                f"[{label}] batch@{s} search {t1-t0:.3f}s "
                f"commit {t2-t1:.3f}s",
                file=sys.stderr,
                flush=True,
            )
        if rest:
            run_group(rest, width)

    def run_group(batches, width):
        NB = 128
        starts = np.zeros(NB, np.int32)
        sizes = np.zeros(NB, np.int32)
        for i, (s, z) in enumerate(batches):
            starts[i] = s
            sizes[i] = z
        t0 = time.time()
        b.arrays = b._bucket_jit(
            b.data,
            b.arrays,
            jnp.asarray(starts),
            jnp.asarray(sizes),
            jnp.int32(len(batches)),
            width=width,
        )
        sync()
        nel = sum(z for _, z in batches)
        print(
            f"[group w={width}] {len(batches)}b {nel}el "
            f"{time.time()-t0:.2f}s",
            file=sys.stderr,
            flush=True,
        )

    # group identically to run_all
    groups = []
    for start, size in sched:
        w = b._width_for(start)
        if groups and groups[-1][0] == w and len(groups[-1][1]) < 128:
            groups[-1][1].append((start, size))
        else:
            groups.append((w, [(start, size)]))

    # stop early once this many elements are committed (0 = run all):
    # lets big-N probes measure the big-cap STATIC SHAPES (beam steps,
    # upper sweep width) without paying for the whole build
    import os

    stop_elems = int(os.environ.get("PGV_PROBE_STOP_ELEMS", 0))
    done = 0
    for w, batches in groups:
        if w in (131072, 65536, 0):
            split_timed(batches, w, f"w={w}")
        elif w == -1:
            # merged-regime groups: resolve the per-batch width the way
            # run_batch does, probe with the split programs
            start0 = batches[0][0]
            eff = 0 if start0 + 1 > b.descent_min else min(
                b.descent_min, b.cap + 1
            )
            split_timed(batches, eff, f"w=-1(eff={eff})")
        else:
            run_group(batches, w)
        done += sum(z for _, z in batches)
        if stop_elems and done >= stop_elems:
            print(f"[probe] stopping at {done} elems", file=sys.stderr,
                  flush=True)
            break


if __name__ == "__main__":
    main()
