"""DeviceBeamScan filtered-recall at 4M+ rows on the real chip — the
044-style contract for the scale where the resumable beam IS the only
iterative engine (past EXACT_ENGINE_MAX_ROWS). DESIGN 7 r4 open item.

GT comes from the exact sweep WITH the same filter_mask (recall-1.0
over the filtered subset by construction, all device-side — no 2 GB
corpus download). Selectivities 2% and 0.2%, k=20, ef=40, both
relaxed and strict order, bf16 serving store (the 100M per-shard
configuration, DESIGN 6l).

Run (quiet host): timeout 2700 python probes/probe_beamscan4m_tpu.py [N]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

os.environ.setdefault("PGV_SERVE_DTYPE", "bf16")


def log(*a):
    print("[bs4m]", *a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    n_q, k = 16, 20
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/pgv_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())

    from bench import make_dataset_device
    from pgvector_rx_tpu.config import SearchParams
    from pgvector_rx_tpu.graph import device as dm
    from pgvector_rx_tpu.index.scan import DeviceBeamScan
    from pgvector_rx_tpu.index.hnsw import HnswIndex

    data, queries = make_dataset_device(n, 128, n_q)
    t0 = time.time()
    index = HnswIndex.build(
        data, metric="l2", method="device", seed=1, host_graph=False,
        consume_input=True,
    )
    log(f"build {time.time()-t0:.1f}s = {n/(time.time()-t0):.0f}/s "
        f"(serve dtype {os.environ['PGV_SERVE_DTYPE']})")
    q_host = np.asarray(queries)

    ef = int(os.environ.get("PGV_BS4M_EF", 40))
    for c in (50, 500):
        mask = (np.arange(n) % c) == 0
        # GT: the exact engine pre-filters INSIDE the sweep
        _, gt = dm.serve_topk(
            index, queries, k, engine="exact", filter_mask=mask
        )
        # strict sweeps the reorder window: 0 = the reference's
        # drop-on-regression semantics, L>=1 = L-segment sliding
        # window (PGV_STRICT_BUFFER). The flag is host-side, read per
        # scan instance, so in-process A/B is safe (no trace-time
        # global capture)
        for mode, buf in (
            ("relaxed_order", "0"),
            ("strict_order", "0"),
            ("strict_order", "1"),
            ("strict_order", "2"),
            ("strict_order", "4"),
        ):
            os.environ["PGV_STRICT_BUFFER"] = buf
            params = SearchParams(ef_search=ef, iterative_scan=mode)
            correct = 0
            t0 = time.time()
            for b in range(n_q):
                sc = DeviceBeamScan(
                    index, q_host[b], params, filter_mask=mask
                )
                got = [tid for tid, _ in sc.take(k)]
                correct += len(set(got) & set(gt[b].tolist()))
            rec = correct / (n_q * k)
            tag = "" if mode != "strict_order" else (
                f" window={buf}" if buf != "0" else " drop"
            )
            log(f"c={c} ({100/c:.1f}%) {mode}{tag} ef={ef} "
                f"ground={os.environ.get('PGV_BUILD_GROUND', 'auto')}: "
                f"recall@20={rec:.4f} "
                f"[{(time.time()-t0)/n_q*1e3:.0f} ms/q]")


if __name__ == "__main__":
    main()
