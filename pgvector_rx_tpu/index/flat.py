"""FlatIndex: exact brute-force search (the seqscan analog).

The reference has no flat index type, but every pgvector workload relies
on the planner falling back to a sequential scan with exact ordering
(tests use it as ground truth, e.g. tests/t/012's seqscan queries). On
TPU the exact scan is a first-class citizen: one MXU matmul + top-k per
tile sweeps millions of vectors per chip, so FlatIndex is both the
ground-truth oracle for the recall harness and the planner's alternative
when :func:`pgvector_rx_tpu.index.cost.should_use_index` says no.
"""

from __future__ import annotations

import numpy as np

from ..config import SearchParams


class FlatIndex:
    """Exact k-NN over dense, bit, or sparse rows."""

    def __init__(self, kind: str, metric: str, dim: int):
        self.kind = kind
        self.metric = metric
        self.dim = dim
        self._rows = []
        self._tids = []
        self._device_cache = None

    @classmethod
    def build(cls, data, metric: str = "l2", ids=None, kind: str = "dense"):
        data_arr = data if not isinstance(data, np.ndarray) else np.asarray(data)
        n = len(data_arr)
        idx = cls(kind, metric, np.asarray(data_arr[0]).shape[-1] if kind != "sparse" else 0)
        if ids is None:
            ids = range(n)
        for row, tid in zip(data_arr, ids):
            idx.insert(row, int(tid))
        return idx

    def insert(self, row, tid: int) -> None:
        # sparse rows stay as SparseVec / (indices, values) pairs
        self._rows.append(row if self.kind == "sparse" else np.asarray(row))
        self._tids.append(tid)
        self._device_cache = None

    def delete(self, tids) -> int:
        dead = set(int(t) for t in tids)
        keep = [(r, t) for r, t in zip(self._rows, self._tids) if t not in dead]
        removed = len(self._rows) - len(keep)
        self._rows = [r for r, _ in keep]
        self._tids = [t for _, t in keep]
        self._device_cache = None
        return removed

    @property
    def num_tuples(self) -> int:
        return len(self._rows)

    def search(self, queries, k: int, params: SearchParams | None = None):
        """Exact top-k: (operator distances [B,k], tids [B,k])."""
        import jax
        import jax.numpy as jnp

        from ..ops import bits as bits_ops
        from ..ops import distances as dist_ops

        if self.kind == "sparse":
            from ..types.sparsevec import SparseVec

            single = isinstance(queries, (SparseVec, tuple))
            qlist = [queries] if single else list(queries)
            B = len(qlist)
        else:
            single = (
                np.asarray(queries, dtype=object).ndim == 1
                if self.kind != "dense"
                else np.asarray(queries).ndim == 1
            )
            q = np.atleast_2d(
                np.asarray(
                    queries, dtype=np.float32 if self.kind == "dense" else None
                )
            )
            B = q.shape[0]
        n = self.num_tuples
        if n == 0:
            out_d = np.full((B, k), np.inf)
            out_i = np.full((B, k), -1, dtype=np.int64)
            return (out_d[0], out_i[0]) if single else (out_d, out_i)

        if self.kind == "dense":
            base = np.stack(self._rows).astype(np.float32)
            qq = q.astype(np.float32)
            if self.metric == "cosine":
                base = base / np.maximum(np.linalg.norm(base, axis=1, keepdims=True), 1e-30)
                qq = qq / np.maximum(np.linalg.norm(qq, axis=1, keepdims=True), 1e-30)
            d = dist_ops.pairwise(self.metric, jnp.asarray(base), jnp.asarray(qq))
        elif self.kind == "bit":
            base = bits_ops.pack_bits(np.stack(self._rows))
            qw = bits_ops.pack_bits(q.astype(np.uint8))
            d = bits_ops.pairwise(self.metric, jnp.asarray(base), jnp.asarray(qw))
        else:
            # exact sparse sweep: the merge-join pairwise kernel works at
            # any dimensionality (sparsevec.rs allows dim up to 10^9), so
            # the flat oracle needs no densification. Rows/queries pad to
            # the max nnz seen (sorted-unique indices guaranteed by
            # SparseVec).
            from ..ops import sparse as sparse_ops

            def nnz(v):
                return len(v.indices if hasattr(v, "indices") else v[0])

            budget = max(
                1,
                max((nnz(r) for r in self._rows), default=1),
                max((nnz(s) for s in qlist), default=1),
            )
            bi, bv = sparse_ops.pad_rows(self._rows, budget)
            qi, qv = sparse_ops.pad_rows(qlist, budget)
            # cosine needs no pre-normalization: the sparse kernel
            # divides by both norms (sparsevec.rs:1008-1037 semantics)
            d = sparse_ops.pairwise(
                self.metric,
                jnp.asarray(bi),
                jnp.asarray(bv),
                jnp.asarray(qi),
                jnp.asarray(qv),
            )

        kk = min(k, n)
        neg, pos = jax.lax.top_k(-d, kk)
        dists = np.asarray(-neg, dtype=np.float64)
        if self.metric == "l2":
            dists = np.sqrt(np.maximum(dists, 0.0))
        tid_arr = np.asarray(self._tids, dtype=np.int64)
        ids = tid_arr[np.asarray(pos)]
        if kk < k:
            pad_d = np.full((B, k - kk), np.inf)
            pad_i = np.full((B, k - kk), -1, dtype=np.int64)
            dists = np.concatenate([dists, pad_d], axis=1)
            ids = np.concatenate([ids, pad_i], axis=1)
        if single:
            return dists[0], ids[0]
        return dists, ids
