"""pgvector_rx_tpu — a TPU-native vector index framework.

A from-scratch reimplementation of the capabilities of pgvector-rx (a
PostgreSQL HNSW extension, reference at /root/reference) designed for TPU:

- vector types (f32 / f16 / sparse / bit) with text & binary I/O parity
- six distance metrics as batched XLA/Pallas kernels
- an HNSW index stored as flat HBM arrays (CSR-style adjacency) with
  batched multi-query beam search, bulk batched build, incremental
  insert, delete + vacuum graph repair, iterative (resumable) scans
- checkpoint/restore persistence with an append log (WAL analog)
- multi-chip sharding via jax.sharding / shard_map

Layer map (reference -> here):
  L1 constants            -> pgvector_rx_tpu.constants
  L2 types & distances    -> pgvector_rx_tpu.types, pgvector_rx_tpu.ops
  L3 on-disk format       -> pgvector_rx_tpu.index.storage (checkpoints)
  L4 graph algorithms     -> pgvector_rx_tpu.graph (host + device)
  L5 access method        -> pgvector_rx_tpu.index (build/insert/scan/vacuum)
  L6 SQL API              -> pgvector_rx_tpu public Python API
  multi-chip (new design) -> pgvector_rx_tpu.parallel
"""

__version__ = "0.1.0"

from . import constants
from .config import IndexParams, SearchParams
from .types import BitVec, HalfVec, SparseVec, Vector

__all__ = [
    "constants",
    "IndexParams",
    "SearchParams",
    "Vector",
    "HalfVec",
    "SparseVec",
    "BitVec",
]


def __getattr__(name):
    # Lazy imports keep `import pgvector_rx_tpu` light (no JAX needed for
    # pure type work, mirroring the reference's L2/L4 split).
    if name == "HnswIndex":
        from .index.hnsw import HnswIndex

        return HnswIndex
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
