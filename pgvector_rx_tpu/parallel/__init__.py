"""Multi-chip scale-out (new design; the reference is single-node).

The reference's only multi-process story is PostgreSQL's buffer manager +
page locks + WAL shipping (SURVEY.md §2 note, handler.rs:153-154
amcanparallel=false). The TPU-native scale-out replaces that with a
node-partitioned index: each chip owns an independent HNSW sub-graph
over its partition of the vectors, queries are replicated, and per-shard
top-k results are merged with one all-gather over ICI
(:mod:`.sharded`).
"""

from .sharded import ShardedHnswIndex

__all__ = ["ShardedHnswIndex"]
