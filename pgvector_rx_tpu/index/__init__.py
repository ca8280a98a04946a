"""The index access layer: build, insert, scan, vacuum, persistence.

TPU-native analog of reference ``src/index/`` — the page/buffer on-disk
format is replaced by flat arrays (host canonical + device mirrors), the
lock protocol by single-writer batched mutation, and WAL by checkpoints
plus an append log (see :mod:`.storage`).
"""

from .hnsw import HnswIndex

__all__ = ["HnswIndex"]
