"""HNSW graph algorithms.

- :mod:`.host` — faithful host (numpy) implementation of the reference's
  pure algorithm layer (reference ``src/graph/mod.rs``): the correctness
  anchor, used for sequential insert parity and small builds.
- :mod:`.device` — the batched, jit-compiled TPU implementation: flat
  array graph + multi-query beam search (the QPS path).
"""

from . import host

__all__ = ["host"]
