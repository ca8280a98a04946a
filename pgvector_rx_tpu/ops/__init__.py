"""Batched device compute kernels (XLA + Pallas).

The TPU-native replacement for the reference's per-pair
``FunctionCall2Coll`` distance calls (reference graph/mod.rs:144-145,
scan.rs:155-228): distances are computed in batches that map onto the
MXU/VPU, with gathers from flat HBM arrays instead of buffer reads.
"""

from . import bits, distances, sparse

__all__ = ["distances", "bits", "sparse"]
