"""cal_tpu — a TPU-native Causal Attention Learning (CAL) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of yongduosui/CAL
(KDD 2022 "Causal Attention for Interpretable and Generalizable Graph
Classification"): GCN/GIN/GAT backbones with node- and edge-level
causal/shortcut attention, soft-masked message passing, segment readouts and
the backdoor-adjustment random intervention — built TPU-first:

* **Dense layout** (primary): graphs are padded to a static node budget and
  batched as ``[B, N, F]`` features + ``[B, N, N]`` adjacency; every
  message-passing op is a batched masked matmul on the MXU.  CAL's graphs are
  small (<= a few hundred nodes), so this is the speed-of-light layout.
* **Sparse layout**: padded edge lists + segment reductions (and Pallas
  kernels) for graphs too large to densify.
* **SPMD**: data parallelism over a ``jax.sharding.Mesh``; the causal
  intervention shuffle is a device-side PRNG permutation (cross-device
  ``ppermute`` when sharded).

Reference behavior citations in docstrings point into /root/reference.
"""

from cal_tpu import graph
from cal_tpu.graph import GraphBatch, DenseGraphBatch, HostGraph

__version__ = "0.1.0"
__all__ = ["graph", "GraphBatch", "DenseGraphBatch", "HostGraph"]
