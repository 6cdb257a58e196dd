"""CleverRec-TPU: a TPU-native recommender framework.

A from-scratch JAX/XLA (pjit + shard_map + Pallas) rebuild of the capability
surface of the CleverRec reference toolkit (reference: /root/reference,
jackwangsysu/CleverRec).  Nothing here is a port of the reference's TF1
graph code; the reference defines *what* to compute (model math, data
invariants, metric formulas), and this package computes it the TPU way:

- device-side negative sampling inside jit-compiled train epochs
  (replaces ``utils/sampler.py``'s Python rejection loops),
- a functional model zoo (``init / loss / score_pairs / score_all`` pure
  functions instead of TF1 placeholder graphs),
- vectorized candidate-list and full-catalog evaluation with on-device
  seen-item masking and ``lax.top_k`` / Pallas fused kernels,
- ``jax.sharding.Mesh`` (axes ``('data', 'model')``) with row-sharded
  embedding tables for multi-chip scaling.
"""

__version__ = "0.1.0"

from cleverrec_tpu.config import Config  # noqa: F401
