"""relgat_projector_tpu — a TPU-native relational-GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``radlab-dev-group/relgat-projector`` reference (frozen-embedding relational
GAT with projection head, trained on knowledge-graph triplets):

- ``ops``      — segment/scatter primitives: XLA baselines + Pallas TPU kernels
- ``models``   — RelGAT layer (vectorized heads), projection head, scorers
- ``data``     — graph ingestion, id compaction, splits, synthetic KGs,
                 device-resident negative sampling
- ``train``    — jit-compiled train/eval steps, trainer loop, checkpointing
- ``parallel`` — mesh construction and multi-chip sharded train steps
- ``utils``    — seeding, logging adapter

The reference is CUDA/torch/torch-scatter; this framework is TPU-first:
static shapes, dst-sorted padded edge layouts, fused segment-softmax
aggregation, ``pjit``/``shard_map`` over device meshes.
"""

__version__ = "0.1.0"

from relgat_projector_tpu.config import (  # noqa: F401
    ModelConfig,
    TrainConfig,
    RunConfig,
)
