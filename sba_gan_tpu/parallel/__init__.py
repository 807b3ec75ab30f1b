"""Device-mesh parallelism utilities.

The reference is a single-GPU research codebase (SURVEY.md §2.4): its only
parallelism is single-node ``nn.DataParallel`` in the legacy generation
(Old_Code/train.py:391-395) with NCCL distributed init left commented out
(:390).  The TPU-native replacement is first-class SPMD: a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis
reserved for the large frozen encoders), batch-dim-sharded inputs, replicated
parameters, and XLA-inserted collectives over ICI — gradients all-reduce
automatically because every reduction over the sharded batch dimension is
global under jit.
"""

from sba_gan_tpu.parallel.mesh import (
    batch_sharding,
    init_distributed,
    local_batch_size,
    make_mesh,
    tensor_constraint,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "init_distributed",
    "replicated",
    "shard_batch",
    "local_batch_size",
    "tensor_constraint",
]
