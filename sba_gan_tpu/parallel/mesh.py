"""Mesh construction and sharding helpers (TPU-native data parallelism).

Replaces the reference's device handling — ``torch.cuda.set_device``
(AttnGAN2/code/trainer.py:36) and legacy ``nn.DataParallel``
(Old_Code/train.py:391-395) — with a ``jax.sharding.Mesh``:

* ``data`` axis: batch-dimension sharding; gradient all-reduce rides ICI and
  is inserted by XLA (no NCCL analogue to write by hand).
* ``model`` axis: reserved for tensor-sharding the big frozen encoders
  (Inception-v3 / BERT); size 1 by default — the GAN itself comfortably
  replicates.

BatchNorm note: with the batch dimension sharded, mean/var reductions inside
jit are *global* (cross-replica) reductions — the framework's documented
SYNC_BATCHNORM=True behavior (cfg.JAX.SYNC_BATCHNORM).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` — the TPU
    analogue of the NCCL ``init_process_group`` the reference left commented
    out (Old_Code/train.py:390).  On TPU pods all arguments come from the
    environment; arguments are for CPU/GPU test rigs.  After this,
    ``jax.devices()`` spans the slice and the same ``make_mesh`` + jit path
    scales over ICI (intra-slice) and DCN (multi-slice) unchanged."""
    # NOTE: must run before anything touches a backend — even
    # jax.process_count() would initialize the runtime and make
    # jax.distributed.initialize fail.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as e:  # single-process dev rig / already initialized
        import logging

        logging.getLogger(__name__).info("distributed init skipped: %s", e)


def make_mesh(
    cfg=None,
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = -1,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    data == -1 means "all remaining devices on the data axis".  With a cfg,
    the shape comes from cfg.JAX.MESH_DATA / cfg.JAX.MESH_MODEL.
    """
    if cfg is not None:
        data = cfg.JAX.MESH_DATA
        model = cfg.JAX.MESH_MODEL
    devs = list(devices) if devices is not None else jax.devices()
    if data == -1:
        assert len(devs) % model == 0, (len(devs), model)
        data = len(devs) // model
    n = data * model
    grid = np.asarray(devs[:n]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, small scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put every array leaf of a batch pytree with batch-dim sharding.

    Non-array leaves (e.g. the tuple of string keys) pass through on host.
    """
    sh = batch_sharding(mesh)

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)):
            return jax.device_put(x, sh)
        return x

    return jax.tree.map(put, batch, is_leaf=lambda x: isinstance(x, (np.ndarray, jax.Array)) or not isinstance(x, (tuple, list, dict)))


def tensor_constraint(mesh: Optional[Mesh]):
    """Returns constrain(x, spec) -> x for tensor-parallel activation
    sharding, or None when there is no model axis to use.

    The reference has no TP (single GPU, trainer.py:36); this is the
    TPU-native scaling extension: annotate the big frozen-encoder
    activations with a ('data', ..., 'model') PartitionSpec and let GSPMD
    propagate the channel sharding into the conv tower, inserting ICI
    collectives where needed (scaling-book recipe: pick a mesh, annotate,
    let XLA insert collectives)."""
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return None

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    return constrain


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-data-shard batch size; validates divisibility up front so the
    error is a config error, not an XLA sharding failure."""
    n = mesh.shape["data"]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-axis size {n}"
        )
    return global_batch // n
