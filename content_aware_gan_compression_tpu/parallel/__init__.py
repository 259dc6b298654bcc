"""Device-mesh parallelism. The reference's only parallelism is
single-process nn.DataParallel over 2-4 GPUs (reference train.py:521-525) +
dormant torch.distributed helpers (Miscellaneous/distributed.py). Here all of
it collapses into SPMD over a `jax.sharding.Mesh`: batch dims sharded on the
'data' axis over ICI, params replicated, gradient reductions inserted by XLA.
Multi-host (DCN) extends the same program via jax.distributed.initialize."""

from .mesh import (
    DATA_AXIS,
    initialize_multihost,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_stacked_batches,
    replicate,
    local_mesh_devices,
)

__all__ = [
    "DATA_AXIS",
    "initialize_multihost",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_stacked_batches",
    "replicate",
    "local_mesh_devices",
]
