"""Mesh construction and sharding helpers (data-parallel axis 'data').

Replaces every DataParallel call site in the reference (G, D, teacher,
inception, style-MLP subcalls — SURVEY.md section 2.2) with one idiom:
batch arrays live in NamedSharding(mesh, P('data')), params are replicated,
and jit/GSPMD inserts the psum/all-gathers over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def local_mesh_devices(n_devices: int | None = None):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return devs


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the local devices (or the given list)."""
    if devices is None:
        devices = local_mesh_devices(n_devices)
    return Mesh(np.array(devices), (DATA_AXIS,))


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host (DCN) bring-up: call once per host before building the
    mesh; jax.distributed wires the hosts and jax.devices() then spans the
    slice. The single-program SPMD steps need no other change — the same
    batch sharding stretches over all hosts' devices (the TPU-native
    replacement for the reference's never-activated torch.distributed
    helpers, Miscellaneous/distributed.py)."""
    import jax.distributed

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of batch-leading arrays with batch sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_stacked_batches(mesh: Mesh, tree):
    """device_put [K, B, ...] stacked-batch arrays sharded on the SECOND
    (batch) dim — the input layout of train.steps.make_multi_step."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
