"""Device mesh and sharding for scale-out.

The reference's "distributed" layer was 10 OS processes x 20 threads on one
box talking to a GPU server over pipes (SURVEY.md §2.5). The TPU-native
equivalent is dramatically simpler: self-play games and training batches
are *data* — shard their leading axis over a 1-D ``('data',)`` mesh and
let XLA insert the collectives. Model parameters stay replicated (the net
is ~65k-458k params; tensor/pipeline parallelism would be pure overhead
for this workload, as SURVEY.md §2.5 notes — DP is the only warranted
strategy, applied to both actors and learner).

Works identically on one chip (trivial mesh), a multi-chip host, a
multi-host slice (after ``jax.distributed.initialize``), and on N virtual
CPU devices for tests (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Threefry partitioning keeps on-device RNG (Dirichlet noise, opening
# sampling) shardable without gathering the whole batch to one device.
jax.config.update("jax_threefry_partitionable", True)

DATA_AXIS = "data"


def make_mesh(shape: Optional[Tuple[int, ...]] = None, devices=None) -> Mesh:
    """1-D data mesh over all (or the first ``prod(shape)``) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    mesh_devices = np.array(devices[:n]).reshape(shape)
    return Mesh(mesh_devices, (DATA_AXIS,) * len(shape))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for game/batch arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def constrain_data(tree, mesh: Mesh):
    """Constrain every array leaf's leading axis to the data axis (inside
    jit; the GSPMD partitioner propagates it through the program)."""

    def leaf(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(leaf, tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place a host pytree with leading batch axes onto the mesh, sharded
    over ``data``."""
    sharding = data_sharding(mesh)

    def put(x):
        spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (model params, optimiser state) over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: call once per process before creating meshes
    (the ``jax.distributed.initialize`` + coordinator pattern). No-op if
    already initialised."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
