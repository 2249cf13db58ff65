"""Device-mesh utilities: the TPU-native replacement for the reference's
single-device Lightning Trainer (``/root/reference/demo.py:404-412``).

The reference never distributes (SURVEY §2.6); here scaling is single-program
``jit`` over a ``jax.sharding.Mesh``: the batch is sharded along a 1-D
``data`` axis over ICI, parameters and optimizer state are replicated, and
XLA inserts the gradient all-reduce. No hand-written collectives are
required at this model scale; the mesh generalizes to >1-D layouts later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "data_sharding", "replicated_sharding",
           "shard_batch", "place_leaf"]


def place_leaf(x, sharding: "NamedSharding"):
    """Place one train-state leaf onto a mesh sharding.

    The single implementation behind ``tp.shard_state``,
    ``zero.shard_state_zero`` and ``Trainer._replicate_state``: non-array
    leaves pass through, already-placed arrays are returned as-is, and
    everything else goes through ``make_array_from_callback`` — which
    materializes only this process's addressable shards, so the same code
    path serves single-process meshes AND multi-host runs (where the mesh
    spans devices this process cannot address; restored checkpoints
    arrive as host numpy and must become global arrays again).
    """
    if not isinstance(x, (jax.Array, np.ndarray, jax.numpy.ndarray)):
        return x
    if isinstance(x, jax.Array):
        # equivalence, not equality: a jit/restore output can carry a
        # different-but-identical sharding object (e.g. P() vs
        # P(None, None)) and must not bounce through the host
        if x.sharding.is_equivalent_to(sharding, x.ndim):
            return x
        if not x.is_fully_addressable:
            # multi-host global array: reshard on-device (device_put
            # compiles a resharding program; np.asarray would need to
            # fetch shards this process cannot address)
            return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding: leading axis split across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
