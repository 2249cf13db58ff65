"""Mesh/sharding utilities for multi-chip scaling."""

from .mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
