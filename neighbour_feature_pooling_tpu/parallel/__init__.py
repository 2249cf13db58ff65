"""Mesh/sharding utilities for multi-chip and multi-host scaling."""

from .dist import (  # noqa: F401
    global_batch_from_local,
    initialize_distributed,
    is_multiprocess,
    local_batch_slice,
)
from .mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from .seed_parallel import (  # noqa: F401
    SeedParallelRunner,
    seed_parallel_mesh,
)
