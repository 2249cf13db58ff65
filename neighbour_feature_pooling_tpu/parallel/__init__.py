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
from .pp import (  # noqa: F401
    create_pp_mesh,
    make_pipeline_apply,
    make_vit_pipeline_forward,
    shard_stacked_params,
    stack_block_params,
)
from .zero import (  # noqa: F401
    ZERO_MODES,
    shard_state_zero,
    zero_spec,
    zero_state_shardings,
)
from .tp import (  # noqa: F401
    MODEL_AXIS_RULES,
    create_tp_mesh,
    has_model_axis,
    shard_state,
    spec_for_path,
    state_shardings,
)
