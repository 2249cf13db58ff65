"""TPU-native texture pooling ops.

The five pooling families of the reference framework, re-designed as fused
XLA/Pallas ops:

* ``nfp``           — Neighborhood Feature Pooling (fused Pallas kernel with a
                      pure-XLA oracle/backward path).
* ``fractal``       — differential-box-count fractal dimension (GDCB).
* ``lacunarity``    — normalized second-moment lacunarity.
* ``deepten``       — DeepTEN learnable codebook residual encoding.
* ``radam``         — RADAM randomized-autoencoder aggregation (batched/vmap).
"""

from .measures import (  # noqa: F401
    MEASURES,
    MEASURE_NAMES,
    Measure,
    MeasureConfig,
    canonical_measure_name,
    get_measure,
)
from .neighborhood import (  # noqa: F401
    neighbor_offsets,
    nfp_output_size,
    nfp_reference,
    num_neighbors,
    pad_spatial,
)
from .nfp_pallas import nfp, nfp_pallas  # noqa: F401
from .fractal import gdcb_fractal_dim  # noqa: F401
from .lacunarity import base_lacunarity  # noqa: F401
from .deepten import deepten_encode, deepten_init  # noqa: F401
from .radam import (  # noqa: F401
    lcg_sequence,
    lcg_weights,
    make_orthogonal,
    positional_encoding_2d,
    radam_alphas,
    radam_pool,
)
