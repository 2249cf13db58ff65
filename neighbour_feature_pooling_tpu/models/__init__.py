"""Model zoo: Flax backbones × texture-pooling heads."""

from . import backbones, heads  # noqa: F401
from .torch_init import torch_default_init  # noqa: F401
from .zoo import (  # noqa: F401
    MODEL_VARIANTS,
    NUM_FTRS,
    TextureModel,
    canonical_model_type,
    get_model,
)
