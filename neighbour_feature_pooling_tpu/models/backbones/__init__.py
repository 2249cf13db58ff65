"""Flax backbones with timm-compatible geometry (NHWC)."""

from .mobilenetv3 import (  # noqa: F401
    BLOCK_OUT_CHANNELS,
    FEATURE_CHANNELS,
    MobileNetV3Large,
    hard_sigmoid,
    hard_swish,
    mobilenetv3_large_100,
)
from .resnet import ResNet, resnet18, resnet50  # noqa: F401
from .vit import ViT, tokens_to_map, vit_tiny_patch16_224  # noqa: F401
