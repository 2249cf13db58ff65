"""Flax ViT-Tiny/16 backbone (timm geometry, NHWC input).

Equivalent to the reference's
``timm.create_model('vit_tiny_patch16_224', num_classes=0, global_pool='')``
``forward_features``: 16×16 conv patch embed → prepend CLS → add learned
position embedding → 12 pre-norm transformer blocks (dim 192, 3 heads,
MLP ratio 4, GELU, LN eps 1e-6) → final LN → ``(B, 197, 192)`` tokens.

The reference models strip the CLS token and reshape the 196 patch tokens to
a (14, 14, 192) map (``/root/reference/models/texture_pooling.py:124-130``);
that reshaping lives in the model zoo (``tokens_to_map``), not here.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ViT", "vit_tiny_patch16_224", "tokens_to_map"]

Dtype = Any


class MlpBlock(nn.Module):
    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(d, dtype=self.dtype, name="fc2")(x)
        return x


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=d, out_features=d,
            dtype=self.dtype, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MlpBlock(int(d * self.mlp_ratio), self.dtype, name="mlp")(y)
        return x + y


class ViT(nn.Module):
    """Vision Transformer feature extractor returning ``(B, 1+N, D)`` tokens."""

    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    num_patches: int = 196  # (224/16)²
    dtype: Dtype = jnp.float32
    remat: bool = False  # checkpoint each encoder block

    @property
    def num_features(self) -> int:
        return self.embed_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=p, padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, -1, self.embed_dim)  # (B, N, D)
        n = x.shape[1]

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed",
                         nn.initializers.normal(stddev=0.02),
                         (1, 1 + self.num_patches, self.embed_dim))
        if n != self.num_patches:
            # non-224 input: bilinearly resample the 2-D patch grid of the
            # position embedding (timm's resample_abs_pos_embed behavior)
            g0 = int(round(self.num_patches ** 0.5))
            g1 = int(round(n ** 0.5))
            grid = pos[:, 1:].reshape(1, g0, g0, self.embed_dim)
            grid = jax.image.resize(grid, (1, g1, g1, self.embed_dim),
                                    "bilinear")
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, n, self.embed_dim)], axis=1)
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (b, 1, 1)), x],
                            axis=1)
        x = x + pos.astype(x.dtype)

        block_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        for i in range(self.depth):
            x = block_cls(self.num_heads, self.mlp_ratio, self.dtype,
                          name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x  # (B, 1+N, D)


def tokens_to_map(tokens: jnp.ndarray) -> jnp.ndarray:
    """Strip CLS and reshape patch tokens to an NHWC map
    (``texture_pooling.py:124-130``): (B, 1+N, D) → (B, √N, √N, D)."""
    patches = tokens[:, 1:, :]
    b, n, d = patches.shape
    h = int(round(n ** 0.5))
    if h * h != n:
        raise ValueError(f"token count {n} is not a perfect square")
    return patches.reshape(b, h, h, d)


def vit_tiny_patch16_224(dtype: Dtype = jnp.float32) -> ViT:
    return ViT(dtype=dtype)
