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


class _ProjParams(nn.Module):
    """Parameter holder replicating one flax DenseGeneral's tree
    (``kernel``/``bias``) without its computation.

    Init matches DenseGeneral exactly: lecun_normal over the kernel
    FLATTENED to (fan_in, fan_out) and reshaped — applying lecun_normal
    directly to the 3-D (D, H, Dh) shape would compute fan_in = H·D and
    start attention logits with num_heads× too little variance."""

    kernel_shape: tuple
    bias_shape: tuple
    fan_in: int

    @nn.compact
    def __call__(self):
        base = nn.initializers.lecun_normal()
        fan_out = 1
        for s in self.kernel_shape:
            fan_out *= s
        fan_out //= self.fan_in

        def kernel_init(key, shape, dtype=jnp.float32):
            return base(key, (self.fan_in, fan_out), dtype).reshape(shape)

        k = self.param("kernel", kernel_init, self.kernel_shape)
        b = self.param("bias", nn.initializers.zeros, self.bias_shape)
        return k, b


class FusedAttention(nn.Module):
    """Multi-head self-attention with a fused QKV projection.

    Parameter tree is IDENTICAL to ``nn.MultiHeadDotProductAttention``
    (``query``/``key``/``value`` kernels (D, H, Dh) + ``out`` (H, Dh, D),
    biases likewise), so ported timm weights and existing checkpoints load
    unchanged. The computation differs: the three projections run as one
    (D, 3D) matmul and the head split/merge are plain reshapes — profiling
    showed flax's per-projection DenseGeneral structure surrounds the
    attention matmuls with ~140 small layout copies per ViT-Tiny train
    step (~4 ms of "data formatting", 19% of the step; PARITY.md).
    Semantics match flax/timm: queries scaled by Dh^-1/2 before QKᵀ.
    """

    num_heads: int
    dtype: Dtype = jnp.float32

    def proj(self, x, w, b, tag="qkv"):
        """One attention projection (QKV-fused or output) as a plain
        matmul. A real method (not inlined) so ``nn.intercept_methods``
        consumers — the int8 PTQ tier (``quant.py``) — can swap in a
        quantized GEMM without duplicating the attention body. ``tag``
        disambiguates the two calls per block for calibration keys."""
        return x @ w.astype(self.dtype) + b.astype(self.dtype)

    @nn.compact
    def __call__(self, x, n_valid: int = 0):
        b, t, d = x.shape
        h = self.num_heads
        hd = d // h
        wq, bq = _ProjParams((d, h, hd), (h, hd), d, name="query")()
        wk, bk = _ProjParams((d, h, hd), (h, hd), d, name="key")()
        wv, bv = _ProjParams((d, h, hd), (h, hd), d, name="value")()
        wo, bo = _ProjParams((h, hd, d), (d,), h * hd, name="out")()

        wqkv = jnp.concatenate(
            [w.reshape(d, d) for w in (wq, wk, wv)], axis=1)
        bqkv = jnp.concatenate([bb.reshape(d) for bb in (bq, bk, bv)])
        qkv = self.proj(x, wqkv, bqkv, tag="qkv")
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, hd) * (float(hd) ** -0.5)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if 0 < n_valid < t:
            # trailing key slots are sequence padding: exclude from softmax
            mask = (jnp.arange(t) < n_valid).reshape(1, 1, 1, t)
            logits = jnp.where(mask, logits, jnp.asarray(-1e9, logits.dtype))
        attn = jax.nn.softmax(logits, axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return self.proj(y, wo.reshape(d, d), bo, tag="out")


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32
    fused_attn: bool = True

    @nn.compact
    def __call__(self, x, n_valid: int = 0):
        # n_valid > 0: trailing tokens are padding (masked in attention);
        # a static python int, so the mask branch stages out of the trace
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.fused_attn:
            y = FusedAttention(num_heads=self.num_heads, dtype=self.dtype,
                               name="attn")(y, n_valid)
        else:
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=d, out_features=d,
                dtype=self.dtype, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MlpBlock(int(d * self.mlp_ratio), self.dtype, name="mlp")(y)
        return x + y


class ViT(nn.Module):
    """Vision Transformer feature extractor returning ``(B, 1+N, D)`` tokens.

    Structured as ``embed`` → ``encode`` → ``finalize`` (setup-style) so the
    pipeline-parallel runner (``parallel/pp.py``) can run the embedding and
    final norm replicated while the homogeneous encoder blocks shard over
    pipeline stages — all three reuse exactly this module's parameters.
    """

    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    num_patches: int = 196  # (224/16)²
    dtype: Dtype = jnp.float32
    remat: bool = False  # checkpoint each encoder block
    #: fused-QKV attention (FusedAttention; same param tree as the flax
    #: module, fewer layout copies — measured faster on TPU)
    fused_attn: bool = True
    #: >1: zero-pad the token sequence up to the next multiple (197 → 200
    #: at 224px) for sublane-aligned attention shapes — pad keys masked in
    #: softmax, pad rows stripped before returning; requires fused_attn.
    #: Measured on v5e: align 8 wins ~2%, padding all the way to 256 LOSES
    #: ~20% (extra attention FLOPs outweigh lane alignment). 0/1 disables.
    seq_align: int = 8

    @property
    def num_features(self) -> int:
        return self.embed_dim

    def setup(self):
        self._patch = nn.Conv(self.embed_dim,
                              (self.patch_size, self.patch_size),
                              strides=self.patch_size, padding="VALID",
                              dtype=self.dtype, name="patch_embed")
        self.cls_token = self.param("cls_token", nn.initializers.zeros,
                                    (1, 1, self.embed_dim))
        self.pos_embed = self.param("pos_embed",
                                    nn.initializers.normal(stddev=0.02),
                                    (1, 1 + self.num_patches, self.embed_dim))
        block_cls = (nn.remat(EncoderBlock, static_argnums=(2,))
                     if self.remat else EncoderBlock)
        self._blocks = [
            block_cls(self.num_heads, self.mlp_ratio, self.dtype,
                      self.fused_attn, name=f"block_{i}")
            for i in range(self.depth)
        ]
        self._norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  name="norm")

    def embed(self, x):
        """Patch embed + CLS + position embedding (+ alignment padding):
        ``(B, H, W, C) -> ((B, T, D), n_valid)`` where ``n_valid > 0`` marks
        trailing padded token slots."""
        b = x.shape[0]
        x = self._patch(x)
        x = x.reshape(b, -1, self.embed_dim)  # (B, N, D)
        n = x.shape[1]
        pos = self.pos_embed
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
        x = jnp.concatenate(
            [jnp.tile(self.cls_token.astype(x.dtype), (b, 1, 1)), x], axis=1)
        x = x + pos.astype(x.dtype)

        n_valid = 0
        t = x.shape[1]
        if self.fused_attn and self.seq_align > 1 and t % self.seq_align:
            target = -(-t // self.seq_align) * self.seq_align
            n_valid = t
            x = jnp.pad(x, ((0, 0), (0, target - t), (0, 0)))
        return x, n_valid

    def encode(self, x, n_valid: int = 0):
        """The ``depth`` homogeneous transformer blocks."""
        for blk in self._blocks:
            x = blk(x, n_valid)
        return x

    def finalize(self, x, n_valid: int = 0):
        """Final LayerNorm; strips the alignment padding rows."""
        x = self._norm(x)
        if n_valid:
            x = x[:, :n_valid]
        return x

    def __call__(self, x, train: bool = False):
        x, n_valid = self.embed(x)
        x = self.encode(x, n_valid)
        return self.finalize(x, n_valid)  # (B, 1+N, D)


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
