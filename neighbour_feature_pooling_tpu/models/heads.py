"""Texture-pooling head library (Flax, NHWC).

Composable heads covering the reference's full capability surface — both the
ACTIVE texture heads (``/root/reference/models/{NFP_Pooling,Fractal_Pooling,
Lacunarity_Pooling,deepten,radam_pooling}.py``) and the LEGACY ablation grid
(``/root/reference/models/{resnet18,mobilenetv3,vittiny,nfp_heads}.py``),
implemented once as parameterizable modules instead of 30 copy-pasted
classes.

Every head maps an NHWC feature map ``(B, H, W, C)`` to a pooled vector
``(B, F)``; classification fc layers live in the model zoo (``zoo.py``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    base_lacunarity,
    deepten_encode,
    gdcb_fractal_dim,
    nfp,
    num_neighbors,
)
from ..ops.radam import positional_encoding_2d, radam_alphas, radam_pool

Dtype = Any

__all__ = [
    "gap2d",
    "NFPPoolingHead",
    "FractalPoolingHead",
    "LacunarityPoolingHead",
    "DeepTENHead",
    "RADAMHead",
    "GAPMLPHead",
    "NFPConvOnlyHead",
    "NFPConvMLPHead",
    "GAPNFPConcatHead",
    "NFPHeadMLP",
    "NFPHeadNoConv",
    "MultiRadiusNFPHead",
    "SEGateHead",
    "SimilarityAwarePooling",
    "AttentionFusion",
    "AdaptiveFusionNFP",
    "NFPBottleneck",
    "PositionalEncoding2D",
    "NFPProject",
]


def gap2d(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pool an NHWC map to (B, C)."""
    return jnp.mean(x, axis=(1, 2))


class _ConvBNReLU(nn.Module):
    """1×1 conv + BN + ReLU compressor used throughout the legacy grid
    (e.g. ``resnet18.py:26-30``)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


# ---------------------------------------------------------------------------
# ACTIVE texture heads (texture_* variants)
# ---------------------------------------------------------------------------


class NFPPoolingHead(nn.Module):
    """``nfp_pooling`` fusion head (``/root/reference/models/NFP_Pooling.py:
    25-36``): ``GAP(x) ⊙ Dense_{N→C}(GAP(NFP(x)))``.

    The NFP+GAP composite runs as one fused Pallas kernel (``fuse_gap=True``),
    so the (B, N, H, W) texture map is never materialized. The reference
    hard-codes R=1/cosine/padding=1 (``NFP_Pooling.py:10-16``); here they are
    configurable (the CLI ``--similarity`` flag actually reaches this head —
    a documented fix of reference dead-wiring).
    """

    feature_dim: int
    radius: int = 1
    measure: str = "cosine"
    padding: Optional[int] = None  # default: = radius ("same")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.radius if self.padding is None else self.padding
        x_avg = gap2d(x)
        x_nfp = nfp(x, self.radius, self.measure, padding=pad, fuse_gap=True)
        x_nfp = nn.Dense(self.feature_dim, dtype=self.dtype,
                         name="nfp_proj")(x_nfp)
        return x_avg * x_nfp


class FractalPoolingHead(nn.Module):
    """``fractal_pooling`` head (``Fractal_Pooling.py:40-74``):
    residual ``sigmoid(BN(dropout(conv1x1(x)))) − sigmoid(x)``, then
    ``GAP(out) ⊙ GDCB(out)``."""

    feature_dim: int
    dropout_ratio: float = 0.6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = nn.sigmoid(x)
        out = nn.Conv(self.feature_dim, (1, 1), dtype=self.dtype,
                      name="conv1")(x)
        # Dropout2d = whole-channel dropout (Fractal_Pooling.py:57)
        out = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                         deterministic=not train)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn")(out)
        out = nn.sigmoid(out)
        out = out - identity
        return gap2d(out) * gdcb_fractal_dim(out)


class LacunarityPoolingHead(nn.Module):
    """``lacunarity_pooling`` head (``Lacunarity_Pooling.py:53-73``):
    ``L(x) ⊙ GAP(x)``."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        return base_lacunarity(x, eps=self.eps) * gap2d(x)


class DeepTENHead(nn.Module):
    """DeepTEN encoding + BatchNorm1d (``texture_pooling.py:468-483``):
    encode to (B, K·D), normalize; the zoo fc maps K·D → classes."""

    num_codes: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        std = 1.0 / (self.num_codes * c) ** 0.5
        codewords = self.param(
            "codewords",
            lambda k: jax.random.uniform(k, (self.num_codes, c),
                                         jnp.float32, -std, std))
        scale = self.param(
            "scale",
            lambda k: jax.random.uniform(k, (self.num_codes,), jnp.float32,
                                         -1.0, 0.0))
        e = deepten_encode(x.reshape(b, h * w, c), codewords, scale)
        e = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(e)
        return e


class RADAMHead(nn.Module):
    """RADAM pooling head (``texture_pooling.py:598-662``): frozen
    randomized-AE aggregation → (B, C). The encoder weights and positional
    encoding are deterministic constants (LCG + QR), not parameters — matching
    the reference, whose RAEs live outside the nn.Module parameter tree
    (``radam_pooling.py:36-41``)."""

    spatial_size: int
    in_channels: int
    m: int = 4
    pos_encoding: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        alphas = jnp.asarray(radam_alphas(self.m, self.in_channels))
        pe = None
        if self.pos_encoding:
            pe = jnp.asarray(
                positional_encoding_2d(self.in_channels, self.spatial_size,
                                       self.spatial_size)
                .reshape(self.in_channels, self.spatial_size ** 2))
        pooled = radam_pool(x, alphas, pe, spatial_size=self.spatial_size)
        return pooled[:, 0, :]  # (B, Q=1, C) -> (B, C)


# ---------------------------------------------------------------------------
# LEGACY ablation-grid heads
# ---------------------------------------------------------------------------


class GAPMLPHead(nn.Module):
    """``gap_mlp``: GAP gated by a sigmoid MLP (``resnet18.py:116-146``)."""

    feature_dim: int
    dropout_p: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = gap2d(x)
        y = nn.Dense(self.feature_dim // 2, dtype=self.dtype, name="mlp1")(g)
        y = nn.relu(y)
        y = nn.Dense(self.feature_dim, dtype=self.dtype, name="mlp2")(y)
        gated = g * nn.sigmoid(y)
        return nn.Dropout(self.dropout_p, deterministic=not train)(gated)


class NFPConvOnlyHead(nn.Module):
    """``nfp_conv_only``: NFP map → 1×1 conv+BN+ReLU → GAP
    (``resnet18.py:149-186``)."""

    bottleneck_dim: int = 512
    radius: int = 1
    measure: str = "cosine"
    padding: Optional[int] = None
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.radius if self.padding is None else self.padding
        m = nfp(x, self.radius, self.measure, padding=pad,
                stride=self.stride)
        m = _ConvBNReLU(self.bottleneck_dim, self.dtype, name="compress")(m, train)
        return gap2d(m)


class NFPConvMLPHead(nn.Module):
    """``nfp_conv_mlp``: NFP → compress → MLP-gated GAP
    (``resnet18.py:189-236``)."""

    bottleneck_dim: int = 512
    radius: int = 1
    measure: str = "cosine"
    padding: Optional[int] = None
    stride: int = 1
    dropout_p: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.radius if self.padding is None else self.padding
        m = nfp(x, self.radius, self.measure, padding=pad,
                stride=self.stride)
        m = _ConvBNReLU(self.bottleneck_dim, self.dtype, name="compress")(m, train)
        v = gap2d(m)
        w = nn.Dense(self.bottleneck_dim // 2, dtype=self.dtype, name="mlp1")(v)
        w = nn.relu(w)
        w = nn.Dense(self.bottleneck_dim, dtype=self.dtype, name="mlp2")(w)
        gated = v * nn.sigmoid(w)
        return nn.Dropout(self.dropout_p, deterministic=not train)(gated)


class GAPNFPConcatHead(nn.Module):
    """The four ``gap_nfp_{conv,noconv}_{mlp,nomlp}_concat`` variants
    (``resnet18.py:239-408``): GAP ∥ pooled-NFP (optionally conv-compressed),
    optionally gated by a sigmoid MLP, with dropout. Output dim is
    ``C + bottleneck_dim`` (conv) or ``C + N`` (noconv)."""

    use_conv: bool
    use_mlp: bool
    bottleneck_dim: int = 512
    radius: int = 1
    measure: str = "cosine"
    padding: Optional[int] = None
    dropout_p: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.radius if self.padding is None else self.padding
        gap_feat = gap2d(x)
        m = nfp(x, self.radius, self.measure, padding=pad)
        if self.use_conv:
            m = _ConvBNReLU(self.bottleneck_dim, self.dtype,
                            name="nfp_conv")(m, train)
        nfp_feat = gap2d(m)
        fused = jnp.concatenate([gap_feat, nfp_feat], axis=1)
        if self.use_mlp:
            w = nn.Dense(256, dtype=self.dtype, name="mlp1")(fused)
            w = nn.relu(w)
            w = nn.Dense(fused.shape[-1], dtype=self.dtype, name="mlp2")(w)
            fused = fused * nn.sigmoid(w)
        return nn.Dropout(self.dropout_p, deterministic=not train)(fused)


class NFPHeadMLP(nn.Module):
    """``NFPHead``: GAP ∥ compressed-NFP fused by a two-layer MLP → (B, bd)
    (``resnet18.py:7-44``, ``nfp_heads.py:11-46``). Parameter names carry the
    ``nfp_head`` prefix in the zoo so the freeze schedule can key on them
    (``Lightning_Wrapper.py:193-203``)."""

    bottleneck_dim: int = 512
    radius: int = 1
    measure: str = "cosine"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gap_vec = gap2d(x)
        m = nfp(x, self.radius, self.measure, padding=self.radius)
        m = _ConvBNReLU(self.bottleneck_dim, self.dtype, name="compress")(m, train)
        nfp_vec = gap2d(m)
        fused = jnp.concatenate([gap_vec, nfp_vec], axis=1)
        fused = nn.Dense(self.bottleneck_dim, dtype=self.dtype,
                         name="fusion_mlp1")(fused)
        fused = nn.relu(fused)
        fused = nn.Dense(self.bottleneck_dim, dtype=self.dtype,
                         name="fusion_mlp2")(fused)
        return fused


class NFPHeadNoConv(nn.Module):
    """``NFPHead_NoConv`` (``nfp_heads.py:50-77``): GAP ∥ GAP(NFP) → MLP.

    NOTE: the reference concatenates C + C assuming the NFP map has C
    channels; it actually has N = k²−1, so the MLP input is C + N here."""

    out_dim: int = 512
    radius: int = 1
    measure: str = "cosine"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gap_vec = gap2d(x)
        nfp_vec = nfp(x, self.radius, self.measure, padding=self.radius,
                      fuse_gap=True)
        fused = jnp.concatenate([gap_vec, nfp_vec], axis=1)
        fused = nn.Dense(self.out_dim, dtype=self.dtype, name="fusion_mlp1")(fused)
        fused = nn.relu(fused)
        fused = nn.Dense(self.out_dim, dtype=self.dtype, name="fusion_mlp2")(fused)
        return fused


class MultiRadiusNFPHead(nn.Module):
    """``MultiRadiusNFPHead`` (``nfp_heads.py:80-118``): NFP maps at multiple
    radii concatenated → compress → SE-gated residual fusion with GAP."""

    bottleneck_dim: int = 512
    radii: Sequence[int] = (1, 2)
    measure: str = "cosine"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gap_vec = gap2d(x)
        maps = [nfp(x, r, self.measure, padding=r) for r in self.radii]
        cat = jnp.concatenate(maps, axis=-1)
        cmp_ = _ConvBNReLU(self.bottleneck_dim, self.dtype,
                           name="compress")(cat, train)
        nfp_vec = gap2d(cmp_)
        se_in = jnp.concatenate([gap_vec, nfp_vec], axis=1)
        a = nn.Dense(se_in.shape[-1] // 2, dtype=self.dtype, name="se_gate1")(se_in)
        a = nn.relu(a)
        a = nn.Dense(1, dtype=self.dtype, name="se_gate2")(a)
        alpha = nn.sigmoid(a)
        return gap_vec + alpha * nfp_vec


class SEGateHead(nn.Module):
    """``se_gate`` fusion (``resnet18.py:49-84``): NFPHead + SE gate α,
    ``(1−α)·gap + α·nfp``, dropout."""

    bottleneck_dim: int = 512
    radius: int = 1
    measure: str = "cosine"
    dropout_p: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gap_feat = gap2d(x)
        nfp_feat = NFPHeadMLP(self.bottleneck_dim, self.radius, self.measure,
                              self.dtype, name="nfp_head")(x, train)
        fusion_in = jnp.concatenate([gap_feat, nfp_feat], axis=1)
        a = nn.Dense(256, dtype=self.dtype, name="se_gate1")(fusion_in)
        a = nn.relu(a)
        a = nn.Dense(1, dtype=self.dtype, name="se_gate2")(a)
        alpha = nn.sigmoid(a)
        fused = (1.0 - alpha) * gap_feat + alpha * nfp_feat
        return nn.Dropout(self.dropout_p, deterministic=not train)(fused)


class SimilarityAwarePooling(nn.Module):
    """``SimilarityAwarePooling`` (``nfp_heads.py:204-232``): NFP map →
    1×1-conv attention logits → spatial softmax → weighted sum → (B, N)."""

    radius: int = 1
    measure: str = "cosine"
    padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = nfp(x, self.radius, self.measure, padding=self.padding)
        att = nn.Conv(1, (1, 1), dtype=self.dtype, name="att_proj")(m)
        b, h, w, _ = att.shape
        att = jax.nn.softmax(att.reshape(b, h * w, 1), axis=1)
        return jnp.sum(m.reshape(b, h * w, -1) * att, axis=1)


class AttentionFusion(nn.Module):
    """``AttentionFusion`` (``nfp_heads.py:137-156``): project both vectors,
    softmax a 2-way gate, convex-combine."""

    fusion_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, gap_vec, nfp_vec):
        gp = nn.Dense(self.fusion_dim, dtype=self.dtype, name="gap_proj")(gap_vec)
        np_ = nn.Dense(self.fusion_dim, dtype=self.dtype, name="nfp_proj")(nfp_vec)
        g = jnp.concatenate([gp, np_], axis=1)
        g = nn.Dense(128, dtype=self.dtype, name="gate1")(g)
        g = nn.relu(g)
        g = nn.Dense(2, dtype=self.dtype, name="gate2")(g)
        w = jax.nn.softmax(g, axis=1)
        return w[:, :1] * gp + w[:, 1:] * np_


class AdaptiveFusionNFP(nn.Module):
    """``AdaptiveFusionNFP`` (``nfp_heads.py:283-332``): GAP + compressed-NFP
    fused by an SE-style gate — ``gap + α·nfp`` — with dropout."""

    bottleneck_dim: int = 512
    radius: int = 1
    measure: str = "cosine"
    dropout_p: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gap_feat = gap2d(x)
        m = nfp(x, self.radius, self.measure, padding=self.radius)
        m = _ConvBNReLU(self.bottleneck_dim, self.dtype,
                        name="compress")(m, train)
        nfp_feat = gap2d(m)
        fusion_in = jnp.concatenate([gap_feat, nfp_feat], axis=1)
        a = nn.Dense(fusion_in.shape[-1] // 2, dtype=self.dtype,
                     name="fusion_gate1")(fusion_in)
        a = nn.relu(a)
        a = nn.Dense(1, dtype=self.dtype, name="fusion_gate2")(a)
        alpha = nn.sigmoid(a)
        fused = gap_feat + alpha * nfp_feat
        return nn.Dropout(self.dropout_p, deterministic=not train)(fused)


class PositionalEncoding2D(nn.Module):
    """Additive 2-D sin/cos positional encoding for NHWC maps
    (``nfp_heads.py:121-134``: even channels sin over rows, odd channels cos
    over columns — a distinct layout from the RADAM encoding in
    ``ops/radam.py``)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pe = np.zeros((h, w, c), np.float32)
        y_pos = np.arange(h, dtype=np.float32)[:, None]
        x_pos = np.arange(w, dtype=np.float32)[None, :]
        div = np.exp(np.arange(0, c, 2, dtype=np.float32)
                     * (-np.log(10000.0) / c))
        pe[:, :, 0::2] = np.sin(y_pos[..., None] * div)
        pe[:, :, 1::2] = np.cos(x_pos[..., None] * div[: c // 2])
        return x + jnp.asarray(pe)[None]


class NFPBottleneck(nn.Module):
    """Residual bottleneck with NFP inside (``nfp_heads.py:234-278``):
    1×1 reduce → NFP (padding 0, spatial shrinks by 2R) → 1×1 expand + BN,
    identity avg-pooled to match spatial size and 1×1-projected to match
    channels, ReLU(residual sum)."""

    out_channels: int
    stride: int = 1
    radius: int = 1
    measure: str = "cosine"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        mid = self.out_channels // 4
        identity = x
        y = nn.Conv(mid, (1, 1), strides=self.stride, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nfp(y, self.radius, self.measure, padding=0)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        # spatial match: VALID avg-pool with kernel k = ΔHW + 1 (nfp_heads.py:261-265)
        if identity.shape[1] != y.shape[1]:
            k = identity.shape[1] - y.shape[1] + 1
            identity = nn.avg_pool(identity, (k, k), strides=(1, 1))
        if identity.shape[-1] != self.out_channels:
            identity = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(identity)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class NFPProject(nn.Module):
    """``nfp_insert`` projection (``mobilenetv3.py:344-353``): the in-backbone
    NFP map (N channels) is projected back to the block's channel count with
    1×1 conv + BN + ReLU so the remaining stages can consume it."""

    out_channels: int
    radius: int = 1
    measure: str = "cosine"
    padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = nfp(x, self.radius, self.measure, padding=self.padding)
        return _ConvBNReLU(self.out_channels, self.dtype,
                           name="nfp_proj")(m, train)
