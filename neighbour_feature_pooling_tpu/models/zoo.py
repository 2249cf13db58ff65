"""Model zoo: backbone × texture-head composition and registry.

One composable ``TextureModel`` replaces the reference's ~30 copy-pasted
classes. The variant keys mirror the reference registry
(``/root/reference/demo.py:148-215``), including the LEGACY ablation grid that
is commented out there (``demo.py:153-161`` etc.) — its classes exist in
``models/{resnet18,mobilenetv3,vittiny}.py`` and define the paper's capability
surface.

Variant → structure map (ACTIVE set, ``texture_pooling.py``):

=======================  =====================================================
gap_only                 backbone → GAP → fc
texture_fractal          backbone → FractalPoolingHead → fc
texture_nfp              backbone → NFPPoolingHead → fc
texture_lacunarity       backbone → LacunarityPoolingHead → fc
texture_deepten          backbone → DeepTEN encode + BN → fc(K·D)
texture_radam            backbone → RADAMHead → fc
texture_nfp_intermediate mobilenetv3 stem→blocks[0..i] tap → NFPPoolingHead → fc
mid_nfp                  mobilenetv3 features tap i → NFP→GAP→Dense(1280);
                         ⊙ GAP(conv_head(last)) → fc
multi_stage_nfp          NFP on all 5 taps → concat(B,40) → Dense(1280);
                         ⊙ GAP(conv_head(last)) → fc
=======================  =====================================================

LEGACY set (``resnet18.py``/``mobilenetv3.py``/``vittiny.py``): gap_mlp,
nfp_conv_only, nfp_conv_mlp, gap_nfp_{conv,noconv}_{nomlp,mlp}_concat,
nfp_at_layer (resnet18), nfp_insert (mobilenetv3), se_gate (resnet18).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbones import (
    BLOCK_OUT_CHANNELS,
    FEATURE_CHANNELS,
    MobileNetV3Large,
    resnet18,
    resnet50,
    tokens_to_map,
    vit_tiny_patch16_224,
)
from .heads import (
    AdaptiveFusionNFP,
    DeepTENHead,
    FractalPoolingHead,
    GAPMLPHead,
    GAPNFPConcatHead,
    LacunarityPoolingHead,
    MultiRadiusNFPHead,
    NFPConvMLPHead,
    NFPConvOnlyHead,
    NFPHeadMLP,
    NFPPoolingHead,
    NFPProject,
    RADAMHead,
    SEGateHead,
    SimilarityAwarePooling,
    gap2d,
)
from ..ops import nfp

Dtype = Any

__all__ = ["TextureModel", "get_model", "MODEL_VARIANTS", "NUM_FTRS",
           "canonical_model_type"]

#: feature dims (``demo.py:271-278``)
NUM_FTRS = {
    "resnet18": 512,
    "resnet50": 2048,
    "mobilenetv3": 960,
    "vittiny": 192,
}

_MODEL_TYPE_ALIASES = {
    "mobilenetv3_large_100": "mobilenetv3",
    "vit_tiny_patch16_224": "vittiny",
}

_COMMON_VARIANTS = (
    "gap_only", "texture_fractal", "texture_nfp", "texture_lacunarity",
    "texture_deepten", "texture_radam",
)
_LEGACY_GRID = (
    "gap_mlp", "nfp_conv_only", "nfp_conv_mlp",
    "gap_nfp_conv_nomlp_concat", "gap_nfp_noconv_nomlp_concat",
    "gap_nfp_conv_mlp_concat", "gap_nfp_noconv_mlp_concat",
    # backbone -> NFPHead(MLP fusion) -> fc: the *WithNFPHead models
    # (vittiny_models_new.py:9-68) and the NFPHead building block
    # (nfp_heads.py:11-46), as a variant for every backbone
    "nfp_head", "multi_radius_nfp", "similarity_aware_pooling",
    "adaptive_fusion_nfp",
)

#: allowed variants per model type (``demo.py:148-215`` incl. commented grid)
MODEL_VARIANTS: Dict[str, Tuple[str, ...]] = {
    "resnet18": _COMMON_VARIANTS + _LEGACY_GRID + ("nfp_at_layer", "se_gate"),
    "resnet50": _COMMON_VARIANTS,
    "mobilenetv3": _COMMON_VARIANTS + _LEGACY_GRID + (
        "nfp_insert", "texture_nfp_intermediate", "mid_nfp", "multi_stage_nfp"),
    "vittiny": _COMMON_VARIANTS + _LEGACY_GRID,
}


def canonical_model_type(model_type: str) -> str:
    mt = model_type.lower()
    return _MODEL_TYPE_ALIASES.get(mt, mt)


class TextureModel(nn.Module):
    """Backbone × texture-pooling-head classifier.

    ``__call__(x, train)`` expects NHWC images and returns logits
    ``(B, num_classes)``. Dropout-using variants need a ``dropout`` rng when
    ``train=True``.
    """

    model_type: str
    model_variant: str
    num_classes: int
    num_input_channels: int = 3
    # NFP hyper-parameters (CLI surface, demo.py:440-475)
    measure: str = "cosine"
    nfp_radius: int = 1
    nfp_padding: int = 0
    nfp_stride: int = 1
    nfp_layer_idx: int = 3
    nfp_insert_idx: int = 1
    nfp_intermediate_layer_idx: Optional[int] = 1
    nfp_mid_layer_idx: int = 1
    num_codes: int = 32
    radam_m: int = 4
    dtype: Dtype = jnp.float32
    remat: bool = False  # checkpoint backbone blocks (larger train batches)
    #: ResNets only: 'full' (recompute whole blocks) or 'conv_out' (save
    #: conv outputs, recompute BN/ReLU) — see backbones/resnet.ResNet
    remat_policy: str = "full"
    #: ResNet stems only: compute the 7×7/s2 conv via space-to-depth (same
    #: arithmetic, better MXU mapping; see backbones/resnet._StemConvS2D)
    stem_s2d: bool = False
    #: ResNet stems only: fused BN→ReLU→maxpool backward
    #: (backbones/resnet._FusedStemTail, ops/stem_pool.py)
    stem_fused: bool = False

    def _backbone(self):
        from .backbones.resnet import ResNet
        from .backbones.vit import ViT

        mt = canonical_model_type(self.model_type)
        if mt == "resnet18":
            return ResNet(block="basic", layers=(2, 2, 2, 2),
                          dtype=self.dtype, remat=self.remat,
                          remat_policy=self.remat_policy,
                          stem_s2d=self.stem_s2d,
                          stem_fused=self.stem_fused, name="backbone")
        if mt == "resnet50":
            return ResNet(block="bottleneck", layers=(3, 4, 6, 3),
                          dtype=self.dtype, remat=self.remat,
                          remat_policy=self.remat_policy,
                          stem_s2d=self.stem_s2d,
                          stem_fused=self.stem_fused, name="backbone")
        if mt == "mobilenetv3":
            return MobileNetV3Large(dtype=self.dtype, remat=self.remat,
                                    name="backbone")
        if mt == "vittiny":
            return ViT(dtype=self.dtype, remat=self.remat, name="backbone")
        raise ValueError(f"Unknown model_type: {self.model_type}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        mt = canonical_model_type(self.model_type)
        variant = self.model_variant.lower()
        if variant not in MODEL_VARIANTS[mt]:
            raise ValueError(
                f"Unknown model_variant {variant!r} for {mt}; "
                f"allowed: {MODEL_VARIANTS[mt]}")
        feat_dim = NUM_FTRS[mt]
        backbone = self._backbone()

        def fc(_dim=None):
            # input dim is inferred by nn.Dense; kept nullary-compatible
            return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")

        # ---- mobilenetv3 structural variants need special backbone modes ----
        if variant == "texture_nfp_intermediate":
            # stem→blocks[0..i] tap → NFPPoolingHead(in_ch) → fc(in_ch)
            # (texture_pooling.py:332-406). layer_idx=None is broken in the
            # reference (2-D tensor into AdaptiveAvgPool2d); we tap the full
            # 960 feature map instead (documented divergence).
            idx = self.nfp_intermediate_layer_idx
            if idx is None:
                fmap = backbone(x, train, mode="full")
                in_ch = 960
            else:
                fmap = backbone(x, train, stop_after_block=idx)
                in_ch = BLOCK_OUT_CHANNELS[idx]
            pooled = NFPPoolingHead(in_ch, self.nfp_radius, self.measure,
                                    dtype=self.dtype, name="pool")(fmap, train)
            return fc(in_ch)(pooled)

        if variant == "mid_nfp":
            # (texture_pooling.py:273-330)
            feats, head = backbone(x, train, mode="features+head")
            sim_vec = nfp(feats[self.nfp_mid_layer_idx], 1, "cosine",
                          padding=1, fuse_gap=True)           # (B, 8)
            x_mid = nn.Dense(backbone.head_features, dtype=self.dtype,
                             name="nfp_mid_proj")(sim_vec)    # (B, 1280)
            x_avg = gap2d(head)                               # (B, 1280)
            return fc(backbone.head_features)(x_avg * x_mid)

        if variant == "multi_stage_nfp":
            # (texture_pooling.py:211-268)
            feats, head = backbone(x, train, mode="features+head")
            vecs = [nfp(f, 1, "cosine", padding=1, fuse_gap=True)
                    for f in feats]                           # 5 × (B, 8)
            v = jnp.concatenate(vecs, axis=1)                 # (B, 40)
            x_mid = nn.Dense(backbone.head_features, dtype=self.dtype,
                             name="nfp_proj")(v)
            x_avg = gap2d(head)
            return fc(backbone.head_features)(x_avg * x_mid)

        if variant == "nfp_insert":
            # NFP inserted in-backbone after blocks[i]
            # (models/mobilenetv3.py:306-377)
            idx = self.nfp_insert_idx
            fmap = backbone(x, train, stop_after_block=idx)
            fmap = NFPProject(BLOCK_OUT_CHANNELS[idx], self.nfp_radius,
                              self.measure, padding=self.nfp_padding,
                              dtype=self.dtype, name="nfp_insert")(fmap, train)
            fmap = backbone(fmap, train, mode="head", start_at_block=idx + 1)
            return fc(backbone.head_features)(gap2d(fmap))

        if variant == "nfp_at_layer":
            # resnet18: NFP on the output of layer{1..4}
            # (models/resnet18.py:410-468)
            stages = backbone(x, train, return_stages=True)
            tap = stages[self.nfp_layer_idx]
            head = NFPConvOnlyHead(
                bottleneck_dim=tap.shape[-1], radius=self.nfp_radius,
                measure=self.measure, padding=self.nfp_padding,
                dtype=self.dtype, name="nfp_at_layer")
            return fc(tap.shape[-1])(head(tap, train))

        # ---- all remaining variants consume the standard feature map ----
        if mt == "vittiny":
            fmap = tokens_to_map(backbone(x, train))
        else:
            fmap = backbone(x, train)

        if variant == "gap_only":
            return fc(feat_dim)(gap2d(fmap))
        if variant == "texture_nfp":
            pooled = NFPPoolingHead(feat_dim, self.nfp_radius, self.measure,
                                    dtype=self.dtype, name="pool")(fmap, train)
            return fc(feat_dim)(pooled)
        if variant == "texture_fractal":
            pooled = FractalPoolingHead(feat_dim, dtype=self.dtype,
                                        name="pool")(fmap, train)
            return fc(feat_dim)(pooled)
        if variant == "texture_lacunarity":
            pooled = LacunarityPoolingHead(name="pool")(fmap, train)
            return fc(feat_dim)(pooled)
        if variant == "texture_deepten":
            enc = DeepTENHead(self.num_codes, dtype=self.dtype,
                              name="encoding")(fmap, train)
            return fc(self.num_codes * feat_dim)(enc)
        if variant == "texture_radam":
            # spatial_size 7 (CNNs) / 14 (ViT) as hard-coded at
            # texture_pooling.py:605,621,637,656
            ss = 14 if mt == "vittiny" else 7
            pooled = RADAMHead(ss, feat_dim, self.radam_m, name="pool")(fmap, train)
            return fc(feat_dim)(pooled)

        # ---- legacy grid ----
        if variant == "gap_mlp":
            return fc(feat_dim)(GAPMLPHead(feat_dim, dtype=self.dtype,
                                           name="head")(fmap, train))
        if variant == "nfp_conv_only":
            return fc(512)(NFPConvOnlyHead(
                512, self.nfp_radius, self.measure, padding=self.nfp_padding,
                stride=self.nfp_stride, dtype=self.dtype,
                name="head")(fmap, train))
        if variant == "nfp_conv_mlp":
            return fc(512)(NFPConvMLPHead(
                512, self.nfp_radius, self.measure, padding=self.nfp_padding,
                stride=self.nfp_stride, dtype=self.dtype,
                name="head")(fmap, train))
        if variant.startswith("gap_nfp_"):
            use_conv = "noconv" not in variant
            use_mlp = "nomlp" not in variant
            pooled = GAPNFPConcatHead(
                use_conv=use_conv, use_mlp=use_mlp, radius=self.nfp_radius,
                measure=self.measure, dtype=self.dtype,
                name="head")(fmap, train)
            return fc(pooled.shape[-1])(pooled)
        if variant == "se_gate":
            return fc(feat_dim)(SEGateHead(
                512, self.nfp_radius, self.measure, dtype=self.dtype,
                name="head")(fmap, train))
        if variant == "nfp_head":
            # param path contains "nfp_head" so the freeze schedule applies
            pooled = NFPHeadMLP(512, self.nfp_radius, self.measure,
                                self.dtype, name="nfp_head")(fmap, train)
            return fc(512)(pooled)
        if variant == "multi_radius_nfp":
            # bottleneck must equal C for the SE-gated residual fusion
            # (the reference head assumes in_c == 512, nfp_heads.py:117)
            pooled = MultiRadiusNFPHead(
                feat_dim, measure=self.measure, dtype=self.dtype,
                name="head")(fmap, train)
            return fc(pooled.shape[-1])(pooled)
        if variant == "similarity_aware_pooling":
            pooled = SimilarityAwarePooling(
                self.nfp_radius, self.measure, padding=self.nfp_padding,
                dtype=self.dtype, name="head")(fmap, train)
            return fc(pooled.shape[-1])(pooled)
        if variant == "adaptive_fusion_nfp":
            # bottleneck = C so gap + α·nfp is dimensionally valid for
            # every backbone (the reference head assumes in_channels=512)
            pooled = AdaptiveFusionNFP(
                feat_dim, self.nfp_radius, self.measure, dtype=self.dtype,
                name="head")(fmap, train)
            return fc(feat_dim)(pooled)
        raise ValueError(f"Unhandled variant {variant!r}")


def get_model(model_type: str, model_variant: str, num_classes: int,
              **kwargs) -> TextureModel:
    """Registry lookup mirroring ``demo.py:148-215``."""
    mt = canonical_model_type(model_type)
    if mt not in MODEL_VARIANTS:
        raise ValueError(f"Unknown model_type: {model_type}")
    mv = model_variant.lower()
    if mv not in MODEL_VARIANTS[mt]:
        raise ValueError(
            f"Unknown model_variant {model_variant!r} for {model_type}; "
            f"allowed: {MODEL_VARIANTS[mt]}")
    return TextureModel(model_type=mt, model_variant=mv,
                        num_classes=num_classes, **kwargs)
