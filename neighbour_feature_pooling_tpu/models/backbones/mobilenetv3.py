"""Flax MobileNetV3-Large-100 backbone (timm geometry, NHWC).

Equivalent to the reference's
``timm.create_model('mobilenetv3_large_100', num_classes=0, global_pool='')``:

* ``mode='full'`` → (B, 7, 7, 960) after the 7 block stages (timm places the
  final 1×1 ConvBnAct(960) as ``blocks[6]``) — ``forward_features``;
* ``mode='features'`` → the ``features_only=True`` taps at reductions
  {2,4,8,16,32} with channels (16, 24, 40, 112, 960), consumed by
  ``MobileNetV3_MultiStageNFP`` (``/root/reference/models/texture_pooling.py:
  211-268``);
* ``mode='head'`` → conv_head (1×1 960→1280) + hardswish applied
  (``texture_pooling.py:216-217``);
* ``mode='features+head'`` → (taps, head map) for ``MobileNetV3_MidNFP``
  (``texture_pooling.py:273-330``);
* ``stop_after_block=i`` → the output of ``blocks[i]`` for the
  ``texture_nfp_intermediate`` tap and ``nfp_insert`` channel resolution
  (``texture_pooling.py:332-406``, ``models/mobilenetv3.py:306-377``).
"""

from __future__ import annotations

import os
from typing import Any, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MobileNetV3Large", "mobilenetv3_large_100", "FEATURE_CHANNELS",
           "BLOCK_OUT_CHANNELS", "hard_swish", "hard_sigmoid"]

Dtype = Any


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


class BlockCfg(NamedTuple):
    kernel: int
    stride: int
    exp_ch: int
    out_ch: int
    use_se: bool
    act: str  # 're' | 'hs'


# mobilenetv3_large_100 block stages (paper Table 1 / timm arch_def).
# The final 1x1 ConvBnAct(960, hardswish) is appended as stage 6.
_STAGES: Tuple[Tuple[BlockCfg, ...], ...] = (
    (BlockCfg(3, 1, 16, 16, False, "re"),),                      # blocks[0]
    (BlockCfg(3, 2, 64, 24, False, "re"),
     BlockCfg(3, 1, 72, 24, False, "re")),                       # blocks[1]
    (BlockCfg(5, 2, 72, 40, True, "re"),
     BlockCfg(5, 1, 120, 40, True, "re"),
     BlockCfg(5, 1, 120, 40, True, "re")),                       # blocks[2]
    (BlockCfg(3, 2, 240, 80, False, "hs"),
     BlockCfg(3, 1, 200, 80, False, "hs"),
     BlockCfg(3, 1, 184, 80, False, "hs"),
     BlockCfg(3, 1, 184, 80, False, "hs")),                      # blocks[3]
    (BlockCfg(3, 1, 480, 112, True, "hs"),
     BlockCfg(3, 1, 672, 112, True, "hs")),                      # blocks[4]
    (BlockCfg(5, 2, 672, 160, True, "hs"),
     BlockCfg(5, 1, 960, 160, True, "hs"),
     BlockCfg(5, 1, 960, 160, True, "hs")),                      # blocks[5]
)

#: channels of the features_only taps (reductions 2,4,8,16,32), matching the
#: reference's ``feature_info`` usage (texture_pooling.py:224-232).
FEATURE_CHANNELS = (16, 24, 40, 112, 960)

#: output channels after each of the 7 block stages (nfp_insert /
#: texture_nfp_intermediate channel resolution, texture_pooling.py:361-372).
BLOCK_OUT_CHANNELS = (16, 24, 40, 80, 112, 160, 960)


def _act(name: str):
    return nn.relu if name == "re" else hard_swish


# Round-3 memory-wall spike (VERDICT directive #4), RETIRED — see PARITY.md.
# Hypothesis: the TPU conv emitter can't fuse a depthwise conv with its
# surrounding BN/hardswish, so expressing the k×k dw conv as k² shifted
# elementwise multiply-adds (a loop fusion) should cut HBM passes. Measured
# (bf16 B=128 train step, v5e-1): 16.6 → 55.8 ms (0.30×) — each tap's
# backward becomes a separate pad-scatter plus a full weight-grad reduction
# that XLA does not multi-output-fuse, while the conv emitter's dw backward
# is already near the roofline. Kept behind NFP_TPU_DW_SHIFTED=1 (default
# OFF, read at trace time) with equivalence tests as the recorded attempt.
class DepthwiseConvShifted(nn.Module):
    """k×k depthwise conv via k² strided shifted slices (fusion-friendly).

    Parameter-compatible with ``nn.Conv(C, (k, k), strides=s, padding=k//2,
    feature_group_count=C, use_bias=False)``: one ``kernel`` param of shape
    (k, k, 1, C), same initializer, same zero ``SAME``-style padding and
    output geometry.
    """

    kernel_size: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        b, h, w, c = x.shape
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (k, k, 1, c), jnp.float32).astype(self.dtype)
        pad = k // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        ho = (h + 2 * pad - k) // s + 1
        wo = (w + 2 * pad - k) // s + 1
        out = jnp.zeros((b, ho, wo, c), self.dtype)
        for dh in range(k):
            for dw in range(k):
                tap = jax.lax.slice(
                    xp, (0, dh, dw, 0),
                    (b, dh + (ho - 1) * s + 1, dw + (wo - 1) * s + 1, c),
                    (1, s, s, 1))
                out = out + tap * kern[dh, dw, 0]
        return out


class SqueezeExcite(nn.Module):
    rd_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_ch, (1, 1), dtype=self.dtype, name="conv_reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="conv_expand")(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    cfg: BlockCfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        cfg = self.cfg
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        act = _act(cfg.act)
        in_ch = x.shape[-1]
        shortcut = x

        y = x
        if cfg.exp_ch != in_ch:
            y = nn.Conv(cfg.exp_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_pw")(y)
            y = act(norm("bn1")(y))
        k = cfg.kernel
        if os.environ.get("NFP_TPU_DW_SHIFTED", "0") == "1":
            y = DepthwiseConvShifted(k, cfg.stride, dtype=self.dtype,
                                     name="conv_dw")(y)
        else:
            y = nn.Conv(cfg.exp_ch, (k, k), strides=cfg.stride,
                        padding=k // 2, feature_group_count=cfg.exp_ch,
                        use_bias=False, dtype=self.dtype, name="conv_dw")(y)
        y = act(norm("bn2")(y))
        if cfg.use_se:
            # SE reduction from the expanded channels, divisible by 8
            # (MobileNetV3 paper §5.3).
            y = SqueezeExcite(_make_divisible(cfg.exp_ch / 4), self.dtype,
                              name="se")(y)
        y = nn.Conv(cfg.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(y)
        y = norm("bn3")(y)
        if cfg.stride == 1 and in_ch == cfg.out_ch:
            y = y + shortcut
        return y


class MobileNetV3Large(nn.Module):
    """MobileNetV3-Large feature extractor with stage taps (see module doc)."""

    dtype: Dtype = jnp.float32
    num_features: int = 960
    head_features: int = 1280
    remat: bool = False  # checkpoint each inverted-residual block

    @nn.compact
    def __call__(self, x, train: bool = False, mode: str = "full",
                 stop_after_block: Optional[int] = None,
                 start_at_block: Optional[int] = None):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        if start_at_block is None:
            x = nn.Conv(16, (3, 3), strides=2, padding=1, use_bias=False,
                        dtype=self.dtype, name="conv_stem")(x)
            x = hard_swish(norm("bn1")(x))

        block_cls = (nn.remat(InvertedResidual, static_argnums=(2,))
                     if self.remat else InvertedResidual)
        feats: List[jnp.ndarray] = []
        for si, stage in enumerate(_STAGES):
            if start_at_block is not None and si < start_at_block:
                continue
            for bi, cfg in enumerate(stage):
                x = block_cls(cfg, self.dtype,
                              name=f"blocks_{si}_{bi}")(x, train)
            if si in (0, 1, 2, 4):
                feats.append(x)
            if stop_after_block is not None and si == stop_after_block:
                return x
        # blocks[6]: final ConvBnAct 1x1 -> 960, hardswish
        if start_at_block is None or start_at_block <= 6:
            x = nn.Conv(960, (1, 1), use_bias=False, dtype=self.dtype,
                        name="blocks_6_0_conv")(x)
            x = hard_swish(norm("blocks_6_0_bn")(x))
            feats.append(x)
        if stop_after_block == 6:
            return x

        if mode == "full":
            return x
        if mode == "features":
            return feats

        # conv_head: 1x1 960 -> 1280 + hardswish (texture_pooling.py:216-217)
        head = nn.Conv(self.head_features, (1, 1), use_bias=True,
                       dtype=self.dtype, name="conv_head")(x)
        head = hard_swish(head)
        if mode == "head":
            return head
        if mode == "features+head":
            return feats, head
        raise ValueError(f"unknown mode {mode!r}")


def mobilenetv3_large_100(dtype: Dtype = jnp.float32) -> MobileNetV3Large:
    return MobileNetV3Large(dtype=dtype)
