"""Flax ResNet-18/50 backbones (timm geometry, NHWC).

Feature extractors equivalent to the reference's
``timm.create_model('resnet18'|'resnet50', num_classes=0, global_pool='')``
``forward_features`` (``/root/reference/models/texture_pooling.py:19, 533``):
7×7/2 stem → BN/ReLU → 3×3/2 max-pool → 4 stages → ``(B, H/32, W/32, C)``
with C = 512 (BasicBlock ×[2,2,2,2]) or 2048 (Bottleneck ×[3,4,6,3]).

Also exposes per-stage taps (``RESNET18_NFP_AT_LAYER`` needs the output of
any of layer1..layer4, ``/root/reference/models/resnet18.py:410-468``).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ResNet", "resnet18", "resnet50"]

Dtype = Any


class _StemConvS2D(nn.Module):
    """The 7×7/stride-2 stem conv, computed via a 2×2 space-to-depth
    transform (the MLPerf-ResNet TPU optimization).

    A 7×7 conv over a 3-channel image contracts only 7·7·3 = 147 values per
    output — with C_in = 3, the MXU runs nearly empty, and profiling shows
    the stem's weight-gradient conv alone costs ~6% of a train step. Folding
    2×2 pixel cells into channels turns the same arithmetic into a 4×4
    stride-1 conv over an (H/2, W/2, 4·C_in) input: identical multiply-add
    set (the kernel is zero-padded from 7×7 to 8×8 first), 4× the input
    channels, better MXU tiling for both the forward and the weight-grad
    conv.

    The parameter keeps the standard ``kernel`` name and (7, 7, C_in, F)
    shape — checkpoints and the timm weight porter are layout-agnostic; the
    re-layout to (4, 4, 4·C_in, F) is a few-kB reshape traced into the step.
    """

    features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c_in = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, c_in, self.features))
        # zero-pad to 8×8 at the leading edge: 7×7/s2/pad3 on the pixel grid
        # ≡ 8×8/s2/pad4 with a zero first row/col ≡ 4×4/s1/pad(2,1) on the
        # 2×2-cell grid below (same taps, kh = 2a + r with r the in-cell
        # offset folded into channels)
        w8 = jnp.pad(kernel.astype(self.dtype),
                     ((1, 0), (1, 0), (0, 0), (0, 0)))
        ws = jnp.transpose(w8.reshape(4, 2, 4, 2, c_in, self.features),
                           (0, 2, 1, 3, 4, 5))
        ws = ws.reshape(4, 4, 4 * c_in, self.features)
        y = jnp.transpose(
            x.astype(self.dtype).reshape(b, h // 2, 2, w // 2, 2, c_in),
            (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, w // 2, 4 * c_in)
        return jax.lax.conv_general_dilated(
            y, ws, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _FusedStemTail(nn.Module):
    """Drop-in for the stem's ``BatchNorm -> relu -> max_pool`` with the
    fused backward of ``ops.stem_pool.bn_relu_maxpool`` (no
    SelectAndScatter, closed-form BN gradient, 112² pre-pool map never
    saved as a residual).

    Variable layout is identical to ``nn.BatchNorm`` (params ``scale`` /
    ``bias``, batch_stats ``mean`` / ``var``) so checkpoints and the timm
    porter see the same tree; running stats follow flax's
    ``momentum * old + (1 - momentum) * batch`` with biased fast variance.
    Eval mode uses the stock ops (bit-parity with ``nn.BatchNorm``)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from ...ops.stem_pool import bn_relu_maxpool

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if not train:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = ((x.astype(jnp.float32) - ra_mean.value) * (inv * scale)
                 + bias).astype(self.dtype)
            z = nn.relu(a)
            return nn.max_pool(z, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum)
                             * jax.lax.stop_gradient(mean))
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum)
                            * jax.lax.stop_gradient(var))
        y = bn_relu_maxpool(x, mean, var, scale, bias, self.epsilon)
        return y.astype(self.dtype)


def _ckpt_name(y, name: str, enabled: bool):
    """Tag ``y`` for selective-remat policies (``remat_policy='conv_out'``).
    MUST stay a true no-op unless that policy is active: ``checkpoint_name``
    inserts a ``name_p`` eqn into the jaxpr even outside remat, which broke
    the int8 BN-folding/chaining dataflow discovery (quant.py pattern-
    matches conv→BN adjacency; round-5 randomized full run #2)."""
    if not enabled:
        return y
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(y, name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    #: tag conv outputs for the 'conv_out' remat policy (ResNet sets this
    #: only when that policy is active)
    tag_convs: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _ckpt_name(y, "conv_out", self.tag_convs)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _ckpt_name(y, "conv_out", self.tag_convs)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32
    #: see BasicBlock.tag_convs
    tag_convs: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        out_ch = self.planes * self.expansion
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = _ckpt_name(y, "conv_out", self.tag_convs)
        y = nn.relu(norm("bn1")(y))
        # stride on the 3x3 (torch/timm "pytorch"-style ResNet-B)
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _ckpt_name(y, "conv_out", self.tag_convs)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _ckpt_name(y, "conv_out", self.tag_convs)
        y = norm("bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Feature-extractor ResNet. ``__call__`` returns the final NHWC map;
    ``features`` returns the four per-stage taps."""

    block: str  # 'basic' | 'bottleneck'
    layers: Sequence[int]
    dtype: Dtype = jnp.float32
    #: rematerialize each residual block in the backward pass
    #: (jax.checkpoint): trades ~33% extra FLOPs for not keeping block
    #: activations alive, unlocking larger train batches in HBM
    remat: bool = False
    #: with ``remat=True``: 'full' recomputes everything in the block;
    #: 'conv_out' saves ONLY the tagged conv outputs (BN/ReLU intermediates
    #: are recomputed from them) — a traffic-vs-FLOPs middle point for the
    #: memory-bound train step (round-5 MFU experiment, PARITY.md)
    remat_policy: str = "full"
    #: compute the stem conv via 2×2 space-to-depth (_StemConvS2D) — same
    #: arithmetic, better MXU mapping; requires even H and W (falls back to
    #: the direct conv otherwise). Parameter tree is identical either way.
    stem_s2d: bool = False
    #: fuse the stem's BN→ReLU→maxpool backward (_FusedStemTail /
    #: ops.stem_pool). MEASURED 0.56× on v5e (PARITY.md "fused stem-tail
    #: backward spike") — kept as the recorded round-3 spike, default OFF;
    #: do not enable for performance. Same parameter tree ("bn1"
    #: scale/bias/mean/var).
    stem_fused: bool = False

    @property
    def num_features(self) -> int:
        return 512 if self.block == "basic" else 2048

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_stages: bool = False):
        if self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = _StemConvS2D(dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        if self.stem_fused:
            x = _FusedStemTail(momentum=0.9, epsilon=1e-5,
                               dtype=self.dtype, name="bn1")(x, train)
        else:
            norm = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name="bn1")
            x = nn.relu(norm(x))
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        blk = BasicBlock if self.block == "basic" else Bottleneck
        tag_convs = False
        if self.remat:
            if self.remat_policy == "conv_out":
                from jax.ad_checkpoint import checkpoint_policies

                pol = checkpoint_policies.save_only_these_names("conv_out")
                tag_convs = True
            elif self.remat_policy == "full":
                pol = None
            else:
                raise ValueError(f"remat_policy={self.remat_policy!r} "
                                 f"(expected 'full' or 'conv_out')")
            blk = nn.remat(blk, static_argnums=(2,),  # (self, x, train)
                           policy=pol)
        stages: List[jnp.ndarray] = []
        for i, (planes, n_blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = blk(planes=planes, stride=stride, dtype=self.dtype,
                        tag_convs=tag_convs,
                        name=f"layer{i + 1}_{j}")(x, train)
            stages.append(x)
        if return_stages:
            return stages
        return x


def resnet18(dtype: Dtype = jnp.float32) -> ResNet:
    return ResNet(block="basic", layers=(2, 2, 2, 2), dtype=dtype)


def resnet50(dtype: Dtype = jnp.float32) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3), dtype=dtype)
