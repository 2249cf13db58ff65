"""timm → Flax pretrained-weight porter.

The reference fine-tunes timm-pretrained backbones
(``timm.create_model(..., pretrained=True)``, e.g.
``/root/reference/models/texture_pooling.py:19``). This environment has no
network egress and no timm, so porting is an offline tool: given a timm
state_dict (saved with ``torch.save(model.state_dict(), f)`` or as a plain
``{name: np.ndarray}`` pickle/npz), it converts to this package's Flax
variable tree.

Conventions handled:

* conv kernels: torch OIHW → flax HWIO; depthwise (groups=C) torch
  ``(C, 1, H, W)`` → flax ``(H, W, 1, C)``;
* linear: torch ``(out, in)`` → flax ``(in, out)``;
* BatchNorm: weight/bias → scale/bias params; running_mean/var →
  ``batch_stats``;
* ViT: timm packs qkv as one ``(3D, D)`` matrix; flax
  ``MultiHeadDotProductAttention`` wants per-head ``(D, H, D/H)`` query/key/
  value kernels and ``(H, D/H, D)`` out kernel;
* ``in_chans != 3`` adaptation: timm-style channel repeat + renormalize.

Name maps are defined per backbone below; ``port_state_dict`` validates that
every expected flax leaf is produced and shapes match.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Tuple

import numpy as np

__all__ = ["port_resnet", "port_mobilenetv3", "port_vit", "adapt_in_chans",
           "load_torch_state_dict", "port_backbone"]

Array = np.ndarray
Tree = Dict[str, Any]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a state dict saved by torch (or a plain npz) into numpy."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def port_backbone(model_type: str, sd: Mapping[str, Array],
                  in_chans: int = 3) -> Tree:
    """Dispatch a timm state_dict to the right porter by canonical model
    type (``resnet18``/``resnet50``/``mobilenetv3``/``vittiny``) — the one
    call the CLI's ``--pretrained`` flag needs."""
    if model_type == "resnet18":
        return port_resnet(sd, layers=(2, 2, 2, 2), bottleneck=False,
                           in_chans=in_chans)
    if model_type == "resnet50":
        return port_resnet(sd, layers=(3, 4, 6, 3), bottleneck=True,
                           in_chans=in_chans)
    if model_type == "mobilenetv3":
        return port_mobilenetv3(sd, in_chans=in_chans)
    if model_type == "vittiny":
        return port_vit(sd, depth=12, num_heads=3, in_chans=in_chans)
    raise ValueError(f"no porter for model_type {model_type!r}")


def _set(tree: Tree, path: Tuple[str, ...], value: Array) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(w: Array) -> Array:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dwconv(w: Array) -> Array:
    """(C, 1, H, W) depthwise -> (H, W, 1, C)."""
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: Array) -> Array:
    return np.transpose(w, (1, 0))


def adapt_in_chans(kernel_hwio: Array, in_chans: int) -> Array:
    """timm's ``in_chans`` adaptation: grayscale gets the channel-summed
    filter (luminance-like response); other counts repeat the filters
    cyclically and rescale so activation magnitude is preserved."""
    h, w, c, o = kernel_hwio.shape
    if c == in_chans:
        return kernel_hwio
    if in_chans == 1:
        return kernel_hwio.sum(axis=2, keepdims=True)
    reps = int(np.ceil(in_chans / c))
    k = np.concatenate([kernel_hwio] * reps, axis=2)[:, :, :in_chans]
    return k * (c / in_chans)


def _port_bn(sd: Mapping[str, Array], prefix: str, params: Tree,
             stats: Tree, path: Tuple[str, ...]) -> None:
    _set(params, path + ("scale",), sd[prefix + ".weight"])
    _set(params, path + ("bias",), sd[prefix + ".bias"])
    _set(stats, path + ("mean",), sd[prefix + ".running_mean"])
    _set(stats, path + ("var",), sd[prefix + ".running_var"])


# ------------------------------------------------------------------ resnet


def port_resnet(sd: Mapping[str, Array], layers=(2, 2, 2, 2),
                bottleneck: bool = False, in_chans: int = 3) -> Tree:
    """timm resnet18/50 state_dict → variables for ``backbones.resnet.ResNet``.

    Returns ``{"params": ..., "batch_stats": ...}`` (backbone subtree only).
    """
    params: Tree = {}
    stats: Tree = {}
    stem = adapt_in_chans(_conv(sd["conv1.weight"]), in_chans)
    _set(params, ("conv1", "kernel"), stem)
    _port_bn(sd, "bn1", params, stats, ("bn1",))

    n_convs = 3 if bottleneck else 2
    for si, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            t = f"layer{si + 1}.{bi}"
            f = f"layer{si + 1}_{bi}"
            for ci in range(1, n_convs + 1):
                _set(params, (f, f"conv{ci}", "kernel"),
                     _conv(sd[f"{t}.conv{ci}.weight"]))
                _port_bn(sd, f"{t}.bn{ci}", params, stats, (f, f"bn{ci}"))
            if f"{t}.downsample.0.weight" in sd:
                _set(params, (f, "downsample_conv", "kernel"),
                     _conv(sd[f"{t}.downsample.0.weight"]))
                _port_bn(sd, f"{t}.downsample.1", params, stats,
                         (f, "downsample_bn"))
    return {"params": params, "batch_stats": stats}


# -------------------------------------------------------------- mobilenetv3


def port_mobilenetv3(sd: Mapping[str, Array], in_chans: int = 3) -> Tree:
    """timm mobilenetv3_large_100 state_dict → variables for
    ``backbones.mobilenetv3.MobileNetV3Large``.

    timm block module layout: ``blocks.{stage}.{block}.{conv_pw,conv_dw,
    conv_pwl,bn1,bn2,bn3,se.conv_reduce,se.conv_expand}``; stage 0 blocks are
    DepthwiseSeparableConv with ``conv_dw/bn1, conv_pw/bn2`` (no expansion) —
    mapped onto this package's uniform InvertedResidual naming.
    """
    from .mobilenetv3 import _STAGES  # noqa: PLC0415

    params: Tree = {}
    stats: Tree = {}
    stem = adapt_in_chans(_conv(sd["conv_stem.weight"]), in_chans)
    _set(params, ("conv_stem", "kernel"), stem)
    _port_bn(sd, "bn1", params, stats, ("bn1",))

    for si, stage in enumerate(_STAGES):
        for bi, cfg in enumerate(stage):
            t = f"blocks.{si}.{bi}"
            f = f"blocks_{si}_{bi}"
            has_pw = f"{t}.conv_pw.weight" in sd and si > 0
            if si == 0:
                # DepthwiseSeparable: conv_dw/bn1 then conv_pw/bn2(project)
                _set(params, (f, "conv_dw", "kernel"),
                     _dwconv(sd[f"{t}.conv_dw.weight"]))
                _port_bn(sd, f"{t}.bn1", params, stats, (f, "bn2"))
                _set(params, (f, "conv_pwl", "kernel"),
                     _conv(sd[f"{t}.conv_pw.weight"]))
                _port_bn(sd, f"{t}.bn2", params, stats, (f, "bn3"))
            else:
                if has_pw:
                    _set(params, (f, "conv_pw", "kernel"),
                         _conv(sd[f"{t}.conv_pw.weight"]))
                    _port_bn(sd, f"{t}.bn1", params, stats, (f, "bn1"))
                _set(params, (f, "conv_dw", "kernel"),
                     _dwconv(sd[f"{t}.conv_dw.weight"]))
                _port_bn(sd, f"{t}.bn2", params, stats, (f, "bn2"))
                _set(params, (f, "conv_pwl", "kernel"),
                     _conv(sd[f"{t}.conv_pwl.weight"]))
                _port_bn(sd, f"{t}.bn3", params, stats, (f, "bn3"))
            if cfg.use_se:
                _set(params, (f, "se", "conv_reduce", "kernel"),
                     _conv(sd[f"{t}.se.conv_reduce.weight"]))
                _set(params, (f, "se", "conv_reduce", "bias"),
                     sd[f"{t}.se.conv_reduce.bias"])
                _set(params, (f, "se", "conv_expand", "kernel"),
                     _conv(sd[f"{t}.se.conv_expand.weight"]))
                _set(params, (f, "se", "conv_expand", "bias"),
                     sd[f"{t}.se.conv_expand.bias"])

    # blocks.6.0: ConvBnAct 960
    _set(params, ("blocks_6_0_conv", "kernel"),
         _conv(sd["blocks.6.0.conv.weight"]))
    _port_bn(sd, "blocks.6.0.bn1", params, stats, ("blocks_6_0_bn",))
    # conv_head (1x1 960->1280, bias, no BN)
    if "conv_head.weight" in sd:
        _set(params, ("conv_head", "kernel"), _conv(sd["conv_head.weight"]))
        _set(params, ("conv_head", "bias"),
             sd.get("conv_head.bias", np.zeros(sd["conv_head.weight"].shape[0],
                                               np.float32)))
    return {"params": params, "batch_stats": stats}


# -------------------------------------------------------------------- vit


def port_vit(sd: Mapping[str, Array], depth: int = 12, num_heads: int = 3,
             in_chans: int = 3) -> Tree:
    """timm vit_tiny_patch16_224 state_dict → variables for
    ``backbones.vit.ViT``."""
    params: Tree = {}
    d = sd["cls_token"].shape[-1]
    hd = d // num_heads

    patch = adapt_in_chans(_conv(sd["patch_embed.proj.weight"]), in_chans)
    _set(params, ("patch_embed", "kernel"), patch)
    _set(params, ("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    _set(params, ("cls_token",), sd["cls_token"])
    _set(params, ("pos_embed",), sd["pos_embed"])

    for i in range(depth):
        t = f"blocks.{i}"
        f = f"block_{i}"
        for ln in ("norm1", "norm2"):
            _set(params, (f, ln, "scale"), sd[f"{t}.{ln}.weight"])
            _set(params, (f, ln, "bias"), sd[f"{t}.{ln}.bias"])
        qkv_w = sd[f"{t}.attn.qkv.weight"]           # (3D, D)
        qkv_b = sd[f"{t}.attn.qkv.bias"]             # (3D,)
        for j, name in enumerate(("query", "key", "value")):
            w = qkv_w[j * d:(j + 1) * d]             # (D, D) out,in
            b = qkv_b[j * d:(j + 1) * d]
            _set(params, (f, "attn", name, "kernel"),
                 _linear(w).reshape(d, num_heads, hd))
            _set(params, (f, "attn", name, "bias"),
                 b.reshape(num_heads, hd))
        proj_w = sd[f"{t}.attn.proj.weight"]         # (D, D)
        _set(params, (f, "attn", "out", "kernel"),
             _linear(proj_w).reshape(num_heads, hd, d))
        _set(params, (f, "attn", "out", "bias"), sd[f"{t}.attn.proj.bias"])
        for src, dst in (("mlp.fc1", "fc1"), ("mlp.fc2", "fc2")):
            _set(params, (f, "mlp", dst, "kernel"),
                 _linear(sd[f"{t}.{src}.weight"]))
            _set(params, (f, "mlp", dst, "bias"), sd[f"{t}.{src}.bias"])
    _set(params, ("norm", "scale"), sd["norm.weight"])
    _set(params, ("norm", "bias"), sd["norm.bias"])
    return {"params": params}
