"""Import trained PyTorch reference checkpoints into this framework.

The reference trains ``Lightning_Wrapper(model)`` and saves Lightning
``.ckpt`` files (``/root/reference/demo.py:381-392``); a user switching to
this framework arrives with those. This module converts a reference
checkpoint — Lightning ``.ckpt``, a raw ``model.state_dict()`` file, or an
``.npz`` — into this package's Flax variable tree for the equivalent
``get_model(model_type, model_variant, ...)``, so the weights can be
served, exported, or fine-tuned on TPU without retraining.

Scope: the four backbones × the six ACTIVE head variants of
``/root/reference/models/texture_pooling.py`` (gap_only, texture_nfp,
texture_fractal, texture_lacunarity, texture_deepten, texture_radam).
Backbone tensors ride the existing timm porter (``timm_port``, the
reference backbones ARE timm models so their keys match); this module adds
the head/classifier mapping:

========================  =============================================
reference key              flax path
========================  =============================================
``fc.weight/bias``         ``params/fc/{kernel^T, bias}``
``pool.nfp_proj.*``        ``params/pool/nfp_proj/*``   (texture_nfp,
                           ``NFP_Pooling.py:23``)
``pool.conv1.0.*``         ``params/pool/conv1/*``      (texture_fractal,
``pool.conv1.2.*``         ``params+batch_stats/pool/bn/*``
                           ``Fractal_Pooling.py:52-59``)
``encoding.codewords``     ``params/encoding/codewords`` (texture_deepten,
``encoding.scale``         ``params/encoding/scale``    ``deepten.py:22-23``)
``bn.*``                   ``params+batch_stats/encoding/bn/*``
                           (``texture_pooling.py:476-477``)
========================  =============================================

Keys that carry no learned state are dropped: the frozen NFP neighbor
convs (deterministic from (R, measure), ``nfp.py:60-81`` — this framework
reconstructs them inside the op), torchmetrics buffers, the loss module,
and ``num_batches_tracked``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .backbones.timm_port import port_backbone

__all__ = ["load_reference_state_dict", "import_reference_checkpoint",
           "prune_unused_backbone", "SUPPORTED_VARIANTS"]

Array = np.ndarray

SUPPORTED_VARIANTS = ("gap_only", "texture_nfp", "texture_fractal",
                      "texture_lacunarity", "texture_deepten",
                      "texture_radam")

#: reference key prefixes that hold no learned state
_DROP_PREFIXES = (
    "pool.nfp_layer.",     # frozen neighbor/center convs (nfp.py:60-81)
    "pool.lacunarity_layer.",
    "criterion.",          # CrossEntropyLoss has no params but be safe
)
_DROP_SUBSTRINGS = (
    "num_batches_tracked",
)
# torchmetrics modules Lightning persists alongside the model
_METRIC_PREFIXES = ("train_", "val_", "test_", "metrics.")


def _torch_load_checkpoint(torch, path):
    """``torch.load`` with weights-only safety plus a numpy/argparse
    allowlist.

    Lightning checkpoints from the reference trainer (``demo.py:384-391``)
    store ``hyper_parameters`` beside ``state_dict``; those payloads hold
    numpy arrays/scalars and ``argparse.Namespace`` objects that the strict
    ``weights_only=True`` unpickler rejects. Allowlisting just those keeps
    the load weights-only-safe. ``NFP_TPU_UNSAFE_LOAD=1`` falls back to a
    full pickle load for a file the user explicitly trusts.
    """
    import argparse
    import pickle

    try:
        allow = [np.ndarray, np.dtype, np.generic, argparse.Namespace]
        core = getattr(np, "_core", None) or np.core
        allow += [core.multiarray._reconstruct, core.multiarray.scalar]
        allow += [t for t in np.dtypes.__dict__.values()
                  if isinstance(t, type)]
        with torch.serialization.safe_globals(allow):
            return torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        if os.environ.get("NFP_TPU_UNSAFE_LOAD") == "1":
            return torch.load(path, map_location="cpu", weights_only=False)
        raise


def load_reference_state_dict(path_or_sd) -> Dict[str, Array]:
    """Load and normalize a reference checkpoint to ``{bare_key: ndarray}``.

    Accepts a filesystem path (Lightning ``.ckpt``, ``torch.save``'d state
    dict, or ``.npz``) or an in-memory mapping. Lightning checkpoints nest
    the weights under ``state_dict`` with a ``model.`` prefix
    (``Lightning_Wrapper.py:16`` stores the network as ``self.model``);
    both are stripped here.
    """
    if isinstance(path_or_sd, (str, bytes)):
        path = os.fspath(path_or_sd)
        if path.endswith(".npz"):
            sd = dict(np.load(path))
        else:
            import torch

            # Lightning .ckpt files carry non-tensor bookkeeping (epoch,
            # optimizer_states, hyper_parameters...) beside 'state_dict' —
            # extract the weights BEFORE any tensor conversion. Stay on the
            # weights_only unpickler but allowlist the benign globals a
            # Lightning hparams payload actually contains (numpy arrays/
            # scalars, argparse.Namespace); NFP_TPU_UNSAFE_LOAD=1 opts a
            # trusted file into the full pickle path as a last resort.
            obj = _torch_load_checkpoint(torch, path)
            if hasattr(obj, "state_dict"):
                obj = obj.state_dict()
            if isinstance(obj, Mapping) and isinstance(
                    obj.get("state_dict"), Mapping):
                obj = obj["state_dict"]
            sd = {k: v for k, v in obj.items() if torch.is_tensor(v)}
    else:
        sd = dict(path_or_sd)
        if isinstance(sd.get("state_dict"), Mapping):
            sd = dict(sd["state_dict"])
    out = {}
    for k, v in sd.items():
        if k.startswith("model."):
            k = k[len("model."):]
        k = k.replace("_orig_mod.", "")  # torch.compile wrapping
        out[k] = (v.detach().cpu().numpy() if hasattr(v, "detach")
                  else np.asarray(v))
    return out


def _linear(w: Array) -> Array:
    return np.transpose(w, (1, 0))


def _conv_hwio(w: Array) -> Array:
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: Array) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _head_map(variant: str, sd: Mapping[str, Array], params: Dict,
              stats: Dict, consumed: set) -> None:
    """Map the head/classifier keys for one active variant."""

    def take(key: str) -> Array:
        if key not in sd:
            raise KeyError(
                f"reference checkpoint is missing {key!r} — is it really a "
                f"{variant!r} model?")
        consumed.add(key)
        return sd[key]

    _set(params, ("fc", "kernel"), _linear(take("fc.weight")))
    _set(params, ("fc", "bias"), take("fc.bias"))

    if variant == "texture_nfp":
        _set(params, ("pool", "nfp_proj", "kernel"),
             _linear(take("pool.nfp_proj.weight")))
        _set(params, ("pool", "nfp_proj", "bias"), take("pool.nfp_proj.bias"))
    elif variant == "texture_fractal":
        # conv1 = Sequential(Conv2d, Dropout2d, BatchNorm2d)
        _set(params, ("pool", "conv1", "kernel"),
             _conv_hwio(take("pool.conv1.0.weight")))
        _set(params, ("pool", "conv1", "bias"), take("pool.conv1.0.bias"))
        _set(params, ("pool", "bn", "scale"), take("pool.conv1.2.weight"))
        _set(params, ("pool", "bn", "bias"), take("pool.conv1.2.bias"))
        _set(stats, ("pool", "bn", "mean"), take("pool.conv1.2.running_mean"))
        _set(stats, ("pool", "bn", "var"), take("pool.conv1.2.running_var"))
    elif variant == "texture_deepten":
        _set(params, ("encoding", "codewords"), take("encoding.codewords"))
        _set(params, ("encoding", "scale"), take("encoding.scale"))
        _set(params, ("encoding", "bn", "scale"), take("bn.weight"))
        _set(params, ("encoding", "bn", "bias"), take("bn.bias"))
        _set(stats, ("encoding", "bn", "mean"), take("bn.running_mean"))
        _set(stats, ("encoding", "bn", "var"), take("bn.running_var"))
    # gap_only / texture_lacunarity / texture_radam: classifier only —
    # lacunarity and RADAM pooling carry no learned tensors (the RADAM
    # encoder is the deterministic LCG construction, RNN.py:88-135,
    # regenerated bit-exactly by ops/radam.py).


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def prune_unused_backbone(variables: Dict[str, Any],
                          target: Dict[str, Any]
                          ) -> Tuple[Dict[str, Any], list]:
    """Drop imported BACKBONE leaves the target model's init tree does not
    have. The reference checkpoint carries every tensor of the timm module,
    but a texture variant may never run parts of it — e.g. MobileNetV3's
    ``conv_head`` exists in the state dict while feature-mode variants stop
    at the 960-ch map (``texture_pooling.py:147``), so Flax never creates
    those params. Extras OUTSIDE the backbone still mean a wrong variant
    and are never pruned. Returns ``(pruned_variables, dropped_paths)``.
    """
    out: Dict[str, Any] = {}
    dropped = []
    for col, sub in variables.items():
        want = {p for p, _ in _tree_paths(target.get(col, {}))}
        flat = {}
        for p, leaf in _tree_paths(sub):
            if p not in want and p[:1] == ("backbone",):
                dropped.append(f"{col}/" + "/".join(p))
            else:
                flat[p] = leaf
        if flat:
            node: Dict[str, Any] = {}
            for p, leaf in flat.items():
                _set(node, p, leaf)
            out[col] = node
    return out, sorted(dropped)


def import_reference_checkpoint(
        path_or_sd, model_type: str, model_variant: str,
        *, in_chans: int = 3, validate_against=None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a reference checkpoint into Flax variables.

    Args:
      path_or_sd: checkpoint path or state-dict mapping
        (see :func:`load_reference_state_dict`).
      model_type: canonical backbone name (``resnet18``/``resnet50``/
        ``mobilenetv3``/``vittiny``).
      model_variant: one of :data:`SUPPORTED_VARIANTS`.
      in_chans: input channels the checkpoint was trained with (13 for
        EuroSAT). The backbone porter adapts the stem only when the saved
        stem itself is 3-channel.
      validate_against: optional variable tree from ``model.init`` — when
        given, every expected leaf must be produced with a matching shape.

    Returns:
      ``(variables, report)`` where ``variables`` is
      ``{"params": ..., "batch_stats": ...}`` and ``report`` lists
      ``consumed``/``dropped``/``unconsumed`` reference keys.
    """
    from .zoo import canonical_model_type

    model_type = canonical_model_type(model_type)
    if model_variant not in SUPPORTED_VARIANTS:
        raise NotImplementedError(
            f"import supports the active reference variants "
            f"{SUPPORTED_VARIANTS}, not {model_variant!r} (the structural "
            f"taps and legacy-grid heads were never shipped as trained "
            f"checkpoints by the reference)")
    sd = load_reference_state_dict(path_or_sd)

    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    if not backbone_sd:
        raise KeyError(
            "no 'backbone.*' keys found — pass a full reference model "
            "checkpoint (for bare timm state dicts use "
            "timm_port.port_backbone / the CLI --pretrained flag)")
    backbone = port_backbone(
        model_type,
        {k: v for k, v in backbone_sd.items()
         if "num_batches_tracked" not in k},
        in_chans=in_chans)

    params: Dict[str, Any] = {"backbone": backbone["params"]}
    # ViT has no BN: its porter output carries no batch_stats collection
    stats: Dict[str, Any] = {"backbone": backbone.get("batch_stats") or {}}
    consumed: set = set()
    _head_map(model_variant, sd, params, stats, consumed)

    dropped, unconsumed = [], []
    for k in sd:
        if k.startswith("backbone.") or k in consumed:
            continue
        if (k.startswith(_DROP_PREFIXES) or k.startswith(_METRIC_PREFIXES)
                or any(s in k for s in _DROP_SUBSTRINGS)):
            dropped.append(k)
        else:
            unconsumed.append(k)
    if unconsumed:
        raise KeyError(
            f"unrecognized reference keys (wrong --model_variant?): "
            f"{sorted(unconsumed)[:8]}")

    variables = {"params": params}
    if any(True for _ in _tree_paths(stats)):
        variables["batch_stats"] = stats
    pruned: list = []
    if validate_against is not None:
        variables, pruned = prune_unused_backbone(variables, validate_against)
        for coll in ("params", "batch_stats"):
            have = {p: np.shape(v)
                    for p, v in _tree_paths(variables.get(coll, {}))}
            for p, leaf in _tree_paths(validate_against.get(coll, {})):
                if p not in have:
                    raise KeyError(f"import produced no leaf for "
                                   f"{coll}/{'/'.join(p)}")
                if tuple(have[p]) != tuple(np.shape(leaf)):
                    raise ValueError(
                        f"shape mismatch at {coll}/{'/'.join(p)}: "
                        f"checkpoint {have[p]} vs model {np.shape(leaf)}")
            extra = set(have) - {p for p, _ in
                                 _tree_paths(validate_against.get(coll, {}))}
            if extra:  # non-backbone extras survive pruning: wrong variant
                raise KeyError(
                    f"import produced leaves the model does not have "
                    f"({coll}): {sorted('/'.join(p) for p in extra)[:8]}")
    report = {"consumed": sorted(consumed), "dropped": sorted(dropped),
              "pruned": pruned, "backbone_keys": len(backbone_sd)}
    return variables, report
