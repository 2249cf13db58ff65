"""Tensor-parallel (model-axis) parameter sharding over a 2-D device mesh.

The reference never distributes (SURVEY §2.6: one GPU, ``demo.py:404-412``),
so this layer is TPU-native capability on top of reference parity. The
data-parallel mesh (``parallel/mesh.py``) replicates every parameter; here a
second ``"model"`` mesh axis shards the *wide* parameters — the classifier
``fc`` whose input is K·D = 65,536 features for ResNet50 + DeepTEN
(``/root/reference/models/texture_pooling.py:587-589``, the head SURVEY §7
flags as the memory hard-part), the DeepTEN codebook/BatchNorm, the ViT
encoder MLPs (Megatron column→row split), and the NFP projection → fc chain.

Design: GSPMD-style. Parameters (and therefore their Adam moments and
gradients) carry :class:`~jax.sharding.NamedSharding` placements derived from
path rules; the train/eval steps are unchanged — XLA's SPMD partitioner
propagates the shardings through the forward/backward and inserts the
collectives (a psum over ``"model"`` after each row-parallel contraction, the
gradient all-reduce over ``"data"``). No hand-written collectives.

Every rule is guarded by divisibility: a parameter whose sharded dimension
does not divide by the model-axis size silently stays replicated (e.g.
ViT-Tiny's 3 attention heads under tp=2 — the MLP rules still apply). This
keeps one rule set correct for every backbone × head in the zoo.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "MODEL_AXIS_RULES",
    "create_tp_mesh",
    "has_model_axis",
    "spec_for_path",
    "state_shardings",
    "shard_state",
]

_M = "model"

#: Ordered (path regex, PartitionSpec) rules. Paths are the "/"-joined dict
#: keys of a leaf — identical for ``params``, ``batch_stats`` and the Adam
#: ``mu``/``nu`` trees, so moments shard exactly like their parameters.
MODEL_AXIS_RULES: Tuple[Tuple[str, P], ...] = (
    # classifier fc: row-parallel (input features sharded; XLA inserts the
    # psum over "model" after the contraction). For texture_deepten this is
    # the (K·D, classes) = (65536, classes) ResNet50 matrix.
    (r"(^|/)fc/kernel$", P(_M, None)),
    # DeepTEN head ("encoding" in the zoo, ops/deepten.py): codebook rows +
    # the BatchNorm over the flattened (K·D,) encoding. K-major flatten
    # keeps the split aligned.
    (r"(^|/)encoding/codewords$", P(_M, None)),
    (r"(^|/)encoding/scale$", P(_M)),
    (r"(^|/)encoding/bn/(scale|bias|mean|var)$", P(_M)),
    # mid_nfp / multi_stage_nfp projection (models/zoo.py): column-parallel
    # into the row-parallel fc — the (B, 1280) intermediate stays sharded.
    (r"(^|/)(nfp_mid_proj|nfp_proj)/kernel$", P(None, _M)),
    (r"(^|/)(nfp_mid_proj|nfp_proj)/bias$", P(_M)),
    # ViT encoder MLP: Megatron column→row split (backbones/vit.py MlpBlock).
    (r"/mlp/fc1/kernel$", P(None, _M)),
    (r"/mlp/fc1/bias$", P(_M)),
    (r"/mlp/fc2/kernel$", P(_M, None)),
    # ViT fused attention, head-sharded (falls back for ViT-Tiny: 3 heads).
    (r"/attn/(query|key|value)/kernel$", P(None, _M, None)),
    (r"/attn/(query|key|value)/bias$", P(_M, None)),
    (r"/attn/out/kernel$", P(_M, None, None)),
)


def create_tp_mesh(model_parallel: int,
                   devices: Optional[Sequence[jax.Device]] = None,
                   axis_names: Tuple[str, str] = ("data", _M)) -> Mesh:
    """2-D ``(data, model)`` mesh: batch over ICI rows, wide params over
    columns. ``model_parallel`` must divide the device count."""
    devices = list(devices) if devices is not None else jax.devices()
    if model_parallel <= 0 or len(devices) % model_parallel:
        raise ValueError(
            f"model_parallel={model_parallel} must divide the device count "
            f"({len(devices)})")
    grid = np.asarray(devices).reshape(len(devices) // model_parallel,
                                       model_parallel)
    return Mesh(grid, axis_names)


def has_model_axis(mesh: Optional[Mesh]) -> bool:
    return (mesh is not None and _M in mesh.axis_names
            and mesh.shape[_M] > 1)


def spec_for_path(path: str, shape: Tuple[int, ...], tp_size: int,
                  rules: Tuple[Tuple[str, P], ...] = MODEL_AXIS_RULES) -> P:
    """PartitionSpec for one leaf: first matching rule, or replicated.

    Falls back to replicated when the rule's rank disagrees with the leaf or
    any model-sharded dimension does not divide by ``tp_size``.
    """
    for pattern, spec in rules:
        if not re.search(pattern, path):
            continue
        if len(spec) != len(shape):
            return P()
        for dim, axis in enumerate(spec):
            if axis == _M and shape[dim] % tp_size:
                return P()
        return spec
    return P()


def _leaf_path(key_path) -> str:
    """"/"-joined dict keys of a tree_map_with_path key path. Non-dict
    entries (struct attrs, tuple indices) are dropped so ``params`` and the
    optimizer-moment trees resolve to the same rule path."""
    parts = []
    for entry in key_path:
        if isinstance(entry, jax.tree_util.DictKey):
            parts.append(str(entry.key))
    return "/".join(parts)


def state_shardings(state, mesh: Mesh,
                    rules: Tuple[Tuple[str, P], ...] = MODEL_AXIS_RULES):
    """A ``state``-shaped tree of :class:`NamedSharding` (``None`` on
    non-array leaves) applying the model-axis rules over ``mesh``."""
    tp = mesh.shape[_M] if _M in mesh.axis_names else 1

    def leaf(kp, x):
        if not isinstance(x, (jax.Array, np.ndarray, jax.numpy.ndarray)):
            return None
        spec = (spec_for_path(_leaf_path(kp), tuple(np.shape(x)), tp, rules)
                if tp > 1 else P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, state)


def shard_state(state, mesh: Mesh,
                rules: Tuple[Tuple[str, P], ...] = MODEL_AXIS_RULES):
    """Place every array leaf of a train state onto ``mesh`` under the
    model-axis rules (multi-host safe via ``mesh.place_leaf``)."""
    from .mesh import place_leaf

    tp = mesh.shape[_M] if _M in mesh.axis_names else 1

    def put(kp, x):
        if not isinstance(x, (jax.Array, np.ndarray, jax.numpy.ndarray)):
            return x
        spec = (spec_for_path(_leaf_path(kp), tuple(np.shape(x)), tp, rules)
                if tp > 1 else P())
        return place_leaf(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, state)
