"""ZeRO-style sharding of optimizer state (and optionally parameters)
over the data axis.

The reference never distributes (SURVEY §2.6: one GPU) and its Lightning
trainer keeps a full Adam state per device; this module is TPU-native
capability. Data-parallel training replicates parameters AND their Adam
``mu``/``nu`` moments on every chip — 3× the model bytes per chip of HBM
spent on redundant copies. ZeRO partitions that redundancy over the data
axis instead:

* ``zero1`` — Adam moments shard over ``"data"`` (largest divisible dim,
  ZeRO stage 1). XLA's SPMD partitioner turns the moment update into a
  per-shard update of the local slice and all-gathers only the parameter
  *delta*; per-chip optimizer memory drops by the data-axis size.
* ``fsdp`` — parameters shard the same way (ZeRO stage 3 / FSDP).
  Parameters are all-gathered at their use sites in forward/backward and
  gradients reduce-scatter back to the owning shard; per-chip weight +
  moment memory drops by the data-axis size.

Design: pure GSPMD annotations, mirroring ``parallel/tp.py`` — leaves are
*placed* with :class:`~jax.sharding.NamedSharding` and the jitted train
step is unchanged except for one ``with_sharding_constraint`` at the end
of ``TrainState.apply_gradients`` (``TrainState.constrain``), which pins
the updated state to its input shardings so XLA cannot drift the layout
between steps (donated buffers then round-trip shard-for-shard). No
hand-written collectives.

Composes with tensor parallelism: on a 2-D ``(data, model)`` mesh, leaves
matched by ``tp.MODEL_AXIS_RULES`` keep their model-axis placement and
ZeRO shards the remaining replicated leaves over ``"data"``. Leaves whose
dims don't divide the axis (or that are smaller than ``min_elems``, where
gather latency would beat the bytes saved) stay replicated — one rule set
stays correct for every backbone × head in the zoo.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tp import MODEL_AXIS_RULES, _leaf_path, spec_for_path

__all__ = [
    "ZERO_MODES",
    "zero_spec",
    "zero_state_shardings",
    "shard_state_zero",
    "make_constrain_fn",
]

_DATA = "data"
_MODEL = "model"

ZERO_MODES = ("none", "zero1", "fsdp")

#: Leaves smaller than this stay replicated: gathering a few-KB bias per
#: step costs more ICI latency than the bytes it frees.
MIN_ELEMS = 2 ** 12


def zero_spec(shape: Tuple[int, ...], n: int,
              min_elems: int = MIN_ELEMS) -> P:
    """Shard the largest dimension divisible by ``n`` over ``"data"``.

    The largest dim gives the most even byte split and, for conv kernels
    (kh, kw, cin, cout) and dense kernels (cin, cout), lands on a channel
    dim — the same dim FSDP implementations conventionally split. Returns
    a replicated spec when nothing divides or the leaf is too small.
    """
    if int(np.prod(shape, dtype=np.int64)) < min_elems:
        return P()
    best = -1
    for i, d in enumerate(shape):
        if d % n == 0 and d > 0 and (best < 0 or d > shape[best]):
            best = i
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = _DATA
    return P(*spec)


def _is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray, jax.numpy.ndarray))


def _leaf_spec(kp, x, n_data: int, tp_size: int, zero_this_tree: bool) -> P:
    """One leaf's spec: tp rule first (moments shard like their params),
    then the ZeRO data-axis split for trees the mode covers."""
    if not _is_array(x):
        return P()
    shape = tuple(np.shape(x))
    if tp_size > 1:
        spec = spec_for_path(_leaf_path(kp), shape, tp_size)
        if spec != P():
            return spec
    if zero_this_tree and n_data > 1:
        return zero_spec(shape, n_data)
    return P()


def zero_state_shardings(state, mesh: Mesh, mode: str = "zero1"):
    """A ``TrainState``-shaped tree of :class:`NamedSharding` applying the
    ZeRO ``mode`` over ``mesh`` (non-array leaves get the replicated
    sharding, keeping the tree structure identical to ``state``'s).

    ``opt_state`` leaves shard over ``"data"`` in both modes; ``params``
    additionally shard under ``"fsdp"``. ``batch_stats`` and ``step`` stay
    replicated (running stats are tiny and mutated inside the model).
    """
    if mode not in ZERO_MODES:
        raise ValueError(f"mode={mode!r} not in {ZERO_MODES}")
    n_data = mesh.shape[_DATA] if _DATA in mesh.axis_names else 1
    tp_size = mesh.shape[_MODEL] if _MODEL in mesh.axis_names else 1

    def tree_shardings(tree, zero_this_tree):
        def leaf(kp, x):
            spec = _leaf_spec(kp, x, n_data, tp_size,
                              zero_this_tree and mode != "none")
            return NamedSharding(mesh, spec)

        return jax.tree_util.tree_map_with_path(leaf, tree)

    return state.replace(
        step=NamedSharding(mesh, P()),
        params=tree_shardings(state.params, mode == "fsdp"),
        batch_stats=tree_shardings(state.batch_stats, False),
        opt_state=tree_shardings(state.opt_state, True),
    )


def shard_state_zero(state, mesh: Mesh, mode: str = "zero1"):
    """Place every array leaf of a train state onto ``mesh`` under the
    ZeRO ``mode`` and attach the matching ``constrain`` fn (applied by
    ``TrainState.apply_gradients`` so updated leaves keep their layout).

    Placement goes through ``mesh.place_leaf`` (multi-host safe, shared
    with ``tp.shard_state`` and ``Trainer._replicate_state``).
    """
    from .mesh import place_leaf

    shardings = zero_state_shardings(state, mesh, mode)
    placed = jax.tree_util.tree_map(place_leaf, state, shardings)
    return placed.replace(constrain=make_constrain_fn(shardings))


def make_constrain_fn(shardings):
    """``state -> state`` pinning ``params``/``opt_state`` to their
    placement shardings inside jit (used at the end of
    ``apply_gradients``); keeps XLA from drifting donated-state layouts
    across steps."""
    param_sh = shardings.params
    opt_sh = shardings.opt_state

    def constrain(state):
        return state.replace(
            params=jax.lax.with_sharding_constraint(state.params, param_sh),
            opt_state=jax.lax.with_sharding_constraint(state.opt_state,
                                                       opt_sh),
        )

    return constrain
