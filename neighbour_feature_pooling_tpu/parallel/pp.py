"""GPipe-style pipeline parallelism over the ViT encoder.

The reference never distributes (SURVEY §2.6, one GPU); this is TPU-native
capability. The ViT's ``depth`` homogeneous pre-norm blocks
(``models/backbones/vit.py``) are the textbook pipeline target: their
parameters stack into one ``(depth, ...)`` tree, reshaped to
``(stages, blocks_per_stage, ...)`` and sharded over a ``"pipe"`` mesh axis
so each chip holds only ``depth/stages`` blocks' weights. ``shard_map``
runs the classic GPipe schedule: M microbatches flow through P stages in
``M + P − 1`` ticks, each tick applying one stage's blocks (a
``lax.scan`` over its stacked block params) and hopping the activation to
the next stage over ICI with ``lax.ppermute``. The patch embedding and
final LayerNorm run replicated outside the pipe, reusing the SAME module
methods (``ViT.embed`` / ``ViT.finalize``) — no duplicated model math.

Composes with data parallelism: on a 2-D ``(data, pipe)`` mesh the
within-microbatch rows shard over ``"data"`` while stages shard over
``"pipe"``. Fully differentiable (``ppermute``/``scan`` have transposes),
so the same runner serves training.

For real weight-memory savings pass ``stacked_params=``
``shard_stacked_params(variables, vit, mesh)``: the block weights then
live pipe-sharded on device and the copies inside ``variables`` are
unused (strip them to reclaim the HBM). Without it the runner stacks the
replicated ``variables`` inside jit — numerically identical, zero-setup,
but every chip materializes all blocks once as scratch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.backbones.vit import EncoderBlock, ViT

try:  # jax>=0.6 exposes shard_map at the top level (0.8 as the function)
    from jax import shard_map  # type: ignore

    if not callable(shard_map):  # a module on some versions
        shard_map = shard_map.shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = [
    "create_pp_mesh",
    "stack_block_params",
    "shard_stacked_params",
    "make_vit_pipeline_forward",
    "make_pipeline_apply",
]

_PIPE = "pipe"


def create_pp_mesh(stages: int,
                   devices: Optional[Sequence[jax.Device]] = None,
                   axis_names: Tuple[str, str] = ("data", _PIPE)) -> Mesh:
    """2-D ``(data, pipe)`` mesh; ``stages`` must divide the device count."""
    devices = list(devices) if devices is not None else jax.devices()
    if stages <= 0 or len(devices) % stages:
        raise ValueError(f"stages={stages} must divide the device count "
                         f"({len(devices)})")
    grid = np.asarray(devices).reshape(len(devices) // stages, stages)
    return Mesh(grid, axis_names)


def stack_block_params(params, depth: int):
    """Stack ``block_0..block_{depth-1}`` param trees into one tree whose
    leaves carry a leading ``depth`` axis (they are homogeneous)."""
    blocks = [params[f"block_{i}"] for i in range(depth)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def _split_stages(stacked, n_stages: int):
    """Reshape a ``(depth, ...)`` stacked tree to ``(stages, depth/stages,
    ...)``."""
    return jax.tree_util.tree_map(
        lambda a: a.reshape((n_stages, a.shape[0] // n_stages)
                            + a.shape[1:]), stacked)


def shard_stacked_params(variables, vit: ViT, mesh: Mesh,
                         pipe_axis: str = _PIPE):
    """Pre-stack the encoder block params and PLACE them pipe-sharded:
    a ``(stages, depth/stages, ...)`` tree with dim 0 split over
    ``mesh[pipe_axis]`` — each chip holds only its own stage's block
    weights, the point of pipelining. Pass the result to
    ``make_vit_pipeline_forward(stacked_params=...)``; the block copies
    inside ``variables`` are then unused and may be stripped."""
    n_stages = mesh.shape[pipe_axis]
    if vit.depth % n_stages:
        raise ValueError(f"depth {vit.depth} must divide into "
                         f"{n_stages} pipeline stages")
    stacked = _split_stages(stack_block_params(variables["params"],
                                               vit.depth), n_stages)
    rank_sh = {}

    def put(a):
        sh = rank_sh.setdefault(
            a.ndim, NamedSharding(mesh, P(pipe_axis,
                                          *([None] * (a.ndim - 1)))))
        return jax.device_put(a, sh)

    return jax.tree_util.tree_map(put, stacked)


def _pipeline_encode(block, mesh: Mesh, tokens, n_valid: int,
                     num_microbatches: int, data_axis: Optional[str],
                     pipe_axis: str, stacked):
    """Run ``tokens (B, T, D)`` through pipe-staged encoder blocks via the
    GPipe shard_map schedule. ``stacked`` is the ``(stages, per_stage, ...)``
    block-param tree; numerically equal to applying the blocks in sequence."""
    n_stages = mesh.shape[pipe_axis]
    m = num_microbatches
    b, t, d = tokens.shape
    mb = b // m
    xmb = tokens.reshape(m, mb, t, d)
    # within-microbatch rows shard over the data axis only when they
    # divide it; otherwise run the rows replicated (pipe still shards)
    da = data_axis if (data_axis and data_axis in mesh.axis_names
                       and mb % mesh.shape[data_axis] == 0) else None

    def apply_stage(sp, y):
        def body(yy, bp):
            return block.apply({"params": bp}, yy, n_valid), None

        y, _ = jax.lax.scan(body, y, sp)
        return y

    def pipe(sp, xloc):
        # sp: (1, per_stage, ...) this stage's blocks
        # xloc: (m, mb_local, t, d) every microbatch, data-sharded rows
        sp = jax.tree_util.tree_map(lambda a: a[0], sp)
        idx = jax.lax.axis_index(pipe_axis)

        def tick(y, step):
            # stage 0 injects microbatch `step`; later ticks clip to the
            # last one — its outputs fall in the drain bubble and are
            # never read
            inj = jax.lax.dynamic_index_in_dim(
                xloc, jnp.clip(step, 0, m - 1), 0, keepdims=False)
            y = jnp.where(idx == 0, inj, y)
            y = apply_stage(sp, y)
            out_t = y
            if n_stages > 1:
                y = jax.lax.ppermute(
                    y, pipe_axis,
                    [(i, i + 1) for i in range(n_stages - 1)])
            return y, out_t

        _, outs = jax.lax.scan(tick, jnp.zeros_like(xloc[0]),
                               jnp.arange(m + n_stages - 1))
        # on the last stage, outs[step] is microbatch step-(P-1)'s
        # result; earlier stages' slices are pipeline scratch. Mask +
        # psum replicates the real m slices to every pipe shard, so
        # the output carries no dead slabs (P·m -> m microbatches).
        outs = outs[n_stages - 1:]
        if n_stages > 1:
            outs = jnp.where(idx == n_stages - 1, outs,
                             jnp.zeros_like(outs))
            outs = jax.lax.psum(outs, pipe_axis)
        return outs

    xspec = P(None, da) if da else P()
    out = shard_map(
        pipe, mesh=mesh,
        in_specs=(P(pipe_axis), xspec),
        out_specs=xspec,
        check_vma=False,
    )(stacked, xmb)
    return out.reshape(b, t, d)


def make_vit_pipeline_forward(vit: ViT, mesh: Mesh, num_microbatches: int,
                              data_axis: Optional[str] = "data",
                              pipe_axis: str = _PIPE,
                              stacked_params=None):
    """Build ``fn(variables, x) -> tokens`` running ``vit``'s encoder as a
    GPipe pipeline over ``mesh[pipe_axis]``; numerically equal to
    ``vit.apply(variables, x)``.

    ``num_microbatches`` must divide the batch; the pipeline bubble is the
    usual ``(P−1)/(M+P−1)``, so pick M ≥ ~4·P for throughput. Differentiable
    end to end. ``stacked_params`` (from ``shard_stacked_params``) supplies
    pipe-sharded block weights; without it they are stacked from
    ``variables`` inside jit (replicated).
    """
    n_stages = mesh.shape[pipe_axis]
    if vit.depth % n_stages:
        raise ValueError(f"depth {vit.depth} must divide into "
                         f"{n_stages} pipeline stages")
    if data_axis is not None and data_axis not in mesh.axis_names:
        data_axis = None
    block = EncoderBlock(vit.num_heads, vit.mlp_ratio, vit.dtype,
                         vit.fused_attn)
    m = num_microbatches

    def forward(variables, x):
        tokens, n_valid = vit.apply(variables, x, method="embed")
        b = tokens.shape[0]
        if b % m:
            raise ValueError(f"batch {b} % microbatches {m} != 0")
        if stacked_params is None:
            stacked = _split_stages(
                stack_block_params(variables["params"], vit.depth),
                n_stages)
        else:
            stacked = stacked_params
        enc = _pipeline_encode(block, mesh, tokens, n_valid, m, data_axis,
                               pipe_axis, stacked)
        return vit.apply(variables, enc, n_valid, method="finalize")

    return forward


def make_pipeline_apply(model, mesh: Mesh, num_microbatches: int,
                        data_axis: Optional[str] = "data",
                        pipe_axis: str = _PIPE):
    """``model.apply``-compatible callable that runs the model's ViT
    backbone encoder as a GPipe pipeline over ``mesh[pipe_axis]`` — the
    Trainer/CLI integration of this module (``--pipeline N``).

    Works for ANY ``TextureModel`` variant whose backbone is the ViT
    (``models/zoo.py``): a flax method interceptor (the same mechanism the
    int8 PTQ tier uses, ``quant.py``) swaps ``ViT.encode`` — the
    sequential loop over the ``depth`` homogeneous blocks — for the
    pipe-staged shard_map schedule, while embed/finalize/heads/classifier
    run unchanged (replicated, data-sharded batch). Numerically equal to
    the stock apply and differentiable, so the jitted train/eval steps
    consume it as a drop-in ``state.apply_fn``.

    Batches whose global size does not divide ``num_microbatches`` fall
    back to the sequential encoder for that call (numerically identical;
    a trace-time message is printed once per shape).
    """
    import flax.linen as fnn

    n_stages = mesh.shape[pipe_axis]

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if not isinstance(mod, ViT) or context.method_name != "encode":
            return next_fun(*args, **kwargs)
        tokens = args[0]
        n_valid = args[1] if len(args) > 1 else kwargs.get("n_valid", 0)
        b = tokens.shape[0]
        if mod.depth % n_stages:
            # a depth/stage mismatch is a configuration error, not a
            # per-shape condition — raising here (trace time) keeps the
            # run from silently training unpipelined (Trainer.__init__
            # also checks this eagerly for the CLI path)
            raise ValueError(f"pipeline stages {n_stages} must divide "
                             f"the ViT depth ({mod.depth})")
        if b % num_microbatches:
            print(f"pipeline: batch {b} % microbatches {num_microbatches}"
                  f" != 0 — sequential encoder for this shape")
            return next_fun(*args, **kwargs)
        params = mod.variables["params"]
        stacked = _split_stages(stack_block_params(params, mod.depth),
                                n_stages)
        # parent=None: constructed inside a live module context (the
        # interceptor runs within apply), so detach it explicitly — it is
        # a pure-function applier over explicit stage params, not a
        # submodule of the intercepted ViT
        block = EncoderBlock(mod.num_heads, mod.mlp_ratio, mod.dtype,
                             mod.fused_attn, parent=None)
        return _pipeline_encode(block, mesh, tokens, n_valid,
                                num_microbatches, data_axis, pipe_axis,
                                stacked)

    def apply_fn(variables, *args, **kwargs):
        with fnn.intercept_methods(interceptor):
            return model.apply(variables, *args, **kwargs)

    return apply_fn
