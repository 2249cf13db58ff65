"""Pipeline-parallelism tests — parallel/pp.py.

Runs on the virtual 8-device CPU mesh (conftest). The reference has no
distribution (SURVEY §2.6); the bar is self-consistency: the GPipe-
scheduled encoder computes the same tokens/gradients as the stock ViT,
stage weights are actually split across the pipe axis, and the runner
composes with a data axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neighbour_feature_pooling_tpu.models.backbones.vit import ViT
from neighbour_feature_pooling_tpu.parallel import (
    create_pp_mesh,
    make_vit_pipeline_forward,
    shard_stacked_params,
    stack_block_params,
)


def _vit_and_input(depth=8, b=8, img=64, seed=0):
    vit = ViT(depth=depth)
    x = jnp.asarray(np.random.default_rng(seed)
                    .standard_normal((b, img, img, 3)).astype(np.float32))
    v = vit.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return vit, v, x


def test_create_pp_mesh_validates():
    with pytest.raises(ValueError):
        create_pp_mesh(3)  # 8 % 3
    mesh = create_pp_mesh(4)
    assert dict(mesh.shape) == {"data": 2, "pipe": 4}


def test_stack_block_params_shape():
    vit, v, _ = _vit_and_input(depth=4)
    stacked = stack_block_params(v["params"], 4)
    k = stacked["mlp"]["fc1"]["kernel"]
    assert k.shape[0] == 4


@pytest.mark.parametrize("stages,micro", [(4, 4), (2, 8), (8, 8)])
def test_pipeline_matches_stock_forward(stages, micro):
    vit, v, x = _vit_and_input()
    want = jax.jit(lambda v, x: vit.apply(v, x, train=False))(v, x)
    mesh = create_pp_mesh(stages)
    fwd = jax.jit(make_vit_pipeline_forward(vit, mesh, micro))
    got = fwd(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_pipeline_gradients_match():
    vit, v, x = _vit_and_input()
    mesh = create_pp_mesh(4)
    fwd = make_vit_pipeline_forward(vit, mesh, 4)
    g1 = jax.jit(jax.grad(lambda v: (fwd(v, x) ** 2).mean()))(v)
    g2 = jax.jit(jax.grad(
        lambda v: (vit.apply(v, x, train=False) ** 2).mean()))(v)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(g1), jax.device_get(g2))
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5


def test_stage_weights_are_split():
    """Each pipe shard holds only depth/stages blocks' weights — the point
    of pipelining: per-chip weight memory drops by the stage count."""
    vit, v, x = _vit_and_input()
    mesh = create_pp_mesh(4)
    sp = shard_stacked_params(v, vit, mesh)
    k = sp["mlp"]["fc1"]["kernel"]
    assert k.shape[:2] == (4, 2)  # (stages, depth/stages)
    # dim 0 (stages) is actually split over the pipe axis
    assert k.addressable_shards[0].data.shape[0] == 1
    assert k.sharding.spec[0] == "pipe"

    # the runner consumes the pre-sharded weights: the block copies inside
    # `variables` are unused — forward parity holds even with them stripped
    stripped = {"params": {kk: vv for kk, vv in v["params"].items()
                           if not kk.startswith("block_")}}
    fwd = jax.jit(make_vit_pipeline_forward(vit, mesh, 4,
                                            stacked_params=sp))
    want = jax.jit(lambda v, x: vit.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(fwd(stripped, x)),
                               np.asarray(want), atol=2e-5)
    hlo = fwd.lower(stripped, x).compile().as_text()
    assert "collective-permute" in hlo  # stage hops ride ppermute


def test_pipeline_microbatch_validation():
    vit, v, x = _vit_and_input(b=6)
    mesh = create_pp_mesh(4)
    with pytest.raises(ValueError):
        jax.jit(make_vit_pipeline_forward(vit, mesh, 4))(v, x)
    with pytest.raises(ValueError):
        # depth 8 cannot split into 3 stages — but 3 doesn't divide 8
        # devices either, so build the mesh by hand
        make_vit_pipeline_forward(
            ViT(depth=8), Mesh(np.array(jax.devices()[:6]).reshape(2, 3),
                               ("data", "pipe")), 4)


def test_pipeline_with_data_sharded_input():
    """dp × pp: batch rows sharded over "data" while stages shard over
    "pipe"; output parity holds and the result carries the data axis."""
    vit, v, x = _vit_and_input()
    mesh = create_pp_mesh(4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    fwd = jax.jit(make_vit_pipeline_forward(vit, mesh, 4))
    want = jax.jit(lambda v, x: vit.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(fwd(v, xs)), np.asarray(want),
                               atol=2e-5)
