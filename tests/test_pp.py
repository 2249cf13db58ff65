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


# NOTE: full-suite runs once segfaulted the XLA:CPU compiler building this
# module's first shard_map/ppermute program with ~500 tests' executables
# resident (round 4, commit 68e1c34). The jax.clear_caches() mitigation now
# lives in conftest.py::_fresh_caches_before_shard_heavy and covers every
# shard_map-compiling module, order-independently.

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


# ------------------------------------------------- trainer/CLI integration


def test_make_pipeline_apply_matches_model_apply():
    """The interceptor-based apply (the Trainer's --pipeline path) equals
    the stock TextureModel apply for logits AND gradients, on any ViT
    variant."""
    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.parallel import make_pipeline_apply

    model = get_model("vittiny", "gap_only", 3)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((8, 32, 32, 3)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    mesh = create_pp_mesh(4)
    apply_fn = make_pipeline_apply(model, mesh, num_microbatches=4)

    want = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    got = jax.jit(lambda v, x: apply_fn(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss(fn):
        def f(p, x):
            out = fn({"params": p}, x, train=False)
            return jnp.sum(out ** 2)
        return f

    g_want = jax.jit(jax.grad(loss(model.apply)))(v["params"], x)
    g_got = jax.jit(jax.grad(loss(apply_fn)))(v["params"], x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4), g_want, g_got)


def test_make_pipeline_apply_indivisible_batch_falls_back():
    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.parallel import make_pipeline_apply

    model = get_model("vittiny", "gap_only", 3)
    x = jnp.zeros((6, 32, 32, 3), jnp.float32)  # 6 % 4 != 0
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    apply_fn = make_pipeline_apply(model, create_pp_mesh(4), 4)
    out = apply_fn(v, x, train=False)  # sequential fallback, no raise
    assert out.shape == (6, 3)


def test_trainer_rejects_pipeline_misuse(tmp_path):
    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import Trainer, TrainerConfig

    cfg = TrainerConfig(learning_rate=1e-3, max_epochs=1, patience=3,
                        log_dir=str(tmp_path / "l"),
                        ckpt_dir=str(tmp_path / "c"))
    mesh = create_pp_mesh(4)
    with pytest.raises(ValueError, match="vittiny"):
        Trainer(get_model("resnet18", "gap_only", 2), 2, cfg,
                mesh=mesh, pp_microbatches=4)
    with pytest.raises(ValueError, match="mesh"):
        Trainer(get_model("vittiny", "gap_only", 2), 2, cfg,
                pp_microbatches=4)
    with pytest.raises(ValueError, match="zero"):
        Trainer(get_model("vittiny", "gap_only", 2), 2, cfg,
                mesh=mesh, zero="zero1", pp_microbatches=4)
    # stages must divide the ViT depth (12): 8 stages would silently
    # train unpipelined before the eager check existed (round-4 ADVICE)
    with pytest.raises(ValueError, match="divide the ViT depth"):
        Trainer(get_model("vittiny", "gap_only", 2), 2, cfg,
                mesh=create_pp_mesh(8), pp_microbatches=4)


def test_make_pipeline_apply_depth_mismatch_raises():
    """depth % stages != 0 is a config error → raise at trace time, not a
    silent sequential fallback (that is reserved for batch%microbatches)."""
    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.parallel import make_pipeline_apply

    model = get_model("vittiny", "gap_only", 3)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    apply_fn = make_pipeline_apply(model, create_pp_mesh(8), 4)
    with pytest.raises(ValueError, match="divide the ViT depth"):
        apply_fn(v, x, train=False)


def test_cli_pipeline_e2e(tmp_path, monkeypatch, capsys):
    """--pipeline 4 trains a ViT under (data=2, pipe=4) on the virtual
    mesh through the stock CLI/Trainer path (round-3 VERDICT #3)."""
    from neighbour_feature_pooling_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    main(["--dataset", "synthetic", "--model_type", "vittiny",
          "--model_variant", "gap_only", "--input_size", "32",
          "--batch_size", "16", "--num_samples", "32", "--max_epochs", "1",
          "--seeds", "7", "--learning_rate", "1e-3",
          "--pipeline", "4", "--pp_microbatches", "8"])
    out = capsys.readouterr().out
    assert "Final Test Accuracy" in out
    assert (tmp_path / "checkpoints" / "synthetic").exists()


def test_cli_pipeline_rejects_non_vit(tmp_path, monkeypatch):
    from neighbour_feature_pooling_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="vittiny"):
        main(["--dataset", "synthetic", "--model_type", "resnet18",
              "--model_variant", "gap_only", "--input_size", "24",
              "--batch_size", "16", "--max_epochs", "1", "--seeds", "7",
              "--pipeline", "4"])
