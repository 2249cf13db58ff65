"""Tensor-parallel (model-axis) sharding tests — parallel/tp.py.

Runs on the virtual 8-device CPU mesh (conftest). The reference has no
distribution at all (SURVEY §2.6); the bar here is self-consistency: the
sharded program computes the same loss/gradients as the single-device one,
and the wide parameters (DeepTEN's K·D BatchNorm+fc — SURVEY §7 hard part
#4) are actually split across the model axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from neighbour_feature_pooling_tpu.models import get_model
from neighbour_feature_pooling_tpu.parallel import (
    create_tp_mesh,
    data_sharding,
    has_model_axis,
    shard_state,
    spec_for_path,
    state_shardings,
)
from neighbour_feature_pooling_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from neighbour_feature_pooling_tpu.train.engine import train_step_body

NUM_CLASSES = 4


def _batch(b=8, img=16, channels=3, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.standard_normal((b, img, img, channels)).astype(np.float32),
        "label": (np.arange(b) % NUM_CLASSES).astype(np.int32),
        "weight": np.ones((b,), np.float32),
    }


def _state(model, batch, lr=1e-3):
    return create_train_state(model, jax.random.PRNGKey(0),
                              {"image": jnp.asarray(batch["image"])}, lr)


def _grads(state, batch, num_classes=NUM_CLASSES):
    def loss_fn(params):
        logits, _ = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], train=True,
            rngs={"dropout": jax.random.PRNGKey(7)},
            mutable=["batch_stats"])
        from neighbour_feature_pooling_tpu.train.engine import (
            cross_entropy_loss)
        return cross_entropy_loss(logits, batch["label"], batch["weight"])

    return jax.jit(jax.value_and_grad(loss_fn))(state.params)


class TestSpecRules:
    def test_fc_row_parallel(self):
        assert spec_for_path("fc/kernel", (512, 21), 4) == P("model", None)
        assert spec_for_path("fc/bias", (21,), 4) == P()

    def test_nested_fc_path(self):
        assert spec_for_path("head/fc/kernel", (512, 21), 2) == P("model", None)
        # but not a suffix inside another token
        assert spec_for_path("myfc/kernel", (512, 21), 2) == P()

    def test_indivisible_falls_back(self):
        assert spec_for_path("fc/kernel", (510, 21), 4) == P()
        # ViT-Tiny attention: 3 heads never divide by 2
        assert spec_for_path(
            "backbone/block_0/attn/query/kernel", (192, 3, 64), 2) == P()

    def test_rank_mismatch_falls_back(self):
        assert spec_for_path("fc/kernel", (8, 512, 21), 4) == P()

    def test_deepten_rules(self):
        assert spec_for_path("encoding/codewords", (32, 512), 8) == P("model", None)
        assert spec_for_path("encoding/scale", (32,), 8) == P("model")
        assert spec_for_path("encoding/bn/mean", (16384,), 8) == P("model")

    def test_vit_mlp_rules(self):
        assert spec_for_path("backbone/block_3/mlp/fc1/kernel",
                             (192, 768), 4) == P(None, "model")
        assert spec_for_path("backbone/block_3/mlp/fc2/kernel",
                             (768, 192), 4) == P("model", None)

    def test_create_tp_mesh_validates(self):
        with pytest.raises(ValueError):
            create_tp_mesh(3)  # 8 devices % 3
        mesh = create_tp_mesh(4)
        assert dict(mesh.shape) == {"data": 2, "model": 4}
        assert has_model_axis(mesh)
        assert not has_model_axis(None)
        assert not has_model_axis(create_tp_mesh(1))


class TestDeepTENTensorParallel:
    """ResNet18 + texture_deepten: the wide-head flagship for TP."""

    @pytest.fixture(scope="class")
    def setup(self):
        model = get_model("resnet18", "texture_deepten", NUM_CLASSES)
        batch = _batch()
        state = _state(model, batch)
        return model, batch, state

    def test_params_and_moments_sharded(self, setup):
        _, batch, state = setup
        mesh = create_tp_mesh(4)
        stp = shard_state(state, mesh)
        fk = stp.params["fc"]["kernel"]
        assert fk.sharding.spec == P("model", None)
        assert fk.addressable_shards[0].data.shape[0] == fk.shape[0] // 4
        # Adam moments shard exactly like their parameters
        assert (stp.opt_state[0].mu["fc"]["kernel"].sharding.spec
                == P("model", None))
        assert (stp.opt_state[0].nu["encoding"]["codewords"].sharding.spec
                == P("model", None))
        # batch_stats of the K·D BatchNorm
        assert stp.batch_stats["encoding"]["bn"]["mean"].sharding.spec == P("model")
        # backbone convs stay replicated
        assert jax.tree_util.tree_leaves(
            state_shardings(stp.params["backbone"], mesh))[0].spec == P()

    def test_loss_and_grads_match_single_device(self, setup):
        _, batch, state = setup
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        loss1, grads1 = _grads(state, jb)

        mesh = create_tp_mesh(4)
        stp = shard_state(state, mesh)
        sb = {k: jax.device_put(jnp.asarray(v), data_sharding(mesh))
              for k, v in batch.items()}
        loss2, grads2 = _grads(stp, sb)
        assert abs(float(loss1) - float(loss2)) < 1e-5
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(grads1), jax.device_get(grads2))
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4

    def test_train_step_preserves_model_sharding(self, setup):
        _, batch, state = setup
        mesh = create_tp_mesh(4)
        stp = shard_state(state, mesh)
        sb = {k: jax.device_put(jnp.asarray(v), data_sharding(mesh))
              for k, v in batch.items()}
        step = make_train_step(NUM_CLASSES)
        s2, loss, cm = step(stp, sb, jax.random.PRNGKey(1), frozen=False)
        assert np.isfinite(float(loss))
        fk = s2.params["fc"]["kernel"]
        # the updated fc kernel is still split along the model axis
        assert fk.addressable_shards[0].data.shape[0] == fk.shape[0] // 4
        mu = s2.opt_state[0].mu["fc"]["kernel"]
        assert mu.addressable_shards[0].data.shape[0] == mu.shape[0] // 4

    def test_eval_step_under_tp(self, setup):
        _, batch, state = setup
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        eval_step = make_eval_step(NUM_CLASSES)
        loss1, w1, cm1, _ = eval_step(state, jb)

        mesh = create_tp_mesh(2)
        stp = shard_state(state, mesh)
        sb = {k: jax.device_put(v, data_sharding(mesh)) for k, v in jb.items()}
        loss2, w2, cm2, _ = eval_step(stp, sb)
        assert abs(float(loss1) - float(loss2)) < 1e-5
        assert float(w1) == float(w2)
        np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm2))


class TestPureTPNoDataAxis:
    """model=8, data=1: every collective is a model-axis psum."""

    def test_gap_only_fc_row_parallel(self):
        model = get_model("resnet18", "gap_only", NUM_CLASSES)
        batch = _batch(b=4)
        state = _state(model, batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        loss1, grads1 = _grads(state, jb)

        mesh = create_tp_mesh(8)
        stp = shard_state(state, mesh)
        sb = {k: jax.device_put(v, data_sharding(mesh)) for k, v in jb.items()}
        loss2, grads2 = _grads(stp, sb)
        assert abs(float(loss1) - float(loss2)) < 1e-5
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(grads1), jax.device_get(grads2))
        assert max(jax.tree_util.tree_leaves(d)) < 1e-4


class TestViTMlpTensorParallel:
    def test_vit_mlp_sharded_and_consistent(self):
        model = get_model("vittiny", "gap_only", NUM_CLASSES)
        batch = _batch(b=4, img=32)
        state = _state(model, batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        loss1, grads1 = _grads(state, jb)

        mesh = create_tp_mesh(4)
        stp = shard_state(state, mesh)
        fc1 = stp.params["backbone"]["block_0"]["mlp"]["fc1"]["kernel"]
        assert fc1.sharding.spec == P(None, "model")
        assert fc1.addressable_shards[0].data.shape[1] == fc1.shape[1] // 4
        # ViT-Tiny has 3 attention heads: the attention rules must have
        # fallen back to replication rather than erroring
        q = stp.params["backbone"]["block_0"]["attn"]["query"]["kernel"]
        assert q.sharding.spec == P()

        sb = {k: jax.device_put(v, data_sharding(mesh)) for k, v in jb.items()}
        loss2, grads2 = _grads(stp, sb)
        assert abs(float(loss1) - float(loss2)) < 1e-4
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(grads1), jax.device_get(grads2))
        assert max(jax.tree_util.tree_leaves(d)) < 2e-4


class TestMultiStageNFPTensorParallel:
    """nfp_proj column-parallel chains into the row-parallel fc, with the
    Pallas NFP op's custom_partitioning active under the 2-D mesh."""

    def test_multi_stage_nfp_tp(self):
        model = get_model("mobilenetv3", "multi_stage_nfp", NUM_CLASSES)
        batch = _batch(b=4, img=32)
        state = _state(model, batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        loss1, grads1 = _grads(state, jb)

        mesh = create_tp_mesh(2)
        stp = shard_state(state, mesh)
        assert stp.params["nfp_proj"]["kernel"].sharding.spec == P(None, "model")
        assert stp.params["fc"]["kernel"].sharding.spec == P("model", None)
        sb = {k: jax.device_put(v, data_sharding(mesh)) for k, v in jb.items()}
        loss2, grads2 = _grads(stp, sb)
        assert abs(float(loss1) - float(loss2)) < 1e-5
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(grads1), jax.device_get(grads2))
        assert max(jax.tree_util.tree_leaves(d)) < 2e-4
