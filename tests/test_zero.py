"""ZeRO-1 / FSDP sharding tests — parallel/zero.py.

Runs on the virtual 8-device CPU mesh (conftest). The reference has no
distribution at all (SURVEY §2.6); the bar is self-consistency: training
with data-axis-sharded optimizer state (and, under fsdp, parameters)
computes the same losses and updated parameters as replicated data
parallelism, while per-chip state bytes actually drop by the data-axis
size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from neighbour_feature_pooling_tpu.models import get_model
from neighbour_feature_pooling_tpu.parallel import (
    create_mesh,
    create_tp_mesh,
    data_sharding,
    shard_state_zero,
    zero_spec,
    zero_state_shardings,
)
from neighbour_feature_pooling_tpu.train import (
    create_train_state,
    make_train_step,
)

NUM_CLASSES = 4


def _batch(b=8, img=16, channels=3, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.standard_normal((b, img, img, channels)).astype(
            np.float32),
        "label": (np.arange(b) % NUM_CLASSES).astype(np.int32),
        "weight": np.ones((b,), np.float32),
    }


def _state(model, batch, lr=1e-3):
    return create_train_state(model, jax.random.PRNGKey(0),
                              {"image": jnp.asarray(batch["image"])}, lr)


def _shard_bytes(x):
    return int(np.prod(x.addressable_shards[0].data.shape, dtype=np.int64))


class TestZeroSpec:
    def test_largest_divisible_dim(self):
        assert zero_spec((3, 3, 128, 256), 8) == P(None, None, None, "data")
        assert zero_spec((512, 256), 8) == P("data", None)

    def test_small_leaves_replicated(self):
        assert zero_spec((64,), 8) == P()  # < MIN_ELEMS
        assert zero_spec((3, 3, 3, 8), 8) == P()

    def test_indivisible_falls_back(self):
        assert zero_spec((63, 65), 8, min_elems=1) == P()

    def test_mode_validated(self):
        model = get_model("resnet18", "gap_only", NUM_CLASSES)
        batch = _batch(b=4)
        state = _state(model, batch)
        with pytest.raises(ValueError):
            zero_state_shardings(state, create_mesh(), "zero2")


class TestZero1:
    @pytest.fixture(scope="class")
    def setup(self):
        model = get_model("resnet18", "texture_nfp", NUM_CLASSES)
        batch = _batch(img=32)
        state = _state(model, batch)
        return model, batch, state

    def test_moments_sharded_params_replicated(self, setup):
        _, batch, state = setup
        mesh = create_mesh()
        sz = shard_state_zero(state, mesh, "zero1")
        mu = sz.opt_state[0].mu["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert "data" in tuple(mu.sharding.spec)  # sharded somewhere
        assert _shard_bytes(mu) == int(np.prod(mu.shape)) // 8
        pk = sz.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert pk.sharding.spec == P()
        # total optimizer bytes per chip drop ~8x for the big leaves
        assert sz.constrain is not None

    def test_train_steps_match_replicated(self, setup):
        _, batch, state = setup
        mesh = create_mesh()
        step = make_train_step(NUM_CLASSES)
        sb = {k: jax.device_put(jnp.asarray(v), data_sharding(mesh))
              for k, v in batch.items()}

        from neighbour_feature_pooling_tpu.parallel import (
            replicated_sharding)
        rep = replicated_sharding(mesh)
        # host round-trip: device_put(x, rep) would REUSE x's device-0
        # buffer as one replica shard, and the donated train step would
        # then delete the fixture state's buffers with it
        s_rep = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), rep) if isinstance(
                x, (jax.Array, np.ndarray)) else x, state)
        s_z = shard_state_zero(state, mesh, "zero1")

        rng = jax.random.PRNGKey(1)
        for i in range(3):
            s_rep, l1, _ = step(s_rep, sb, rng, frozen=False)
            s_z, l2, _ = step(s_z, sb, rng, frozen=False)
            assert abs(float(l1) - float(l2)) < 1e-5, i
        # params: the sharded program reduces gradients in a different
        # order (reduce-scatter vs all-reduce) and Adam's sign-like first
        # updates amplify that noise — same caveat as the 1-vs-8-device
        # test in test_sharding.py; losses above are the exact check
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(s_rep.params), jax.device_get(s_z.params))
        assert max(jax.tree_util.tree_leaves(d)) < 2e-3

    def test_sharding_stable_across_steps(self, setup):
        """Donated-buffer steps keep the ZeRO layout (the constrain pin)."""
        _, batch, state = setup
        mesh = create_mesh()
        s_z = shard_state_zero(state, mesh, "zero1")
        want = s_z.opt_state[0].mu["backbone"]["layer4_0"]["conv1"][
            "kernel"].sharding
        step = make_train_step(NUM_CLASSES)
        sb = {k: jax.device_put(jnp.asarray(v), data_sharding(mesh))
              for k, v in batch.items()}
        for _ in range(2):
            s_z, _, _ = step(s_z, sb, jax.random.PRNGKey(1), frozen=False)
        got = s_z.opt_state[0].mu["backbone"]["layer4_0"]["conv1"][
            "kernel"].sharding
        assert got == want
        pk = s_z.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert pk.sharding.spec == P()


class TestFSDP:
    def test_params_and_moments_sharded_and_consistent(self):
        model = get_model("resnet18", "texture_nfp", NUM_CLASSES)
        batch = _batch(img=32)
        state = _state(model, batch)
        mesh = create_mesh()
        s_f = shard_state_zero(state, mesh, "fsdp")
        pk = s_f.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert _shard_bytes(pk) == int(np.prod(pk.shape)) // 8
        # small leaves (biases, BN scales) stay replicated
        bn = s_f.params["backbone"]["layer1_0"]["bn1"]["scale"]
        assert bn.sharding.spec == P()

        step = make_train_step(NUM_CLASSES)
        sb = {k: jax.device_put(jnp.asarray(v), data_sharding(mesh))
              for k, v in batch.items()}
        s1 = state  # single-device baseline (donated after step 0)
        rng = jax.random.PRNGKey(1)
        for i in range(2):
            s1, l1, _ = step(s1, sb, rng, frozen=False)
            s_f, l2, _ = step(s_f, sb, rng, frozen=False)
            # step 0 is exact; step 1 sees params already carrying one
            # Adam update's reduction-order noise (test_train.py caveat)
            assert abs(float(l1) - float(l2)) < (1e-5 if i == 0
                                                 else 1e-3), i
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(s1.params), jax.device_get(s_f.params))
        assert max(jax.tree_util.tree_leaves(d)) < 2e-3
        # layout survived the donated steps
        pk2 = s_f.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert _shard_bytes(pk2) == int(np.prod(pk2.shape)) // 8

    def test_eval_under_fsdp(self):
        from neighbour_feature_pooling_tpu.train import make_eval_step

        model = get_model("resnet18", "gap_only", NUM_CLASSES)
        batch = _batch(b=8)
        state = _state(model, batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        ev = make_eval_step(NUM_CLASSES)
        loss1, w1, cm1, _ = ev(state, jb)
        mesh = create_mesh()
        s_f = shard_state_zero(state, mesh, "fsdp")
        sb = {k: jax.device_put(v, data_sharding(mesh))
              for k, v in jb.items()}
        loss2, w2, cm2, _ = ev(s_f, sb)
        assert abs(float(loss1) - float(loss2)) < 1e-5
        np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm2))


class TestZeroComposesWithTP:
    def test_tp_rules_win_rest_shards_over_data(self):
        model = get_model("resnet18", "texture_deepten", NUM_CLASSES)
        batch = _batch()
        state = _state(model, batch)
        mesh = create_tp_mesh(2)  # (data=4, model=2)
        s = shard_state_zero(state, mesh, "fsdp")
        # tp rule leaf: fc kernel row-parallel over "model"
        assert s.params["fc"]["kernel"].sharding.spec == P("model", None)
        # non-tp big leaf: sharded over "data"
        pk = s.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert "data" in tuple(pk.sharding.spec)

        step = make_train_step(NUM_CLASSES)
        sb = {k: jax.device_put(jnp.asarray(v), data_sharding(mesh))
              for k, v in batch.items()}
        s1 = state
        rng = jax.random.PRNGKey(1)
        s1, l1, _ = step(s1, sb, rng, frozen=False)
        s, l2, _ = step(s, sb, rng, frozen=False)
        assert abs(float(l1) - float(l2)) < 1e-5


class TestTrainerZero(object):
    def test_trainer_fit_with_zero1(self, tmp_path):
        """End-to-end: Trainer(zero='zero1') trains through the sharded
        state and the fitted moments are actually split."""
        from neighbour_feature_pooling_tpu.data.datamodules import (
            SyntheticDataModule)
        from neighbour_feature_pooling_tpu.train import (
            Trainer, TrainerConfig)

        dm = SyntheticDataModule(num_classes=NUM_CLASSES, num_samples=32,
                                 image_size=16, batch_size=8)
        model = get_model("resnet18", "gap_only", NUM_CLASSES)
        mesh = create_mesh()
        tr = Trainer(model, NUM_CLASSES,
                     TrainerConfig(max_epochs=2, log_dir=str(tmp_path / "l"),
                                   ckpt_dir=str(tmp_path / "c"),
                                   tensorboard=False),
                     mesh=mesh, zero="zero1")
        try:
            res = tr.fit(dm)
        finally:
            tr.close()
        assert len(res["history"]) == 2
        assert np.isfinite(res["history"][-1]["train"]["loss"])
        mu = jax.tree_util.tree_leaves(tr.state.opt_state[0].mu)
        # at least one moment leaf is actually split 8 ways
        assert any(int(np.prod(m.shape)) >= 2 ** 12
                   and _shard_bytes(m) == int(np.prod(m.shape)) // 8
                   for m in mu)

    def test_trainer_fsdp_resume(self, tmp_path):
        """fit → fit(resume=True) under zero='fsdp': the `last` checkpoint
        (written shard-by-shard from the live sharded state) restores onto
        the new Trainer's FSDP placements and training continues from the
        next epoch with the layout intact."""
        from neighbour_feature_pooling_tpu.data.datamodules import (
            SyntheticDataModule)
        from neighbour_feature_pooling_tpu.train import (
            Trainer, TrainerConfig)

        dm = SyntheticDataModule(num_classes=NUM_CLASSES, num_samples=32,
                                 image_size=16, batch_size=8)
        model = get_model("resnet18", "gap_only", NUM_CLASSES)
        mesh = create_mesh()
        kw = dict(log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "c"),
                  tensorboard=False)
        tr = Trainer(model, NUM_CLASSES,
                     TrainerConfig(max_epochs=1, **kw),
                     mesh=mesh, zero="fsdp")
        try:
            tr.fit(dm)
        finally:
            tr.close()

        tr2 = Trainer(model, NUM_CLASSES,
                      TrainerConfig(max_epochs=3, **kw),
                      mesh=mesh, zero="fsdp")
        try:
            res = tr2.fit(dm, resume=True)
        finally:
            tr2.close()
        # epochs 1..2 only: epoch 0 came from the checkpoint
        assert [h["epoch"] for h in res["history"]] == [1, 2]
        pk = tr2.state.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert _shard_bytes(pk) == int(np.prod(pk.shape)) // 8

    def test_trainer_zero_validates(self):
        from neighbour_feature_pooling_tpu.train import (
            Trainer, TrainerConfig)
        model = get_model("resnet18", "gap_only", NUM_CLASSES)
        with pytest.raises(ValueError):
            Trainer(model, NUM_CLASSES, TrainerConfig(),
                    mesh=create_mesh(), zero="zero9")


class TestShardedCheckpoint:
    """Checkpointing preserves ZeRO/FSDP placements: orbax saves the live
    sharded leaves (no host gather) and restores straight onto the target
    state's shardings — including resharding a checkpoint written under a
    different layout."""

    def test_fsdp_roundtrip_and_reshard(self, tmp_path):
        from neighbour_feature_pooling_tpu.train.checkpoint import (
            needs_collective_save, restore_checkpoint, save_checkpoint)

        model = get_model("resnet18", "gap_only", NUM_CLASSES)
        batch = _batch()
        state = _state(model, batch)
        mesh = create_mesh()
        s_f = shard_state_zero(state, mesh, "fsdp")
        assert not needs_collective_save(s_f)  # single-process: addressable
        path = str(tmp_path / "ck")
        save_checkpoint(path, s_f, {"epoch": 3})

        # restore into a freshly-initialized fsdp-placed state: values
        # bit-exact, shardings preserved
        model2 = get_model("resnet18", "gap_only", NUM_CLASSES)
        s2 = shard_state_zero(_state(model2, _batch(seed=9)), mesh, "fsdp")
        restored, meta = restore_checkpoint(path, s2)
        assert meta["epoch"] == 3
        pk = restored.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert _shard_bytes(pk) == int(np.prod(pk.shape)) // 8
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(s_f.params), jax.device_get(restored.params))
        assert max(jax.tree_util.tree_leaves(d)) == 0.0

        # reshard on load: the same checkpoint restores into a REPLICATED
        # target (different layout than it was written under)
        from neighbour_feature_pooling_tpu.parallel import (
            replicated_sharding)
        rep = replicated_sharding(mesh)
        s_rep = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), rep) if isinstance(
                x, (jax.Array, np.ndarray)) else x, state)
        restored2, _ = restore_checkpoint(path, s_rep)
        pk2 = restored2.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert pk2.sharding.spec == P()
        np.testing.assert_array_equal(
            np.asarray(pk2), np.asarray(jax.device_get(pk)))

    def test_restore_for_inference_is_topology_free(self, tmp_path):
        """A checkpoint saved from a mesh-sharded live state must load for
        serving WITHOUT the saving topology: restore_for_inference forces
        host-numpy leaves (a targetless orbax restore would try to rebuild
        the training pod's shardings on the serving host)."""
        from neighbour_feature_pooling_tpu.train.checkpoint import (
            restore_for_inference, save_checkpoint)

        model = get_model("resnet18", "gap_only", NUM_CLASSES)
        state = _state(model, _batch())
        mesh = create_mesh()
        s_f = shard_state_zero(state, mesh, "fsdp")
        path = str(tmp_path / "ck")
        save_checkpoint(path, s_f)

        params, batch_stats = restore_for_inference(path)
        leaves = jax.tree_util.tree_leaves((params, batch_stats))
        assert leaves and all(isinstance(x, np.ndarray) for x in leaves)
        pk = params["backbone"]["layer4_0"]["conv1"]["kernel"]
        np.testing.assert_array_equal(
            pk, np.asarray(jax.device_get(
                s_f.params["backbone"]["layer4_0"]["conv1"]["kernel"])))


class TestZeroComposesWithDispatchAndAccum:
    def test_trainer_fsdp_multi_dispatch_grad_accum(self, tmp_path):
        """zero='fsdp' × steps_per_dispatch=2 × grad_accum=2 through the
        Trainer: the scanned multi-step runs over the sharded donated
        state, the MultiSteps wrapper's accumulator shards with the
        moments, and the layout survives to the fitted state."""
        from neighbour_feature_pooling_tpu.data.datamodules import (
            SyntheticDataModule)
        from neighbour_feature_pooling_tpu.train import (
            Trainer, TrainerConfig)

        dm = SyntheticDataModule(num_classes=NUM_CLASSES, num_samples=64,
                                 image_size=16, batch_size=8)
        model = get_model("resnet18", "gap_only", NUM_CLASSES)
        tr = Trainer(model, NUM_CLASSES,
                     TrainerConfig(max_epochs=2, steps_per_dispatch=2,
                                   grad_accum=2,
                                   log_dir=str(tmp_path / "l"),
                                   ckpt_dir=str(tmp_path / "c"),
                                   tensorboard=False),
                     mesh=create_mesh(), zero="fsdp")
        try:
            res = tr.fit(dm)
        finally:
            tr.close()
        assert len(res["history"]) == 2
        assert np.isfinite(res["history"][-1]["train"]["loss"])
        pk = tr.state.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert _shard_bytes(pk) == int(np.prod(pk.shape)) // 8
