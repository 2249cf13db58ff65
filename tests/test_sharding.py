"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neighbour_feature_pooling_tpu.models import get_model
from neighbour_feature_pooling_tpu.parallel import (
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from neighbour_feature_pooling_tpu.train import create_train_state, make_train_step


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8, (
        "conftest must force xla_force_host_platform_device_count=8")


def _tiny_batch(b=16, img=24, k=4):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.standard_normal((b, img, img, 3))
                             .astype(np.float32)),
        "label": jnp.asarray(np.arange(b) % k, jnp.int32),
        "weight": jnp.ones((b,), jnp.float32),
    }


def test_data_parallel_step_matches_single_device():
    """Loss, metrics and gradients agree between 1-device and 8-device DP.

    Post-Adam parameters are NOT compared: Adam's first step is sign-like
    (m/sqrt(v) ≈ ±1), so fp reduction-order noise in near-zero gradients
    flips whole update entries — expected, not a sharding bug.
    """
    from neighbour_feature_pooling_tpu.train.engine import cross_entropy_loss

    k = 4
    batch = _tiny_batch()
    model = get_model("resnet18", "texture_nfp", k)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, 1e-3)
    train_step = make_train_step(k)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def loss_and_grads(st, bt):
        def loss_fn(params):
            logits, _ = st.apply_fn(
                {"params": params, "batch_stats": st.batch_stats},
                bt["image"], train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            return cross_entropy_loss(logits, bt["label"], bt["weight"])

        return jax.value_and_grad(loss_fn)(st.params)

    # single device
    loss1, grads1 = loss_and_grads(state, batch)
    _, loss1s, cm1 = train_step(state, batch, rng, frozen=False)

    # 8-device mesh: replicated state, sharded batch
    mesh = create_mesh()
    rep = replicated_sharding(mesh)
    state8 = create_train_state(model, jax.random.PRNGKey(0), batch, 1e-3)
    state8 = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep) if isinstance(a, jax.Array) else a,
        state8)
    batch8 = shard_batch(batch, mesh)
    loss8, grads8 = loss_and_grads(state8, batch8)
    _, loss8s, cm8 = train_step(state8, batch8, rng, frozen=False)

    assert abs(float(loss1) - float(loss8)) < 1e-5
    assert abs(float(loss1s) - float(loss8s)) < 1e-5
    np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm8))
    for a, b in zip(jax.tree_util.tree_leaves(grads1),
                    jax.tree_util.tree_leaves(grads8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, (variables, x) = ge.entry()
    out = jax.jit(fn)(variables, x[:2])
    assert out.shape == (2, 21)


def test_local_batch_slice():
    from neighbour_feature_pooling_tpu.parallel import local_batch_slice

    batch = {"image": np.arange(8 * 2).reshape(8, 2).astype(np.float32),
             "label": np.arange(8)}
    # single process: identity
    assert local_batch_slice(batch, 0, 1) is batch
    # 4 processes: contiguous row blocks
    for pi in range(4):
        loc = local_batch_slice(batch, pi, 4)
        np.testing.assert_array_equal(loc["label"], [2 * pi, 2 * pi + 1])
        np.testing.assert_array_equal(loc["image"],
                                      batch["image"][2 * pi:2 * pi + 2])
    with pytest.raises(ValueError, match="not divisible"):
        local_batch_slice(batch, 0, 3)


def test_initialize_distributed_noop(monkeypatch):
    from neighbour_feature_pooling_tpu.parallel import initialize_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False
    assert initialize_distributed(num_processes=1) is False


def test_global_batch_from_local_single_process_equals_shard_batch():
    from neighbour_feature_pooling_tpu.parallel import (
        create_mesh, global_batch_from_local, local_batch_slice, shard_batch)

    mesh = create_mesh(jax.devices()[:8])
    batch = {"image": np.random.default_rng(0)
             .standard_normal((16, 4, 4, 3)).astype(np.float32),
             "label": np.arange(16, dtype=np.int32)}
    a = global_batch_from_local(local_batch_slice(batch), mesh)
    b = shard_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding


class TestNFPCustomPartitioning:
    """The NFP op carries a custom_partitioning rule (batch pass-through).

    On real multi-chip TPU, XLA treats pallas_call as an opaque custom call
    and would all-gather a batch-sharded feature map around it; the rule
    makes each shard run the kernel on its local rows. On this CPU mesh the
    kernel runs in interpret mode, so these tests validate the rule's
    numerics/shardings and that it introduces no collectives — the
    hardware-pod gather elision itself needs >1 real chip.
    """

    def _sharded(self, x):
        from neighbour_feature_pooling_tpu.parallel import (create_mesh,
                                                            data_sharding)
        mesh = create_mesh()
        return jax.device_put(x, data_sharding(mesh))

    def test_map_parity_and_output_sharding(self):
        from neighbour_feature_pooling_tpu.ops import nfp

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((16, 7, 7, 32)).astype(np.float32))
        want = np.asarray(nfp(x, 1, "cosine", padding=1))
        xs = self._sharded(x)
        got = jax.jit(lambda a: nfp(a, 1, "cosine", True, 1.0, 1e-6, 1e-6,
                                    1, 1, 1, "reflect", "NHWC", False))(xs)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
        assert got.sharding.spec[0] == "data"

    def test_fused_gap_grad_parity(self):
        from neighbour_feature_pooling_tpu.ops import nfp

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((16, 7, 7, 24)).astype(np.float32))
        g = jax.jit(jax.grad(lambda a: nfp(
            a, 1, "cosine", True, 1.0, 1e-6, 1e-6, 1, 1, 1, "reflect",
            "NHWC", True).sum()))
        np.testing.assert_allclose(np.asarray(g(self._sharded(x))),
                                   np.asarray(g(x)), atol=1e-6)

    def test_no_collectives_in_sharded_forward(self):
        import re

        from jax.sharding import NamedSharding, PartitionSpec as P

        from neighbour_feature_pooling_tpu.ops import nfp
        from neighbour_feature_pooling_tpu.parallel import create_mesh

        mesh = create_mesh()
        spec = jax.ShapeDtypeStruct(
            (16, 7, 7, 32), jnp.float32,
            sharding=NamedSharding(mesh, P("data")))
        f = jax.jit(lambda a: nfp(a, 1, "cosine", True, 1.0, 1e-6, 1e-6,
                                  1, 1, 1, "reflect", "NHWC", False))
        hlo = f.lower(spec).compile().as_text()
        assert not re.search(r"all-gather|all-to-all|collective-permute", hlo)


def test_multiprocess_dryrun_two_hosts():
    """True multi-host smoke: 2 subprocesses x 4 virtual CPU devices,
    jax.distributed over localhost, same jitted train step.

    One retry on a fresh coordinator port: Gloo's context init has a
    hardcoded 30 s key-exchange window, and on a heavily oversubscribed
    host one worker can get starved past it even after the
    compile-then-barrier hardening (observed only when other test
    suites run concurrently)."""
    import __graft_entry__ as g

    try:
        g.dryrun_multichip(8, num_processes=2, coordinator_port=56917)
    except AssertionError:
        g.dryrun_multichip(8, num_processes=2, coordinator_port=56931)


def test_trainer_mesh_with_device_resident_data(tmp_path):
    """--device_data/--device_eval under a data-parallel mesh: resident
    gather+augment happens on one device, global_batch_from_local reshards
    onto the mesh, and a 2-epoch fit matches the same fit on a single
    device (same device pixels, same math up to fp reduction order)."""
    from neighbour_feature_pooling_tpu.data import SyntheticDataModule
    from neighbour_feature_pooling_tpu.train import Trainer, TrainerConfig

    def fit(mesh):
        dm = SyntheticDataModule(num_classes=3, num_samples=48,
                                 image_size=24, batch_size=16, seed=11)
        dm.use_device_data = True
        dm.use_device_eval = True
        cfg = TrainerConfig(learning_rate=1e-3, max_epochs=2,
                            freeze_nfp=False, tensorboard=False,
                            log_dir=str(tmp_path / f"l{mesh is None}"),
                            ckpt_dir=str(tmp_path / f"c{mesh is None}"))
        tr = Trainer(get_model("resnet18", "gap_only", 3), 3, cfg, mesh=mesh)
        out = tr.fit(dm)
        return [e["train"]["loss"] for e in out["history"]], \
            [e["val"]["loss"] for e in out["history"]]

    tl1, vl1 = fit(None)
    tl8, vl8 = fit(create_mesh())
    assert all(np.isfinite(tl8)) and all(np.isfinite(vl8))
    # epoch 0 is pre-divergence (same pixels, same math): tight. Later
    # epochs drift by fp reduction order through Adam's sign-like first
    # steps (see test_data_parallel_step_matches_single_device): loose.
    np.testing.assert_allclose(tl8[0], tl1[0], rtol=1e-4)
    np.testing.assert_allclose(vl8[0], vl1[0], rtol=1e-3)
    np.testing.assert_allclose(tl8, tl1, rtol=3e-2)
    np.testing.assert_allclose(vl8, vl1, rtol=3e-2)


class TestNFPSpatialPartitioning:
    """H-axis (spatial) partitioning of the NFP op — parallel halo design.

    For the production "same"-output configuration (stride 1, padding =
    R·d) the custom_partitioning rule serves an H-sharded feature map by
    exchanging an R·d-row halo between neighbor shards (ppermute) and
    applying the global edge padding only on the boundary shards; the
    fused-GAP head adds a pmean over the spatial axis. This is the same
    halo-exchange treatment XLA applies to spatially partitioned
    convolutions, extended to the opaque Pallas call — so feature maps too
    tall for one chip shard across the mesh instead of gathering.
    """

    def _sp_mesh(self, n=4):
        from jax.sharding import Mesh
        return Mesh(np.array(jax.devices()[:n]), ("sp",))

    def _h_sharded(self, x, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(x, NamedSharding(mesh, P(None, "sp")))

    def _jit_nfp(self, padding_mode="reflect", fuse_gap=False, radius=1,
                 dilation=1):
        from neighbour_feature_pooling_tpu.ops import nfp
        pad = radius * dilation
        return jax.jit(lambda a: nfp(a, radius, "cosine", True, 1.0, 1e-6,
                                     1e-6, 1, pad, dilation, padding_mode,
                                     "NHWC", fuse_gap))

    @pytest.mark.parametrize("mode",
                             ["reflect", "zeros", "replicate", "circular"])
    def test_h_sharded_map_parity(self, mode):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 32, 9, 8)).astype(np.float32))
        f = self._jit_nfp(padding_mode=mode)
        want = np.asarray(f(x))
        mesh = self._sp_mesh()
        got = f(self._h_sharded(x, mesh))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
        assert got.sharding.spec[1] == "sp", got.sharding.spec

    def test_h_sharded_fused_gap_parity_and_grad(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 32, 9, 8)).astype(np.float32))
        f = self._jit_nfp(fuse_gap=True)
        mesh = self._sp_mesh()
        xs = self._h_sharded(x, mesh)
        np.testing.assert_allclose(np.asarray(f(xs)), np.asarray(f(x)),
                                   atol=1e-6)
        g = jax.jit(jax.grad(lambda a: self._jit_nfp(fuse_gap=True)(a).sum()))
        np.testing.assert_allclose(np.asarray(g(xs)), np.asarray(g(x)),
                                   atol=1e-6)

    def test_radius2_dilation(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 40, 8, 6)).astype(np.float32))
        for radius, dilation in [(2, 1), (1, 2)]:
            f = self._jit_nfp(radius=radius, dilation=dilation)
            want = np.asarray(f(x))
            got = f(self._h_sharded(x, self._sp_mesh()))
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_batch_and_h_sharded_2d_mesh(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "sp"))
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((4, 32, 9, 8)).astype(np.float32))
        f = self._jit_nfp()
        want = np.asarray(f(x))
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "sp")))
        got = f(xs)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
        assert got.sharding.spec[:2] == ("data", "sp")

    def test_halo_not_gather_in_hlo(self):
        import re
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self._sp_mesh()
        spec = jax.ShapeDtypeStruct(
            (4, 32, 9, 8), jnp.float32,
            sharding=NamedSharding(mesh, P(None, "sp")))
        hlo = self._jit_nfp().lower(spec).compile().as_text()
        assert not re.search(r"all-gather", hlo), "H shards were gathered"
        assert re.search(r"collective-permute", hlo), "no halo exchange found"

    def test_uneven_or_short_shards_fall_back(self):
        # H=10 over 4 shards does not divide (device_put refuses that
        # layout, so force it with a sharding constraint inside jit — the
        # GSPMD propagation path the guard exists for); H=8/4=2-row shards
        # are not taller than the radius-2 halo — both must fall back to
        # replication and stay correct
        from jax.sharding import NamedSharding, PartitionSpec as P
        from neighbour_feature_pooling_tpu.ops import nfp
        rng = np.random.default_rng(4)
        mesh = self._sp_mesh()
        sh = NamedSharding(mesh, P(None, "sp"))

        def _f(a, radius):
            a = jax.lax.with_sharding_constraint(a, sh)
            return nfp(a, radius, "cosine", True, 1.0, 1e-6, 1e-6, 1,
                       radius, 1, "reflect", "NHWC", False)

        for h, radius in [(10, 1), (8, 2)]:
            x = jnp.asarray(
                rng.standard_normal((2, h, 9, 6)).astype(np.float32))
            want = np.asarray(self._jit_nfp(radius=radius)(x))
            got = jax.jit(lambda a, r=radius: _f(a, r))(x)
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_mahalanobis_falls_back_to_replication(self):
        # mahalanobis is the one measure whose config carries per-sample
        # GLOBAL spatial statistics (inverse variance,
        # neighborhood._measure_config): evaluated per-shard (halo rows
        # included) those stats silently change the result — regression:
        # before the _sp_eligible_static measure gate, the H-sharded
        # output differed from unsharded by max|d| ~ 0.7 on O(1) outputs
        from neighbour_feature_pooling_tpu.ops import nfp
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((4, 32, 9, 8)).astype(np.float32))
        f = jax.jit(lambda a: nfp(a, 1, "mahalanobis", False, 1.0, 1e-6,
                                  1e-6, 1, 1, 1, "reflect", "NHWC", False))
        want = np.asarray(f(x))
        got = f(self._h_sharded(x, self._sp_mesh()))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_padding0_config_falls_back(self):
        # padding=0 shrinks the map (NFPBottleneck): not sp-eligible —
        # the batch-only rule must serve it correctly
        from neighbour_feature_pooling_tpu.ops import nfp
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 16, 9, 6)).astype(np.float32))
        f = jax.jit(lambda a: nfp(a, 1, "cosine", True, 1.0, 1e-6, 1e-6,
                                  1, 0, 1, "reflect", "NHWC", False))
        np.testing.assert_allclose(
            np.asarray(f(self._h_sharded(x, self._sp_mesh()))),
            np.asarray(f(x)), atol=1e-6)
