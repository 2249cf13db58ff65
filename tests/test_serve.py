"""Serving API tests: predictor compiles once, pads, restores checkpoints."""

import jax
import numpy as np
import pytest

from neighbour_feature_pooling_tpu.serve import Predictor


def test_predictor_basic():
    p = Predictor("resnet18", "gap_only", num_classes=3, batch_size=4,
                  input_size=32, resize_size=36)
    rng = np.random.default_rng(0)
    imgs = [rng.random((40, 44, 3)).astype(np.float32) for _ in range(6)]
    out = p.predict(imgs)
    assert out["probabilities"].shape == (6, 3)
    assert out["label"].shape == (6,)
    np.testing.assert_allclose(out["probabilities"].sum(-1), 1.0, atol=1e-5)


def test_predictor_from_checkpoint(tmp_path):
    import jax

    from neighbour_feature_pooling_tpu.data import SyntheticDataModule
    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import Trainer, TrainerConfig

    dm = SyntheticDataModule(num_classes=2, num_samples=48, image_size=16,
                             batch_size=16)
    model = get_model("resnet18", "gap_only", 2)
    trainer = Trainer(model, 2, TrainerConfig(
        learning_rate=1e-3, max_epochs=2, patience=10,
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"),
        freeze_nfp=False))
    trainer.fit(dm)

    p = Predictor("resnet18", "gap_only", num_classes=2, batch_size=8,
                  input_size=16, resize_size=16,
                  checkpoint=str(tmp_path / "ckpt" / "best"),
                  transform=dm.transform)
    # predictions from the restored checkpoint match trainer eval logits
    batch = next(iter(dm.test_batches()))
    out = p.predict(batch["image"], preprocessed=True)
    state = trainer.state
    from neighbour_feature_pooling_tpu.train.checkpoint import (
        restore_checkpoint)
    state, _ = restore_checkpoint(str(tmp_path / "ckpt" / "best"), state)
    logits = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         batch["image"], train=False)
    want = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(out["probabilities"], want, atol=1e-5)


def test_export_and_load_artifact(tmp_path):
    """export_predictor → load_exported round trip: frozen StableHLO +
    weights reproduce the live predictor bit-for-bit (labels) / ≤1e-5
    (probabilities), including chunk/pad handling, without rebuilding the
    model."""
    from neighbour_feature_pooling_tpu.serve import (export_predictor,
                                                     load_exported)

    pred = Predictor("resnet18", "texture_nfp", 5, batch_size=4,
                     input_size=32, resize_size=36)
    rng = np.random.default_rng(0)
    imgs = [rng.random((40, 40, 3)).astype(np.float32) for _ in range(6)]
    want = pred.predict(imgs)

    path = str(tmp_path / "artifact")
    export_predictor(pred, path)
    assert sorted(__import__("os").listdir(path)) == [
        "forward.jaxexport", "meta.json", "variables.npz"]
    ep = load_exported(path)
    got = ep.predict(imgs)
    np.testing.assert_allclose(got["probabilities"], want["probabilities"],
                               atol=1e-5)
    np.testing.assert_array_equal(got["label"], want["label"])


def test_predict_empty():
    p = Predictor("resnet18", "gap_only", num_classes=3, batch_size=4,
                  input_size=16, resize_size=16)
    out = p.predict([])
    assert out["probabilities"].shape == (0, 3)
    assert out["label"].shape == (0,)


def test_predictor_restores_plateau_checkpoint(tmp_path):
    from neighbour_feature_pooling_tpu.data import SyntheticDataModule
    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import Trainer, TrainerConfig

    dm = SyntheticDataModule(num_classes=2, num_samples=32, image_size=16,
                             batch_size=16)
    model = get_model("resnet18", "gap_only", 2)
    trainer = Trainer(model, 2, TrainerConfig(
        learning_rate=1e-3, max_epochs=1, patience=10, scheduler="plateau",
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"),
        freeze_nfp=False))
    trainer.fit(dm)
    # inference-only restore must not care about the scheduler's opt_state
    p = Predictor("resnet18", "gap_only", num_classes=2, batch_size=8,
                  input_size=16, resize_size=16,
                  checkpoint=str(tmp_path / "ckpt" / "best"))
    batch = next(iter(dm.test_batches()))
    out = p.predict(batch["image"], preprocessed=True)
    assert out["probabilities"].shape[1] == 2


class TestDataParallelServing:
    """data_parallel=True shards request batches over the device mesh
    (8 virtual CPU devices under conftest)."""

    def test_matches_single_device_fp32(self):
        import numpy as np
        from neighbour_feature_pooling_tpu.serve import Predictor

        kw = dict(num_classes=4, batch_size=8, input_size=32,
                  resize_size=36)
        single = Predictor("resnet18", "texture_nfp", **kw)
        multi = Predictor("resnet18", "texture_nfp", data_parallel=True,
                          **kw)
        from neighbour_feature_pooling_tpu.parallel.mesh import (
            replicated_sharding)

        multi._serve_variables = jax.device_put(
            single._serve_variables, replicated_sharding(multi._mesh))
        rng = np.random.default_rng(0)
        imgs = [rng.random((36, 36, 3)).astype(np.float32)
                for _ in range(11)]
        a = single.predict(imgs)
        b = multi.predict(imgs)
        np.testing.assert_allclose(b["probabilities"],
                                   a["probabilities"], atol=1e-5)
        np.testing.assert_array_equal(b["label"], a["label"])

    def test_int8_data_parallel_runs(self):
        import numpy as np
        from neighbour_feature_pooling_tpu.serve import Predictor

        pred = Predictor("resnet18", "gap_only", num_classes=3,
                         batch_size=8, input_size=32, resize_size=36,
                         quantize="int8", data_parallel=True)
        rng = np.random.default_rng(1)
        imgs = [rng.random((36, 36, 3)).astype(np.float32)
                for _ in range(8)]
        out = pred.predict(imgs)
        assert out["probabilities"].shape == (8, 3)
        assert np.all(np.isfinite(out["probabilities"]))

    def test_batch_size_must_divide(self):
        from neighbour_feature_pooling_tpu.serve import Predictor

        with pytest.raises(ValueError, match="divisible"):
            Predictor("resnet18", "gap_only", num_classes=3,
                      batch_size=6, input_size=32, data_parallel=True)

    def test_export_model_script(self, tmp_path):
        """scripts/export_model.py: checkpoint → quantized artifact →
        reload, without a training process."""
        import importlib.util
        import os

        import numpy as np

        from neighbour_feature_pooling_tpu.data import SyntheticDataModule
        from neighbour_feature_pooling_tpu.models import get_model
        from neighbour_feature_pooling_tpu.serve import load_exported
        from neighbour_feature_pooling_tpu.train import (Trainer,
                                                         TrainerConfig)

        dm = SyntheticDataModule(num_classes=3, num_samples=24,
                                 image_size=24, batch_size=8)
        model = get_model("resnet18", "gap_only", 3)
        t = Trainer(model, 3, TrainerConfig(
            learning_rate=1e-3, max_epochs=1, patience=5,
            log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ck"),
            freeze_nfp=False))
        t.fit(dm)
        t.close()

        spec = importlib.util.spec_from_file_location(
            "export_model", os.path.join(
                os.path.dirname(os.path.dirname(__file__)),
                "scripts", "export_model.py"))
        em = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(em)
        calib = tmp_path / "calib.npy"
        np.save(calib, np.random.default_rng(0)
                .random((4, 28, 28, 3)).astype(np.float32))
        art = tmp_path / "art"
        em.main(["--checkpoint", str(tmp_path / "ck" / "best"),
                 "--out", str(art), "--model_type", "resnet18",
                 "--model_variant", "gap_only", "--num_classes", "3",
                 "--batch_size", "4", "--input_size", "24",
                 "--resize_size", "28", "--quantize", "int8",
                 "--calibration_npy", str(calib)])
        loaded = load_exported(str(art))
        out = loaded.predict([np.zeros((28, 28, 3), np.float32)])
        assert out["probabilities"].shape == (1, 3)
        assert np.all(np.isfinite(out["probabilities"]))

    def test_data_parallel_export_rejected(self, tmp_path):
        from neighbour_feature_pooling_tpu.serve import (
            Predictor, export_predictor)

        pred = Predictor("resnet18", "gap_only", num_classes=3,
                         batch_size=8, input_size=32,
                         data_parallel=True)
        with pytest.raises(ValueError, match="data_parallel"):
            export_predictor(pred, str(tmp_path / "x"))


def test_predictor_reload_hot_swaps_weights(tmp_path):
    """reload() swaps in a newer checkpoint's weights without rebuilding
    the compiled forward (fp32 tier): predictions change to match a fresh
    predictor built on the new checkpoint."""
    import jax.numpy as jnp

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import create_train_state
    from neighbour_feature_pooling_tpu.train.checkpoint import (
        save_checkpoint)

    model = get_model("resnet18", "gap_only", 3)
    dummy = {"image": jnp.zeros((1, 32, 32, 3), jnp.float32)}
    s_a = create_train_state(model, jax.random.PRNGKey(0), dummy, 1e-3)
    s_b = create_train_state(model, jax.random.PRNGKey(7), dummy, 1e-3)
    save_checkpoint(str(tmp_path / "a"), s_a)
    save_checkpoint(str(tmp_path / "b"), s_b)

    p = Predictor("resnet18", "gap_only", num_classes=3, batch_size=4,
                  input_size=32, resize_size=36,
                  checkpoint=str(tmp_path / "a"))
    rng = np.random.default_rng(0)
    imgs = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(4)]
    out_a = p.predict(imgs)
    fwd_before = p._forward  # fp32 tier: reload must not rebuild

    assert p.reload(str(tmp_path / "b")) == str(tmp_path / "b")
    assert p._forward is fwd_before
    out_b = p.predict(imgs)
    assert not np.allclose(out_a["probabilities"], out_b["probabilities"])

    fresh = Predictor("resnet18", "gap_only", num_classes=3, batch_size=4,
                      input_size=32, resize_size=36,
                      checkpoint=str(tmp_path / "b"))
    np.testing.assert_allclose(out_b["probabilities"],
                               fresh.predict(imgs)["probabilities"],
                               atol=1e-6)

    # default path: re-reads the last-reloaded checkpoint
    assert p.reload() == str(tmp_path / "b")
    with pytest.raises(ValueError):
        Predictor("resnet18", "gap_only", num_classes=3, batch_size=4,
                  input_size=32, resize_size=36).reload()


def test_predictor_reload_rejects_incompatible_checkpoint(tmp_path):
    """A checkpoint from a different model/classes is rejected BEFORE any
    state changes — the endpoint keeps serving the old weights instead of
    poisoning every later predict with a shape error."""
    import jax.numpy as jnp

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import create_train_state
    from neighbour_feature_pooling_tpu.train.checkpoint import (
        save_checkpoint)

    dummy = {"image": jnp.zeros((1, 32, 32, 3), jnp.float32)}
    save_checkpoint(str(tmp_path / "good"), create_train_state(
        get_model("resnet18", "gap_only", 3), jax.random.PRNGKey(0),
        dummy, 1e-3))
    save_checkpoint(str(tmp_path / "wrong_classes"), create_train_state(
        get_model("resnet18", "gap_only", 7), jax.random.PRNGKey(0),
        dummy, 1e-3))
    save_checkpoint(str(tmp_path / "wrong_model"), create_train_state(
        get_model("mobilenetv3", "gap_only", 3), jax.random.PRNGKey(0),
        dummy, 1e-3))

    p = Predictor("resnet18", "gap_only", num_classes=3, batch_size=4,
                  input_size=32, resize_size=36,
                  checkpoint=str(tmp_path / "good"))
    imgs = [np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
            for _ in range(2)]
    before = p.predict(imgs)["probabilities"]
    for bad in ("wrong_classes", "wrong_model"):
        with pytest.raises(ValueError, match="incompatible"):
            p.reload(str(tmp_path / bad))
        assert p.checkpoint == str(tmp_path / "good")  # state untouched
    np.testing.assert_array_equal(p.predict(imgs)["probabilities"], before)


def test_predictor_reload_int8_rebuilds(tmp_path):
    """int8-tier reload re-bakes prequantized weights and drops stale
    calibration: post-reload predictions match a fresh int8 predictor
    built on the new checkpoint."""
    import jax.numpy as jnp

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import create_train_state
    from neighbour_feature_pooling_tpu.train.checkpoint import (
        save_checkpoint)

    model = get_model("resnet18", "gap_only", 3)
    dummy = {"image": jnp.zeros((1, 32, 32, 3), jnp.float32)}
    for seed, name in ((0, "a"), (9, "b")):
        save_checkpoint(str(tmp_path / name), create_train_state(
            model, jax.random.PRNGKey(seed), dummy, 1e-3))

    p = Predictor("resnet18", "gap_only", num_classes=3, batch_size=4,
                  input_size=32, resize_size=36, quantize="int8",
                  checkpoint=str(tmp_path / "a"))
    imgs = [np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
            for _ in range(4)]
    p.calibrate(imgs)
    out_a = p.predict(imgs)["probabilities"]

    p.reload(str(tmp_path / "b"))
    assert p._act_scales is None  # calibration was against the old weights
    out_b = p.predict(imgs)["probabilities"]
    assert not np.allclose(out_a, out_b)
    fresh = Predictor("resnet18", "gap_only", num_classes=3, batch_size=4,
                      input_size=32, resize_size=36, quantize="int8",
                      checkpoint=str(tmp_path / "b"))
    np.testing.assert_allclose(out_b, fresh.predict(imgs)["probabilities"],
                               atol=1e-6)
