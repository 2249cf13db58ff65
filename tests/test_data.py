"""Data-layer tests: transforms, folder datamodule, synthetic, padding."""

import os

import numpy as np
import pytest

from neighbour_feature_pooling_tpu.data import (
    FolderDataModule,
    SyntheticDataModule,
    TransformConfig,
    eval_transform,
    train_transform,
)


def test_eval_transform_resize_center_crop():
    cfg = TransformConfig(resize_size=36, input_size=32,
                          mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    img = np.random.default_rng(0).random((50, 70, 3)).astype(np.float32)
    out = eval_transform(img, cfg)
    assert out.shape == (32, 32, 3)
    # normalization applied: values roughly in [-1, 1]
    assert out.min() >= -1.01 and out.max() <= 1.01


def test_train_transform_deterministic_given_rng():
    cfg = TransformConfig(resize_size=36, input_size=32,
                          mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    img = np.random.default_rng(1).random((64, 64, 3)).astype(np.float32)
    a = train_transform(img, cfg, np.random.default_rng(7))
    b = train_transform(img, cfg, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 32, 3)


def test_synthetic_batches_and_padding():
    dm = SyntheticDataModule(num_classes=3, num_samples=50, image_size=16,
                             batch_size=16)
    dm.setup()
    batches = list(dm.train_batches(0))
    # 35 train samples -> TRAIN drops the partial tail (BatchNorm statistics
    # must not see zero-padded rows): 2 full batches
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (16, 16, 16, 3)
        assert b["label"].shape == (16,)
        assert b["weight"].sum() == 16
    # EVAL keeps the padded tail so every example is scored
    vb = list(dm.test_batches())
    assert len(vb) == 1  # 8 test samples -> one padded batch
    w = vb[-1]["weight"]
    assert w.sum() == 8
    assert (vb[-1]["image"][w == 0] == 0).all()


def test_train_single_small_batch_kept():
    # when the train split is smaller than the batch size, the single padded
    # batch is kept (dropping it would mean zero training data)
    dm = SyntheticDataModule(num_classes=2, num_samples=16, image_size=8,
                             batch_size=32)
    dm.setup()
    batches = list(dm.train_batches(0))
    assert len(batches) == 1


def test_seed_changes_shuffle_not_split():
    a = SyntheticDataModule(num_classes=2, num_samples=64, image_size=8,
                            batch_size=16, seed=1)
    b = SyntheticDataModule(num_classes=2, num_samples=64, image_size=8,
                            batch_size=16, seed=2)
    a.setup(); b.setup()
    # same underlying split/data (split_seed fixed) ...
    np.testing.assert_array_equal(a._splits["test"].labels,
                                  b._splits["test"].labels)
    # ... but different shuffle order
    la = next(iter(a.train_batches(0)))["label"]
    lb = next(iter(b.train_batches(0)))["label"]
    assert not np.array_equal(la, lb)


def test_synthetic_learnable_classes_differ():
    dm = SyntheticDataModule(num_classes=4, num_samples=64, image_size=16,
                             batch_size=64)
    dm.setup()
    b = next(iter(dm.train_batches(0)))
    per_class_mean = [b["image"][b["label"] == k].std() for k in range(4)]
    assert all(np.isfinite(per_class_mean))


def test_folder_datamodule(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ("alpha", "beta"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(10):
            arr = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    dm = FolderDataModule(str(tmp_path), resize_size=18, input_size=16,
                          batch_size=4)
    dm.setup()
    assert dm.num_classes == 2
    assert dm.class_names == ["alpha", "beta"]
    # stratified 70/10/20: 7/1/2 per class
    assert dm.split_size("train") == 14
    assert dm.split_size("val") == 2
    assert dm.split_size("test") == 4
    b = next(iter(dm.train_batches(0)))
    assert b["image"].shape == (4, 16, 16, 3)


def test_folder_datamodule_missing_dir():
    dm = FolderDataModule("/nonexistent/path", batch_size=4)
    with pytest.raises(FileNotFoundError, match="synthetic"):
        dm.setup()


def test_summary_util():
    import jax
    import jax.numpy as jnp

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.utils import count_parameters, summarize

    model = get_model("resnet18", "gap_only", 5)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 3)), train=False)
    n = count_parameters(v["params"])
    # ResNet18 backbone ~11.2M + fc
    assert 11_000_000 < n < 12_000_000
    s = summarize(v)
    assert "Total trainable" in s and "backbone" in s


def test_native_vs_python_pipeline_close():
    """The single-pass native composite must track the two-step python path
    (same sampling grid; only the antialias filter scale differs slightly)."""
    from neighbour_feature_pooling_tpu import native

    if not native.native_available():
        pytest.skip("native lib unavailable")
    cfg = TransformConfig(resize_size=32, input_size=28,
                          mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    rng = np.random.default_rng(0)
    # smooth image so antialias differences are tiny
    base = rng.random((8, 8, 3)).astype(np.float32)
    from PIL import Image
    img = np.stack([np.asarray(Image.fromarray(base[:, :, c], mode="F")
                               .resize((64, 64), Image.BILINEAR))
                    for c in range(3)], axis=2)
    py = eval_transform(img, cfg)
    from neighbour_feature_pooling_tpu.data.transforms import plan_eval
    box = plan_eval(img.shape[:2], cfg)
    nat = native.augment_batch([img], np.array([box]), np.array([0]),
                               (28, 28), np.array(cfg.mean, np.float32),
                               np.array(cfg.std, np.float32))[0]
    assert np.abs(nat - py).mean() < 0.05


def test_prefetch_preserves_order_and_errors():
    from neighbour_feature_pooling_tpu.data import prefetch

    assert list(prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    out = []
    with pytest.raises(ValueError, match="boom"):
        for x in prefetch(boom()):
            out.append(x)
    assert out == [1]


def test_prefetch_no_leak_on_early_exit():
    import threading

    from neighbour_feature_pooling_tpu.data import prefetch

    before = threading.active_count()
    for _ in range(5):
        g = prefetch(iter(range(100)))
        assert next(g) == 0
        g.close()
    import time
    time.sleep(0.5)
    # producers must have exited (allow 1 thread of slack for timing)
    assert threading.active_count() <= before + 1


def test_train_transform_stretches_crop():
    # torchvision RandomResizedCrop semantics: non-square crops are
    # stretched to the square target, not re-cropped
    cfg = TransformConfig(resize_size=32, input_size=32,
                          mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                          hflip=False, scale_range=(0.5, 0.5))
    rng = np.random.default_rng(3)
    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    out = train_transform(img, cfg, rng)
    assert out.shape == (32, 32, 3)
    # with area scale 0.5 the crop has ~512 px; a stretched resize uses all
    # of them; verify output is not a trivial center crop of the source
    assert not np.allclose(out, img)
