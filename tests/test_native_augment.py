"""Native C++ augment kernel vs the numpy/PIL transform oracle."""

import numpy as np
import pytest

from neighbour_feature_pooling_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.native_available():
        pytest.skip("g++ unavailable; native path disabled")


def test_identity_crop_no_resize(lib_ok):
    rng = np.random.default_rng(0)
    img = rng.random((16, 16, 3)).astype(np.float32)
    out = native.augment_batch(
        [img], np.array([[0, 0, 16, 16]]), np.array([0]), (16, 16),
        np.zeros(3), np.ones(3))
    np.testing.assert_allclose(out[0], img, atol=1e-6)


def test_flip_and_normalize(lib_ok):
    rng = np.random.default_rng(1)
    img = rng.random((8, 8, 3)).astype(np.float32)
    mean = np.array([0.5, 0.4, 0.3], np.float32)
    std = np.array([0.2, 0.3, 0.4], np.float32)
    out = native.augment_batch(
        [img], np.array([[0, 0, 8, 8]]), np.array([1]), (8, 8), mean, std)
    want = (img[:, ::-1] - mean) / std
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_resize_matches_pil(lib_ok):
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.random((20, 20, 3)).astype(np.float32)
    out = native.augment_batch(
        [img], np.array([[0, 0, 20, 20]]), np.array([0]), (10, 10),
        np.zeros(3), np.ones(3))
    chans = [np.asarray(Image.fromarray(img[:, :, c], mode="F")
                        .resize((10, 10), Image.BILINEAR))
             for c in range(3)]
    want = np.stack(chans, axis=2)
    np.testing.assert_allclose(out[0], want, atol=2e-3)


def test_crop_box(lib_ok):
    rng = np.random.default_rng(3)
    img = rng.random((12, 12, 3)).astype(np.float32)
    out = native.augment_batch(
        [img], np.array([[2, 3, 6, 6]]), np.array([0]), (6, 6),
        np.zeros(3), np.ones(3))
    np.testing.assert_allclose(out[0], img[2:8, 3:9], atol=1e-5)


def test_batch_of_mixed_sizes(lib_ok):
    rng = np.random.default_rng(4)
    imgs = [rng.random((h, w, 3)).astype(np.float32)
            for h, w in ((10, 12), (20, 8), (16, 16), (7, 9))]
    crops = np.array([[0, 0, h, w] for (h, w) in
                      ((10, 12), (20, 8), (16, 16), (7, 9))])
    out = native.augment_batch(imgs, crops, np.zeros(4, np.int32), (8, 8),
                               np.zeros(3), np.ones(3))
    assert out.shape == (4, 8, 8, 3)
    assert np.isfinite(out).all()


def test_throughput_beats_python(lib_ok):
    """The native path must be meaningfully faster than the per-image
    PIL/numpy pipeline on a realistic batch."""
    import time

    from neighbour_feature_pooling_tpu.data.transforms import (
        TransformConfig, eval_transform)

    rng = np.random.default_rng(5)
    imgs = [rng.random((256, 256, 3)).astype(np.float32) for _ in range(32)]
    cfg = TransformConfig(resize_size=224, input_size=224,
                          mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))

    t0 = time.perf_counter()
    for _ in range(3):
        _ = [eval_transform(im, cfg) for im in imgs]
    t_py = (time.perf_counter() - t0) / 3

    crops = np.array([[0, 0, 256, 256]] * 32)
    mean = np.array(cfg.mean, np.float32)
    std = np.array(cfg.std, np.float32)
    native.augment_batch(imgs, crops, np.zeros(32, np.int32), (224, 224),
                         mean, std)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        native.augment_batch(imgs, crops, np.zeros(32, np.int32),
                             (224, 224), mean, std)
    t_cc = (time.perf_counter() - t0) / 3
    assert t_cc < t_py, (t_cc, t_py)


def test_uint8_input_matches_float(lib_ok):
    """uint8 images (the datamodules' decode convention) are scaled to
    [0, 1] inside the wrapper — bit-identical to pre-scaled float32."""
    rng = np.random.default_rng(4)
    u8s = [rng.integers(0, 256, (20, 18, 3), dtype=np.uint8),
           rng.integers(0, 256, (14, 14, 3), dtype=np.uint8)]
    f32s = [u.astype(np.float32) / 255.0 for u in u8s]
    crops = np.array([[2, 1, 16, 15], [0, 0, 14, 14]])
    flips = np.array([1, 0])
    mean, std = np.array([0.4, 0.5, 0.6]), np.array([0.2, 0.3, 0.25])
    a = native.augment_batch(u8s, crops, flips, (12, 12), mean, std)
    b = native.augment_batch(f32s, crops, flips, (12, 12), mean, std)
    np.testing.assert_array_equal(a, b)
