"""int8 Pallas conv: exact s32 equality vs the XLA convolution.

Interpret mode on the CPU test backend; Mosaic-compiled + swept on TPU
(scripts/bench_int8_conv.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from neighbour_feature_pooling_tpu.ops.int8_conv import int8_conv2d


def _ref(x, w, padding):
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32)


@pytest.mark.parametrize("b,h,wd,cin,cout,k,padding", [
    (2, 8, 8, 8, 16, 3, "SAME"),
    (1, 10, 7, 16, 8, 3, "SAME"),     # odd width: Wp-wrap columns sliced
    (2, 9, 9, 8, 8, 5, "SAME"),       # 5x5 taps
    (1, 8, 8, 8, 16, 3, "VALID"),
    (1, 6, 6, 4, 8, 1, "SAME"),       # degenerate 1x1
])
def test_int8_conv_exact(b, h, wd, cin, cout, k, padding):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (b, h, wd, cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)), jnp.int8)
    got = int8_conv2d(x, w, padding=padding)
    want = _ref(x, w, [(max(0, (k - 1) // 2), max(0, k // 2))] * 2
                if padding == "SAME" else [(0, 0)] * 2)
    assert got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_explicit_padding():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-127, 128, (1, 6, 6, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 8)), jnp.int8)
    got = int8_conv2d(x, w, padding=((2, 0), (0, 2)))
    want = _ref(x, w, [(2, 0), (0, 2)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_cout_tiling():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(-127, 128, (1, 8, 8, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 32)), jnp.int8)
    full = int8_conv2d(x, w, tcout=32)
    tiled = int8_conv2d(x, w, tcout=8)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(tiled))


def test_int8_conv_rejects_bad_inputs():
    x8 = jnp.zeros((1, 4, 4, 4), jnp.int8)
    with pytest.raises(TypeError):
        int8_conv2d(jnp.zeros((1, 4, 4, 4), jnp.float32),
                    jnp.zeros((3, 3, 4, 4), jnp.int8))
    with pytest.raises(ValueError):
        int8_conv2d(x8, jnp.zeros((3, 3, 8, 4), jnp.int8))  # Cin mismatch
    with pytest.raises(ValueError):
        int8_conv2d(x8, jnp.zeros((3, 3, 4, 4), jnp.int8), tcout=3)


@pytest.mark.parametrize("h,wd,cin,cout,k,s,padding", [
    (56, 56, 8, 16, 3, 2, "SAME"),    # ResNet downsample shape (thin C)
    (9, 9, 8, 8, 3, 2, "SAME"),       # odd extent under stride
    (8, 8, 8, 8, 3, 2, "VALID"),
    (10, 8, 8, 16, 1, 2, "SAME"),     # strided 1x1 (downsample proj)
    (12, 12, 4, 8, 5, 3, "SAME"),     # stride 3, 5x5
    (11, 13, 4, 8, 3, 2, "VALID"),    # odd both dims
])
def test_int8_conv_strided_exact(h, wd, cin, cout, k, s, padding):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(-127, 128, (2, h, wd, cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)), jnp.int8)
    got = int8_conv2d(x, w, padding=padding, strides=(s, s))
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    want = lax.conv_general_dilated(
        x, w, window_strides=(s, s), padding=padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_asymmetric_strides():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(-127, 128, (1, 12, 12, 4)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 4, 8)), jnp.int8)
    got = int8_conv2d(x, w, padding="SAME", strides=(2, 1))
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    want = lax.conv_general_dilated(
        x, w, window_strides=(2, 1), padding="SAME",
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("tb", [1, 2, 4])
def test_int8_conv_batch_packing_exact(tb):
    """TB images packed per grid step == per-image results, exactly
    (cross-image tap reads only feed discarded garbage rows)."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(-127, 128, (4, 7, 7, 16)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 16, 8)), jnp.int8)
    got = int8_conv2d(x, w, padding="SAME", batch_tile=tb)
    want = _ref(x, w, [(1, 1), (1, 1)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_batch_tile_must_divide():
    x = jnp.zeros((3, 7, 7, 8), jnp.int8)
    w = jnp.zeros((3, 3, 8, 8), jnp.int8)
    with pytest.raises(ValueError):
        int8_conv2d(x, w, batch_tile=2)


def test_int8_conv_fused_dequant_epilogue():
    """scale/bias fused into the kernel == dequantizing the s32 output."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 16)), jnp.int8)
    scale = jnp.asarray(rng.random(16) * 0.01 + 1e-4, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)
    fused = int8_conv2d(x, w, padding="SAME", scale=scale, bias=bias)
    s32 = int8_conv2d(x, w, padding="SAME")
    want = s32.astype(jnp.float32) * scale + bias
    assert fused.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_int8_conv_fused_epilogue_strided_bf16():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 16)), jnp.int8)
    scale = jnp.full((16,), 2e-3, jnp.float32)
    fused = int8_conv2d(x, w, padding="SAME", strides=(2, 2),
                        scale=scale, out_dtype=jnp.bfloat16)
    s32 = int8_conv2d(x, w, padding="SAME", strides=(2, 2))
    want = (s32.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    assert fused.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(fused.astype(jnp.float32)),
                                  np.asarray(want.astype(jnp.float32)))


def test_int8_conv_factored_taps_path_exact():
    """W=62 SAME/3x3 gives wp=64 (32-aligned): the dx-factored tap body
    runs; exactness unchanged."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.integers(-127, 128, (2, 30, 62, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 16)), jnp.int8)
    got = int8_conv2d(x, w, padding="SAME")
    want = _ref(x, w, [(1, 1), (1, 1)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_wp_alignment_pad_exact():
    """W=56 SAME/3x3: wp 58 -> 64 via right zero-cols; still exact."""
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.integers(-127, 128, (1, 12, 56, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 8)), jnp.int8)
    got = int8_conv2d(x, w, padding="SAME")
    want = _ref(x, w, [(1, 1), (1, 1)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_same_lower_padding():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(-127, 128, (1, 9, 9, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (2, 2, 8, 8)), jnp.int8)
    got = int8_conv2d(x, w, padding="SAME_LOWER", strides=(2, 2))
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    want = lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding="SAME_LOWER",
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_bias_without_scale_rejected():
    x = jnp.zeros((1, 4, 4, 4), jnp.int8)
    w = jnp.zeros((3, 3, 4, 4), jnp.int8)
    with pytest.raises(ValueError, match="bias requires scale"):
        int8_conv2d(x, w, bias=jnp.zeros((4,), jnp.float32))


def test_int8_conv_relu_and_requant_epilogue():
    """relu + s8-out epilogue == clip(round(relu(acc*scale+bias)))."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 16)), jnp.int8)
    scale = jnp.asarray(rng.standard_normal(16) * 1e-3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)
    got = int8_conv2d(x, w, padding="SAME", scale=scale, bias=bias,
                      relu=True, out_dtype=jnp.int8)
    s32 = int8_conv2d(x, w, padding="SAME").astype(jnp.float32)
    y = jnp.maximum(s32 * scale + bias, 0.0)
    want = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_relu_only_float_out():
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.integers(-127, 128, (1, 6, 6, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 8)), jnp.int8)
    scale = jnp.full((8,), 1e-3, jnp.float32)
    got = int8_conv2d(x, w, padding="SAME", scale=scale, relu=True)
    s32 = int8_conv2d(x, w, padding="SAME").astype(jnp.float32)
    want = jnp.maximum(s32 * scale, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
