"""int8 Pallas GEMM: exact s32 equality vs the XLA contraction.

Runs in Pallas interpret mode on the CPU test backend; the same kernel
compiles via Mosaic on TPU (tile sweep in scripts/bench_int8_gemm.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from neighbour_feature_pooling_tpu.ops.int8_gemm import int8_gemm


def _ref(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.int32)


@pytest.mark.parametrize("m,n,k", [
    (128, 128, 128),      # single tile
    (256, 384, 512),      # multi-tile, K-accumulation
    (100, 70, 130),       # nothing aligned -> host-side pad + slice
    (1, 128, 64),         # degenerate M
])
def test_int8_gemm_exact(m, n, k):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    got = int8_gemm(a, b, tiles=(128, 128, 128))
    assert got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref(a, b)))


def test_int8_gemm_extreme_values_no_overflow():
    # worst case |acc| = 127*127*K; K=1024 stays far inside int32
    k = 1024
    a = jnp.full((8, k), -127, jnp.int8)
    b = jnp.full((k, 128), 127, jnp.int8)
    got = int8_gemm(a, b, tiles=(8, 128, 256))
    assert int(got[0, 0]) == -127 * 127 * k


def test_int8_gemm_rejects_bad_dtypes():
    a = jnp.zeros((8, 8), jnp.float32)
    b = jnp.zeros((8, 8), jnp.int8)
    with pytest.raises(TypeError):
        int8_gemm(a, b)


def test_int8_gemm_rejects_shape_mismatch():
    a = jnp.zeros((8, 16), jnp.int8)
    b = jnp.zeros((8, 8), jnp.int8)
    with pytest.raises(ValueError):
        int8_gemm(a, b)


def test_int8_gemm_fused_dequant_epilogue():
    """scale/bias fused at the flush == dequantizing the s32 output,
    including unaligned N (scale padded with the operand)."""
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(-127, 128, (40, 96)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (96, 70)), jnp.int8)
    scale = jnp.asarray(rng.random(70) * 0.01 + 1e-4, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(70), jnp.float32)
    fused = int8_gemm(a, b, tiles=(32, 64, 32), scale=scale, bias=bias)
    s32 = int8_gemm(a, b, tiles=(32, 64, 32))
    want = s32.astype(jnp.float32) * scale + bias
    assert fused.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_int8_gemm_fused_bf16_out():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(-127, 128, (32, 64)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (64, 128)), jnp.int8)
    scale = jnp.full((128,), 3e-3, jnp.float32)
    fused = int8_gemm(a, b, tiles=(32, 128, 64), scale=scale,
                      out_dtype=jnp.bfloat16)
    s32 = int8_gemm(a, b, tiles=(32, 128, 64))
    want = (s32.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    assert fused.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(fused.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)))


def test_int8_gemm_bias_without_scale_rejected():
    a = jnp.zeros((8, 8), jnp.int8)
    b = jnp.zeros((8, 8), jnp.int8)
    with pytest.raises(ValueError, match="bias requires scale"):
        int8_gemm(a, b, bias=jnp.zeros((8,), jnp.float32))


def test_int8_gemm_relu_and_requant_epilogue():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(-127, 128, (32, 64)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (64, 128)), jnp.int8)
    scale = jnp.asarray(rng.standard_normal(128) * 1e-3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(128), jnp.float32)
    got = int8_gemm(a, b, tiles=(32, 128, 64), scale=scale, bias=bias,
                    relu=True, out_dtype=jnp.int8)
    s32 = int8_gemm(a, b, tiles=(32, 128, 64)).astype(jnp.float32)
    y = jnp.maximum(s32 * scale + bias, 0.0)
    want = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
