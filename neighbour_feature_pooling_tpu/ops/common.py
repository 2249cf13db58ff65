"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["use_interpret", "dequant_epilogue"]


def use_interpret() -> bool:
    """Pallas kernels compile via Mosaic on TPU and fall back to
    interpret mode everywhere else (the CPU test backend)."""
    return jax.default_backend() != "tpu"


def dequant_epilogue(acc, s_ref, b_ref, out_dtype, relu: bool):
    """Fused dequant epilogue shared by the int8 kernels:
    ``acc·scale + bias`` (vectors broadcast as (1, tn) blocks), optional
    ReLU, and — when the output dtype is int8 — saturating
    round-to-nearest requantization (the caller pre-divides scale/bias
    by the consumer's activation scale, so no extra operand is needed)."""
    y = acc.astype(jnp.float32) * s_ref[:] + b_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_dtype == jnp.int8:
        y = jnp.clip(jnp.round(y), -127.0, 127.0)
    return y.astype(out_dtype)
