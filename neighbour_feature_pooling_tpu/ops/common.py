"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["use_interpret", "dequant_epilogue", "safe_sqrt"]


@jax.custom_jvp
def safe_sqrt(s):
    """``sqrt`` with a ZERO derivative at exactly 0 (torch's norm
    subgradient convention).

    ``jnp.sqrt``'s JVP is ``0.5/sqrt(s)`` = inf at s=0; any downstream
    masking (``maximum(norm, eps)``, ``nan_to_num``) multiplies that inf by
    a zero cotangent and produces NaN — which is how an all-zero (dead)
    feature channel NaN-poisons a whole training step (caught live by
    ``scripts/reproduce_synthetic.py`` on MobileNetV3+RADAM: every
    post-hardswish dead channel hits ``lp_normalize_spatial``'s sqrt at 0).
    torch defines the L2-norm subgradient at 0 as 0
    (``torch.nn.functional.normalize`` / ``torch.norm`` semantics), so the
    reference trains through the same inputs; this matches it. Forward is
    bit-exact ``jnp.sqrt``.
    """
    return jnp.sqrt(s)


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (s,), (t,) = primals, tangents
    y = jnp.sqrt(s)
    deriv = jnp.where(s > 0, 0.5 / jnp.where(s > 0, y, 1.0), 0.0)
    return y, (deriv * t).astype(y.dtype)


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
