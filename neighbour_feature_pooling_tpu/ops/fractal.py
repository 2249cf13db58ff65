"""Fractal (differential box-counting) pooling op.

Re-design of the reference GDCB module
(``/root/reference/models/Fractal_Pooling.py:13-37``) as one fused XLA op:
five VALID max-pools (kernel i+2, stride (i+2)//2, i = 0..4) implemented with
``lax.reduce_window``, spatial sums, a log2 transform, and the closed-form
least-squares slope against X = [−log2(i+2)] — the per-channel fractal
dimension estimate.

The reference constructs the GDCB module inside every forward call
(``Fractal_Pooling.py:71``); here it is a pure function, traced once under jit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["gdcb_fractal_dim", "NLV_BCD"]

#: number of box-counting levels (reference ``nlv_bcd=6`` → 5 pools,
#: ``Fractal_Pooling.py:14, 20``).
NLV_BCD = 6


@functools.partial(jax.jit, static_argnames=("nlv_bcd",))
def gdcb_fractal_dim(x: jax.Array, nlv_bcd: int = NLV_BCD) -> jax.Array:
    """Differential-box-count fractal dimension per channel.

    Args:
      x: NHWC feature map ``(B, H, W, C)``.
      nlv_bcd: number of levels + 1; ``nlv_bcd − 1`` max-pool scales are used.

    Returns:
      ``(B, C)`` fractal-dimension estimates (the reference emits
      ``(B, C, 1, 1)``, ``Fractal_Pooling.py:36-37``; heads flatten it anyway).
    """
    if x.ndim != 4:
        raise ValueError(f"gdcb_fractal_dim expects NHWC, got shape {x.shape}")
    min_side = min(x.shape[1], x.shape[2])
    if min_side < nlv_bcd:
        # the reference's nn.MaxPool2d raises "Output size is too small" for
        # the same configuration; fail loudly instead of regressing against
        # zero-size pools
        raise ValueError(
            f"gdcb_fractal_dim needs a feature map of at least "
            f"{nlv_bcd}x{nlv_bcd}, got {x.shape[1]}x{x.shape[2]} "
            f"(increase input_size: the final CNN map is input_size/32)")
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(dtype)

    sums = []
    for i in range(nlv_bcd - 1):
        k = i + 2
        s = max(k // 2, 1)
        # literal -inf init value keeps reduce_window on the differentiable
        # max-pool path
        pooled = lax.reduce_window(
            xf, -jnp.inf, lax.max,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, s, s, 1),
            padding="VALID",
        )
        sums.append(jnp.sum(pooled, axis=(1, 2)))  # (B, C)

    y = jnp.stack(sums, axis=-1)                       # (B, C, L)
    y = jnp.log2(jax.nn.relu(y) + 1.0)                 # Fractal_Pooling.py:30
    xs = jnp.asarray([-math.log2(i + 2) for i in range(nlv_bcd - 1)], dtype)
    xc = xs - jnp.mean(xs)
    yc = y - jnp.mean(y, axis=-1, keepdims=True)
    slope = jnp.sum(yc * xc, axis=-1) / jnp.sum(xc * xc)  # (B, C)
    return slope.astype(x.dtype)
