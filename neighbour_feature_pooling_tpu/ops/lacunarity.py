"""Lacunarity pooling op.

Re-design of the reference ``Base_Lacunarity``
(``/root/reference/models/Lacunarity_Pooling.py:15-51``): map features through
``((tanh(x)+1)/2)·255`` and compute the normalized second moment

    L = (n² · E[x²]) / ((n · E[x])² + eps) − 1

where the expectations are global spatial means (``kernel=None``) or local
windowed means (``kernel``/``stride`` given), and ``n`` is the number of
spatial points of the *input* map (``Lacunarity_Pooling.py:47``, note: the
reference uses the input's H·W even for the windowed variant — replicated).

Fused: two reduce-windows over an elementwise-transformed map; XLA fuses the
tanh/scale/square into the reductions, nothing is materialized in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["base_lacunarity"]


def _avg_pool(x: jax.Array, kernel: Tuple[int, ...], stride: Tuple[int, ...]) -> jax.Array:
    """VALID average pool over the spatial axes (1..ndim-2) of a channels-last array."""
    window = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, "VALID")
    count = 1
    for k in kernel:
        count *= k
    return summed / count


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "eps", "keep_spatial"))
def base_lacunarity(
    x: jax.Array,
    kernel: Optional[Tuple[int, ...]] = None,
    stride: Optional[Tuple[int, ...]] = None,
    eps: float = 1e-6,
    keep_spatial: bool = False,
) -> jax.Array:
    """Lacunarity of a channels-last feature map.

    Args:
      x: ``(B, *spatial, C)`` with 1, 2 or 3 spatial axes (the reference's
        ``dim=1/2/3`` support, ``Lacunarity_Pooling.py:25-42``).
      kernel/stride: local windowed variant; ``None`` = global (adaptive 1×1).
      eps: stability constant (``Lacunarity_Pooling.py:16``).
      keep_spatial: if True return the windowed map ``(B, *spatial', C)``;
        otherwise squeeze global pooling to ``(B, C)``.

    Returns:
      Lacunarity values, ``(B, C)`` for the global variant.
    """
    if x.ndim < 3:
        raise ValueError(f"expected (B, *spatial, C), got shape {x.shape}")
    spatial_axes = tuple(range(1, x.ndim - 1))
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(dtype)

    # Normalize to [0, 255] (Lacunarity_Pooling.py:45). (tanh(x)+1)/2 is
    # computed as the algebraically identical sigmoid(2x): at negative
    # saturation tanh(x)+1 cancels catastrophically in float32 (the
    # reference's form loses ~5 digits there), sigmoid does not.
    xn = jax.nn.sigmoid(2.0 * xf) * 255.0

    # n = np.prod(x.shape[-2:]) of the reference's channels-FIRST tensor
    # (Lacunarity_Pooling.py:47) — replicated exactly, including its
    # cross-dim quirks: for dim=2 that is H·W, but for dim=1 it counts the
    # channel axis too (C·L) and for dim=3 it drops the depth axis (H·W).
    # Normally invisible (n cancels up to the eps term) — it only shows at
    # tanh saturation, where E[x] ≈ 0 and lac ≈ n²·E[x²]/eps.
    if x.ndim == 3:        # (B, L, C)  ~ reference (B, C, L)
        n_pts = float(x.shape[1] * x.shape[2])
    elif x.ndim == 5:      # (B, D, H, W, C) ~ reference (B, C, D, H, W)
        n_pts = float(x.shape[2] * x.shape[3])
    else:                  # (B, H, W, C)
        n_pts = float(x.shape[1] * x.shape[2])

    if kernel is None:
        ex = jnp.mean(xn, axis=spatial_axes)        # (B, C)
        ex2 = jnp.mean(xn * xn, axis=spatial_axes)  # (B, C)
    else:
        stride = stride if stride is not None else kernel
        ex = _avg_pool(xn, kernel, stride)
        ex2 = _avg_pool(xn * xn, kernel, stride)

    lac = (n_pts ** 2 * ex2) / ((n_pts * ex) ** 2 + eps) - 1.0
    if kernel is not None and not keep_spatial:
        lac = jnp.mean(lac, axis=spatial_axes)
    return lac.astype(x.dtype)
