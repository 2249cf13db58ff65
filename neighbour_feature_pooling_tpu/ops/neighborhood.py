"""Neighborhood Feature Pooling (NFP) — pure-XLA reference implementation.

The scientific core of the framework: for every spatial position of a feature
map, compare the center feature vector with each of its k×k−1 neighbors
(k = 2·radius+1) under a selectable similarity/distance measure, producing a
``(B, H', W', k²−1)`` texture map.

This module is the *semantics oracle* and autodiff path. It is written
TPU-first: NHWC layout (channel minor = VPU lanes), the neighborhood is
materialized as 8 static shifted **slices** of one padded tensor (no gather,
no conv, no dynamic shapes), and each per-neighbor channel reduction is an
independent elementwise+reduce fusion for XLA — the (B,H,W,N,C) neighbor
tensor of the reference PyTorch op (``/root/reference/models/pooling/nfp.py:
42-47``, an 8× activation blow-up) is never materialized.

The fused Pallas kernel in ``nfp_pallas.py`` implements the same math on VMEM
tiles; this function serves as its parity oracle and backward-pass body.

Semantics match ``/root/reference/models/pooling/nfp.py`` (verified ≤1e-5 by
``tests/test_nfp_parity.py`` against the PyTorch reference):

* neighbor ordering: row-major cartesian product of kernel indices minus the
  center (``nfp.py:64-67``);
* padding: applied symmetrically before extraction, default ``reflect``
  (``nfp.py:16-18``);
* conv arithmetic: ``H' = (H + 2·padding − dilation·(k−1) − 1)//stride + 1``
  (``nfp.py:125-130``);
* the distance/similarity sign conventions live in ``measures.py``.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .measures import MeasureConfig, get_measure

__all__ = [
    "nfp_reference",
    "nfp_output_size",
    "neighbor_offsets",
    "pad_spatial",
    "num_neighbors",
]

# torch padding_mode -> jnp.pad mode (``nfp.py:16`` default 'reflect')
_PAD_MODES = {
    "reflect": "reflect",
    "zeros": "constant",
    "replicate": "edge",
    "circular": "wrap",
}


def num_neighbors(radius: int) -> int:
    """k²−1 for k = 2·radius+1 (``nfp.py:37-39``)."""
    k = 2 * radius + 1
    return k * k - 1


def neighbor_offsets(radius: int) -> List[Tuple[int, int]]:
    """Row-major k×k kernel taps excluding the center (``nfp.py:64-67``)."""
    k = 2 * radius + 1
    return [(i, j) for i in range(k) for j in range(k) if not (i == radius and j == radius)]


def nfp_output_size(size: int, radius: int, stride: int, padding: int, dilation: int) -> int:
    """Conv output arithmetic (``nfp.py:125-130``)."""
    k = 2 * radius + 1
    return (size + 2 * padding - dilation * (k - 1) - 1) // stride + 1


def pad_spatial(x: jax.Array, padding: int, padding_mode: str) -> jax.Array:
    """Pad H and W of an NHWC tensor."""
    if padding == 0:
        return x
    mode = _PAD_MODES.get(padding_mode)
    if mode is None:
        raise ValueError(f"Unsupported padding_mode {padding_mode!r}; "
                         f"one of {sorted(_PAD_MODES)}")
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    if mode == "constant":
        return jnp.pad(x, pads, mode="constant", constant_values=0)
    return jnp.pad(x, pads, mode=mode)


def _tap(xp: jax.Array, i: int, j: int, h_out: int, w_out: int,
         stride: int, dilation: int) -> jax.Array:
    """Static strided slice selecting kernel tap (i, j) for every output position."""
    hi = i * dilation
    wj = j * dilation
    return xp[:, hi: hi + (h_out - 1) * stride + 1: stride,
              wj: wj + (w_out - 1) * stride + 1: stride, :]


def _to_nhwc(x: jax.Array, data_format: str) -> jax.Array:
    if data_format == "NHWC":
        return x
    if data_format == "NCHW":
        return jnp.transpose(x, (0, 2, 3, 1))
    raise ValueError(f"data_format must be NHWC or NCHW, got {data_format!r}")


def _measure_config(x_nhwc: jax.Array, measure_name: str, eps: float, p: float,
                    q_scs: float) -> MeasureConfig:
    inv_var = None
    if measure_name == "mahalanobis":
        # Diagonal covariance over each sample's spatial positions (extension;
        # the reference lists mahalanobis but never implements it, nfp.py:74,120).
        var = jnp.var(x_nhwc, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        inv_var = 1.0 / (var + eps)
    return MeasureConfig(eps=eps, p=p, q_scs=q_scs, inv_var=inv_var)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "measure", "similarity", "p", "eps", "q_scs", "stride",
        "padding", "dilation", "padding_mode", "data_format", "fuse_gap",
    ),
)
def nfp_reference(
    x: jax.Array,
    radius: int = 1,
    measure: str = "cosine",
    *,
    similarity: bool = True,
    p: float = 1.0,
    eps: float = 1e-6,
    q_scs: float = 1e-6,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    padding_mode: str = "reflect",
    data_format: str = "NHWC",
    fuse_gap: bool = False,
) -> jax.Array:
    """Neighborhood Feature Pooling, pure XLA.

    Args:
      x: feature map, ``(B, H, W, C)`` (NHWC, native) or ``(B, C, H, W)``.
      radius: neighborhood radius R; kernel size k = 2R+1 (``nfp.py:37-39``).
      measure: one of the 17 registered measures + aliases (``demo.py:440-445``).
      similarity: sign convention flag (``nfp.py:29, 146-148``).
      p: norm order / SCS sharpening exponent (``nfp.py:16``).
      eps / q_scs: stability constants (``nfp.py:18``).
      stride / padding / dilation / padding_mode: conv-style extraction
        geometry (``nfp.py:16-18``).
      data_format: layout of ``x``; the output matches (NHWC → (B,H',W',N),
        NCHW → (B,N,H',W') as the reference emits).
      fuse_gap: additionally mean-pool over space, returning ``(B, N)``. This
        is the fusion the texture heads use (``NFP_Pooling.py:31``) and avoids
        materializing the texture map at all.

    Returns:
      The texture map, or its spatial mean when ``fuse_gap``.
    """
    xh = _to_nhwc(x, data_format)
    if xh.ndim != 4:
        raise ValueError(f"nfp expects a 4-D feature map, got shape {x.shape}")
    b, h, w, c = xh.shape
    m = get_measure(measure)
    cfg = _measure_config(xh, m.name, eps, p, q_scs)

    xp = pad_spatial(xh, padding, padding_mode)
    h_out = nfp_output_size(h, radius, stride, padding, dilation)
    w_out = nfp_output_size(w, radius, stride, padding, dilation)
    if h_out < 1 or w_out < 1:
        raise ValueError(
            f"NFP output size {h_out}x{w_out} invalid for input {h}x{w}, "
            f"R={radius}, stride={stride}, padding={padding}, dilation={dilation}"
        )

    center = _tap(xp, radius, radius, h_out, w_out, stride, dilation)
    compute_dtype = jnp.promote_types(xh.dtype, jnp.float32)
    center = center.astype(compute_dtype)

    per_neighbor = []
    for (i, j) in neighbor_offsets(radius):
        nb = _tap(xp, i, j, h_out, w_out, stride, dilation).astype(compute_dtype)
        per_neighbor.append(m.pairwise(center, nb, -1, cfg))
    out = jnp.stack(per_neighbor, axis=-1)  # (B, H', W', N)

    if m.needs_softmax_over_neighbors:
        out = jax.nn.softmax(out, axis=-1)
    out = m.finalize(out, similarity)
    out = out.astype(xh.dtype)

    if fuse_gap:
        return jnp.mean(out, axis=(1, 2))  # (B, N)
    if data_format == "NCHW":
        return jnp.transpose(out, (0, 3, 1, 2))  # (B, N, H', W')
    return out
