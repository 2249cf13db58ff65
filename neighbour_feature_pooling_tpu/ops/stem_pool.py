"""Fused ResNet stem tail: BatchNorm -> ReLU -> 3x3/2 max-pool with a
hand-written backward (round-2 VERDICT directive #5).

The stock stem's backward is dominated by XLA's ``SelectAndScatter`` (the
autodiff rule for max-pool), which routes each pooled-output cotangent back
to its window argmax through a sequential select — historically one of the
slowest ops on TPU — and by the BatchNorm backward's extra passes over the
112x112 map (the largest activation in the network). This op:

* recomputes the pre-pool activation from the conv output in the backward
  pass instead of saving it (the 112^2 map never becomes a residual);
* replaces ``SelectAndScatter`` with a gather/scatter-free formulation:
  the first-argmax index of every 3x3 window is computed from nine shifted
  strided slices, and the cotangent is scattered back as nine
  interior-padded adds (``lax.pad`` with dilation) — all fusable
  elementwise work, same design language as the NFP op's shifted-slice
  neighborhoods (``ops/neighborhood.py``);
* collapses the BatchNorm backward into the closed form
  ``dx = (gamma*inv) * (da - mean(da) - xhat*mean(da*xhat))`` so the whole
  input gradient is one fused elementwise pass plus two channel reductions.

Tie semantics: XLA's ``SelectAndScatter`` (with the GE select of the
max-pool VJP) routes ties to the FIRST maximal element in row-major window
order; ``_first_argmax`` reproduces that exactly
(``tests/test_models.py::test_fused_stem_tail``, adversarial equal-value
plateaus included).

Behavior parity: flax ``nn.BatchNorm(momentum=0.9, eps=1e-5,
use_fast_variance=True)`` semantics — fp32 batch stats (biased variance),
running stats updated with the same batch stats, ``jax.nn.relu``'s
zero-gradient-at-zero, and ``nn.max_pool(3,3/2,2, pad 1)`` geometry
(reference stem: ``/root/reference`` uses torchvision resnet18's
conv7x7-BN-ReLU-maxpool, e.g. ``models/texture_pooling.py:19``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["bn_relu_maxpool"]

#: 3x3 window offsets in row-major order — the tie-break scan order of
#: XLA's SelectAndScatter.
_OFFSETS = tuple((dr, dc) for dr in range(3) for dc in range(3))


def _pool_geometry(h: int, w: int) -> Tuple[int, int]:
    # nn.max_pool((3,3), strides 2, padding ((1,1),(1,1)))
    return (h + 2 - 3) // 2 + 1, (w + 2 - 3) // 2 + 1


def _compute_dtype(x):
    # bf16 inputs stay bf16 through normalize/relu/pool (the stock stem's
    # bandwidth); stats and channel reductions stay fp32 regardless
    return x.dtype if x.dtype == jnp.bfloat16 else jnp.float32


def _forward(x, mean, var, scale, bias, eps):
    """normalize -> relu -> maxpool in the input's compute dtype; returns
    (y, a) with ``a`` the pre-relu activation (recomputed, never a
    residual)."""
    ct = _compute_dtype(x)
    inv = lax.rsqrt(var + eps)
    mul = (inv * scale).astype(ct)
    a = (x.astype(ct) - mean.astype(ct)) * mul + bias.astype(ct)
    z = jnp.maximum(a, jnp.zeros((), ct))
    y = lax.reduce_window(z, jnp.asarray(-jnp.inf, ct), lax.max,
                          (1, 3, 3, 1), (1, 2, 2, 1),
                          ((0, 0), (1, 1), (1, 1), (0, 0)))
    return y, a


def _window_slices(zp, oh, ow):
    """The nine stride-2 shifted views of the (+1,+1)-padded map, each of
    shape (B, oh, ow, C): element k at output position (i, j) is the
    window's k-th candidate (row-major)."""
    views = []
    for dr, dc in _OFFSETS:
        views.append(lax.slice(
            zp, (0, dr, dc, 0),
            (zp.shape[0], dr + 2 * (oh - 1) + 1, dc + 2 * (ow - 1) + 1,
             zp.shape[3]),
            (1, 2, 2, 1)))
    return views


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bn_relu_maxpool(x, mean, var, scale, bias, eps=1e-5):
    """``maxpool3x3/2(relu(batchnorm(x; mean, var, scale, bias)))``.

    ``mean``/``var`` are the (fp32, biased) batch statistics of ``x``
    computed by the caller; their cotangents are returned as zeros because
    the backward pass applies the full closed-form BatchNorm gradient
    (which already accounts for the stats' dependence on ``x``) to ``dx``.
    Output dtype follows ``_compute_dtype``: fp32 inputs stay fp32, bf16
    inputs produce bf16 (callers needing fp32 downstream must cast, as
    ``_FusedStemTail`` does).
    """
    y, _ = _forward(x, mean, var, scale, bias, eps)
    return y


def _fwd(x, mean, var, scale, bias, eps):
    y, _ = _forward(x, mean, var, scale, bias, eps)
    return y, (x, mean, var, scale, bias, y)


def _bwd(eps, res, dy):
    x, mean, var, scale, bias, y = res
    b, h, w, c = x.shape
    oh, ow = _pool_geometry(h, w)
    n = b * h * w

    ct = _compute_dtype(x)
    inv = lax.rsqrt(var + eps)
    xhat = (x.astype(jnp.float32) - mean) * inv
    # BITWISE-identical recompute of the forward's pre-relu activation
    # (same expressions/dtype as _forward) — the argmax equality check
    # against the saved pooled max breaks on one-ulp differences
    mul = (inv * scale).astype(ct)
    a = (x.astype(ct) - mean.astype(ct)) * mul + bias.astype(ct)

    # ---- max-pool backward, scatter-free -------------------------------
    zp = jnp.pad(jnp.maximum(a, jnp.zeros((), ct)),
                 ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    views = _window_slices(zp, oh, ow)
    # first-argmax (row-major) per window: ties go to the smallest k,
    # matching SelectAndScatter
    first = jnp.full((b, oh, ow, c), 9, jnp.int32)
    for k in range(9):
        first = jnp.where((first == 9) & (views[k] == y), k, first)
    # route dy to that position: nine interior-padded (stride-2 dilated)
    # adds over the padded map, then un-pad
    dyf = dy.astype(ct)
    dzp = jnp.zeros((b, h + 2, w + 2, c), ct)
    for k, (dr, dc) in enumerate(_OFFSETS):
        contrib = jnp.where(first == k, dyf, jnp.zeros((), ct))
        dzp = dzp + lax.pad(
            contrib, jnp.asarray(0.0, ct),
            ((0, 0, 0),
             (dr, (h + 2) - dr - (2 * (oh - 1) + 1), 1),
             (dc, (w + 2) - dc - (2 * (ow - 1) + 1), 1),
             (0, 0, 0)))
    dz = lax.slice(dzp, (0, 1, 1, 0), (b, h + 1, w + 1, c))

    # ---- relu + closed-form BatchNorm backward -------------------------
    da = jnp.where(a > 0, dz, jnp.zeros((), ct)).astype(jnp.float32)
    s1 = jnp.sum(da, axis=(0, 1, 2))          # = dbias
    s2 = jnp.sum(da * xhat, axis=(0, 1, 2))   # = dscale
    dx = ((scale * inv) * (da - s1 / n - xhat * (s2 / n))).astype(x.dtype)
    zeros_c = jnp.zeros_like(mean)
    return dx, zeros_c, zeros_c, s2.astype(scale.dtype), s1.astype(bias.dtype)


bn_relu_maxpool.defvjp(_fwd, _bwd)

