"""RADAM pooling op — Randomized-Autoencoder Deep Aggregation, batched.

Re-design of the reference RADAM path
(``/root/reference/models/radam_pooling.py`` + ``/root/reference/models/RNN.py``):

* The reference loops over the batch in Python and over M randomized
  autoencoders per sample (``radam_pooling.py:54-62``) and solves each
  1-hidden-neuron least-squares with ``torch.linalg.lstsq``
  (``RNN.py:42-54``). Here the whole thing is one batched expression: the
  Q=1 least-squares has the closed form ``β = (H·Xᵀ)/(H·Hᵀ)``, so the entire
  pooling is two matmuls + a sigmoid, vmapped over batch and M — fully
  vectorized on the MXU, no per-sample loop.

* The frozen random encoder weights come from an LCG sequence the reference
  ships as ``RAE_LCG_weights.pkl`` (loaded by CWD-relative path,
  ``RNN.py:95-98``). The sequence is exactly reproducible as
  ``V[0]=1; V[t] = (75·V[t−1] + 74) mod 65537`` (verified elementwise against
  the shipped pickle), so we regenerate it instead of shipping a data file.

* Orthogonalization (QR with sign-fixed diagonal, ``RNN.py:117-135``) and the
  2-D sin/cos positional encoding (``RNN.py:139-167``) are ported exactly.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import safe_sqrt

__all__ = [
    "lcg_sequence",
    "lcg_weights",
    "make_orthogonal",
    "positional_encoding_2d",
    "radam_alphas",
    "radam_pool",
    "lp_normalize_spatial",
]

_LCG_LEN = 262144  # length of the shipped sequence (RAE_LCG_weights.pkl)


@functools.lru_cache(maxsize=2)
def lcg_sequence(length: int = _LCG_LEN) -> np.ndarray:
    """The reference's LCG stream: V[0]=1, V[t]=(75·V[t−1]+74) mod 65537.

    Bit-exact replacement for ``RAE_LCG_weights.pkl`` (verified: max abs diff
    0.0 over all 262,144 entries). Matches the commented-out generator at
    ``RNN.py:103-109`` except for the shipped file's seed V[0]=1.
    """
    v = np.empty(length, dtype=np.int64)
    v[0] = 1
    a, b, c = 75, 74, (1 << 16) + 1
    for t in range(1, length):
        v[t] = (a * v[t - 1] + b) % c
    return v.astype(np.float32)


def lcg_weights(m: int, n: int, seed: int) -> np.ndarray:
    """Z-scored (m, n) slice of the LCG stream (``RNN.py:88-115``).

    Uses the unbiased std (ddof=1) to match ``torch.std`` defaults.
    """
    length = m * n
    if length == 1:
        return np.ones((1, 1), dtype=np.float32)
    v = lcg_sequence(max(_LCG_LEN, seed + length))[seed: seed + length]
    v = (v - v.mean()) / v.std(ddof=1)
    return v.reshape(m, n).astype(np.float32)


def make_orthogonal(t: np.ndarray) -> np.ndarray:
    """QR-orthogonalize rows/cols with sign-fixed diagonal (``RNN.py:117-135``)."""
    rows = t.shape[0]
    cols = t.size // rows
    flat = t.reshape(rows, cols)
    transposed = rows < cols
    if transposed:
        flat = flat.T
    q, r = np.linalg.qr(flat)
    ph = np.sign(np.diag(r))
    q = q * ph
    if transposed:
        q = q.T
    return q.astype(np.float32)


def positional_encoding_2d(d_model: int, height: int, width: int) -> np.ndarray:
    """2-D sin/cos positional encoding (``RNN.py:139-167``).

    ``d_model`` is internally bumped by 2 when not a multiple of 4 (the
    reference's quirk, ``RNN.py:150-153``) and the result sliced back.
    """
    d_orig = d_model
    if d_model % 4 != 0:
        d_model = d_model + 2
    pe = np.zeros((d_model, height, width), dtype=np.float32)
    half = d_model // 2
    div_term = np.exp(np.arange(0.0, half, 2) * -(math.log(10000.0) / half))
    pos_w = np.arange(0.0, width)[:, None]   # (W, 1)
    pos_h = np.arange(0.0, height)[:, None]  # (H, 1)
    sin_w = np.sin(pos_w * div_term).T       # (L, W)
    cos_w = np.cos(pos_w * div_term).T
    sin_h = np.sin(pos_h * div_term).T       # (L, H)
    cos_h = np.cos(pos_h * div_term).T
    pe[0:half:2, :, :] = np.repeat(sin_w[:, None, :], height, axis=1)
    pe[1:half:2, :, :] = np.repeat(cos_w[:, None, :], height, axis=1)
    pe[half::2, :, :] = np.repeat(sin_h[:, :, None], width, axis=2)
    pe[half + 1::2, :, :] = np.repeat(cos_h[:, :, None], width, axis=2)
    return pe[:d_orig]


def radam_alphas(m: int, in_channels: int, q: int = 1) -> np.ndarray:
    """Frozen encoder weights for the M RAEs.

    alpha_i = make_orthogonal(LCG(Q, P, seed=i·Q·P)) (``radam_pooling.py:36-41``,
    ``RNN.py:15``). Returns ``(M, Q, P)``.
    """
    return np.stack([
        make_orthogonal(lcg_weights(q, in_channels, seed=i * (q * in_channels)))
        for i in range(m)
    ])


def lp_normalize_spatial(x: jax.Array, p: float = 2.0, eps: float = 1e-10) -> jax.Array:
    """Lp-normalize each channel map over its spatial extent.

    Matches ``torch.nn.functional.normalize(x, p=p, dim=(2, 3))`` on NCHW
    (``radam_pooling.py:8-16, 30``) for NHWC input: the norm is taken over
    (H, W) per (batch, channel). p=2 is the production value (the only one
    the reference's RADAM path uses) and carries the hardened backward —
    a dead (all-zero) channel map otherwise NaNs the whole step:
    sqrt'(0)=inf times the maximum()-masked zero cotangent.
    """
    if p == 2.0:
        norm = safe_sqrt(jnp.sum(x * x, axis=(1, 2), keepdims=True))
    elif p == 1.0:
        norm = jnp.sum(jnp.abs(x), axis=(1, 2), keepdims=True)
    else:
        norm = jnp.sum(jnp.abs(x) ** p,
                       axis=(1, 2), keepdims=True) ** (1.0 / p)
    return x / jnp.maximum(norm, eps)


@functools.partial(jax.jit, static_argnames=("spatial_size",))
def radam_pool(
    x: jax.Array,
    alphas: jax.Array,
    pos_encoding: Optional[jax.Array] = None,
    spatial_size: Optional[int] = None,
) -> jax.Array:
    """RADAM aggregation: ``(B, H, W, C) → (B, Q=1, C)``.

    Args:
      x: NHWC feature map.
      alphas: frozen encoder weights ``(M, Q, C)`` from :func:`radam_alphas`.
      pos_encoding: ``(C, N)`` additive positional encoding (``RNN.py:43-44``),
        or None to disable.
      spatial_size: resize target (``radam_pooling.py:31``); identity for the
        reference's active configs (7→7, 14→14). Bilinear when needed.

    Returns:
      ``(B, 1, C)``: the sum over the M RAEs of the closed-form decoder
      weights β, NaN-scrubbed (``radam_pooling.py:58-62``).
    """
    b, h, w, c = x.shape
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = lp_normalize_spatial(x.astype(dtype))

    if spatial_size is not None and (h != spatial_size or w != spatial_size):
        xf = jax.image.resize(xf, (b, spatial_size, spatial_size, c), "bilinear")
        h = w = spatial_size
    n = h * w

    # (B, C, N) feature stack (radam_pooling.py:29-33)
    xs = jnp.transpose(xf, (0, 3, 1, 2)).reshape(b, c, n)
    if pos_encoding is not None:
        xs = xs + pos_encoding.astype(dtype)[None]

    al = alphas.astype(dtype)                    # (M, Q, C)
    # precision=HIGHEST: these contractions are the parity surface of the op
    # and negligible next to the backbone.
    hi = jax.lax.Precision.HIGHEST
    # H[b,m,q,n] = sigmoid(Σ_c α[m,q,c] · X[b,c,n])   (RNN.py:49)
    hh = jax.nn.sigmoid(jnp.einsum("mqc,bcn->bmqn", al, xs,
                                   preferred_element_type=dtype, precision=hi))
    # β[b,m,q,c] = (H·Xᵀ)/(H·Hᵀ): closed-form lstsq for Q=1 (RNN.py:53)
    hx = jnp.einsum("bmqn,bcn->bmqc", hh, xs,
                    preferred_element_type=dtype, precision=hi)
    h2 = jnp.sum(hh * hh, axis=-1)               # (B, M, Q)
    # masked division: a fully saturated RAE (H underflows to 0 → h2 == 0)
    # contributes 0 exactly like the reference's NaN→nan_to_num scrub
    # (radam_pooling.py:61), but with finite gradients — plain hx/h2 makes
    # the backward pass NaN through the scrub's zero cotangent
    dead = h2 <= 0.0
    beta = jnp.where(dead[..., None], 0.0,
                     hx / jnp.where(dead, 1.0, h2)[..., None])
    pooled = jnp.sum(beta, axis=1)               # (B, Q, C), Σ over M RAEs
    pooled = jnp.nan_to_num(pooled)
    return pooled.astype(x.dtype)
