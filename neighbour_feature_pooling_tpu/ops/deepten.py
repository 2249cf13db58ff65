"""DeepTEN encoding op (Zhang et al., CVPR 2017).

Re-design of the reference ``DeepTENEncoding``
(``/root/reference/models/deepten.py:7-58``) without the (B, N, K, D)
residual tensor the reference materializes twice (``deepten.py:31-49``):
the scaled-L2 distances are computed with direct residuals scanned over
the K codewords — exact, where the ``‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²`` matmul
expansion was measured to lose ~1e-3 relative accuracy to fp32
cancellation — and the residual aggregation collapses to one MXU einsum,
``E = AᵀX − (Σₙ A)·C``. Neither pass ever holds more than (B, N) per
codeword or (B, K, D) total.

Parameter initialization matches ``deepten.py:26-29``: codewords
uniform(−1/√(K·D), 1/√(K·D)), smoothing scale uniform(−1, 0).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["deepten_init", "deepten_encode"]


def deepten_init(key: jax.Array, num_codes: int, in_channels: int,
                 dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Initialize (codewords (K, D), scale (K,)) per ``deepten.py:26-29``."""
    k_cw, k_s = jax.random.split(key)
    std = 1.0 / (num_codes * in_channels) ** 0.5
    codewords = jax.random.uniform(k_cw, (num_codes, in_channels), dtype,
                                   minval=-std, maxval=std)
    scale = jax.random.uniform(k_s, (num_codes,), dtype, minval=-1.0, maxval=0.0)
    return codewords, scale


def deepten_encode(x: jax.Array, codewords: jax.Array, scale: jax.Array) -> jax.Array:
    """Soft-assign residual encoding.

    Args:
      x: features ``(B, N, D)`` (N = flattened spatial positions).
      codewords: ``(K, D)`` learnable codebook.
      scale: ``(K,)`` learnable smoothing factors.

    Returns:
      ``(B, K·D)`` flattened residual encoding (``deepten.py:51-58``).
    """
    if x.ndim != 3:
        raise ValueError(f"deepten_encode expects (B, N, D), got {x.shape}")
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(dtype)
    c = codewords.astype(dtype)
    s = scale.astype(dtype)

    b, n, d = xf.shape
    k = c.shape[0]

    # scaled-L2 soft assignment logits: -s_k * ||x_i - c_k||²  (deepten.py:31-40)
    # Distances are computed with direct residuals, scanned over the K
    # codewords: exact (the ||x||²-2x·c+||c||² matmul expansion loses ~1e-3
    # relative accuracy to cancellation in fp32) while still never
    # materializing the (B, N, K, D) residual tensor.
    def _dist_k(_, ck):
        d = xf - ck[None, None, :]
        return _, jnp.sum(d * d, axis=-1)                    # (B, N)

    _, dist_knb = jax.lax.scan(_dist_k, None, c)             # (K, B, N)
    dist = jnp.transpose(dist_knb, (1, 2, 0))                # (B, N, K)
    logits = -s[None, None, :] * dist
    a = jax.nn.softmax(logits, axis=2)                       # (B, N, K)

    # residual aggregation: E_k = Σ_n a_nk (x_n - c_k) = AᵀX - (Σ_n a_nk) c_k
    # (deepten.py:42-49, without the (B,K,N,D) tensor)
    # precision=HIGHEST: full-fp32 accumulation — the encoding is a parity
    # surface (≤1e-4 vs the reference) and tiny next to the backbone.
    ax = jnp.einsum("bnk,bnd->bkd", a, xf,
                    preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST)     # (B, K, D), MXU
    a_sum = jnp.sum(a, axis=1)                               # (B, K)
    e = ax - a_sum[..., None] * c[None, :, :]                # (B, K, D)
    return e.reshape(b, k * d).astype(x.dtype)
