"""Similarity / distance measure registry for Neighborhood Feature Pooling.

Every measure compares a *center* feature vector with a *neighbor* feature
vector along the channel axis and reduces it to a scalar per spatial position
and neighbor. The catalogue, the math, and the distance-vs-similarity sign
conventions mirror the reference implementation
(``/root/reference/models/pooling/nfp.py:141-374``); the implementations here
are written from scratch as pure ``jax.numpy`` functions so they can run both
inside Pallas kernel bodies (on VMEM-resident tiles) and in the plain XLA
reference path.

Conventions (reference ``nfp.py:74-80, 146-148``):

* *distance* measures (``norm``, ``rmse``, ``emd``, ``canberra``, ``hellinger``,
  ``chisquared1/2``, ``jeffrey``, ``squaredchord``, ``mahalanobis``) are negated
  when ``similarity=True`` (the default) so that "more similar" is larger.
* *similarity* measures are returned as-is when ``similarity=True``; with
  ``similarity=False`` they are either negated (``dot``, ``attention``, ``gfc``,
  ``pearson``, ``smith``) or flipped as ``1 - x`` (``cosine``, ``geman``, ``scs``).

Divergences from the reference (deliberate, documented):

* ``sharpened_cosine``/``scs``: the reference broadcast-bug mixes batch
  elements (``nfp.py:344-374`` produces a (B,B,N,H,W) tensor and means over
  dim=1). We implement the mathematically correct per-sample SCS:
  ``sign(cos) * |cos|**p`` with q-stabilized norms.
* ``mahalanobis``: listed in the reference's weight setup (``nfp.py:74``) but
  never dispatched (raises at ``nfp.py:120``). We implement a
  diagonal-covariance Mahalanobis distance as an extension; the per-channel
  inverse variance is supplied by the caller (computed over spatial positions).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .common import safe_sqrt

__all__ = [
    "MeasureConfig",
    "Measure",
    "MEASURES",
    "get_measure",
    "canonical_measure_name",
    "MEASURE_NAMES",
    "SeparableMeasure",
    "SEPARABLE",
    "get_separable",
]


@dataclasses.dataclass(frozen=True)
class MeasureConfig:
    """Static hyper-parameters threaded through measure evaluation.

    Mirrors the knobs of the reference op (``nfp.py:16-18``): ``eps`` the
    numerical-stability constant, ``p`` the norm order / SCS sharpening
    exponent, ``q_scs`` the SCS denominator stabilizer. ``inv_var`` is the
    per-channel inverse variance for the ``mahalanobis`` extension
    (broadcastable against the channel axis of the operands).
    """

    eps: float = 1e-6
    p: float = 1.0
    q_scs: float = 1e-6
    inv_var: Optional[jax.Array] = None


# --------------------------------------------------------------------------
# Pairwise kernels: (center, neighbor, axis, cfg) -> reduced-over-axis array.
# `center` and `neighbor` have identical shapes; `axis` is the channel axis.
# --------------------------------------------------------------------------


def _norm(c, n, axis, cfg):
    """L-p norm of (center - neighbor) over channels (``nfp.py:141-148``)."""
    d = c - n
    p = cfg.p
    if p == 1:
        return jnp.sum(jnp.abs(d), axis=axis)
    if p == 2:
        return safe_sqrt(jnp.sum(d * d, axis=axis))
    return jnp.sum(jnp.abs(d) ** p, axis=axis) ** (1.0 / p)


def _cosine(c, n, axis, cfg):
    """Cosine similarity with torch.nn.functional.cosine_similarity semantics
    (``nfp.py:150-159``): each L2 norm is clamped from below at ``eps``."""
    dot = jnp.sum(c * n, axis=axis)
    nc = safe_sqrt(jnp.sum(c * c, axis=axis))
    nn_ = safe_sqrt(jnp.sum(n * n, axis=axis))
    return dot / (jnp.maximum(nc, cfg.eps) * jnp.maximum(nn_, cfg.eps))


def _dot(c, n, axis, cfg):
    """Dot-product similarity (``nfp.py:161-170``)."""
    return jnp.sum(c * n, axis=axis)


def _rmse(c, n, axis, cfg):
    """Root mean squared difference over channels (``nfp.py:172-179``)."""
    d = c - n
    return safe_sqrt(jnp.mean(d * d, axis=axis))


def _geman(c, n, axis, cfg):
    """Geman–McClure robust measure, mean over channels (``nfp.py:181-193``)."""
    d2 = (c - n) ** 2
    return jnp.mean(d2 / (d2 + cfg.eps), axis=axis)


def _emd(c, n, axis, cfg):
    """Simplified Earth Mover's Distance = L1 (``nfp.py:207-216``)."""
    return jnp.sum(jnp.abs(c - n), axis=axis)


def _canberra(c, n, axis, cfg):
    """Canberra distance (``nfp.py:218-227``)."""
    return jnp.sum(jnp.abs(c - n) / (jnp.abs(c) + jnp.abs(n) + cfg.eps), axis=axis)


def _hellinger(c, n, axis, cfg):
    """Hellinger distance on |x|+eps surrogates (``nfp.py:229-241``)."""
    a = jnp.sqrt(jnp.abs(c) + cfg.eps)
    b = jnp.sqrt(jnp.abs(n) + cfg.eps)
    return safe_sqrt(0.5 * jnp.sum((a - b) ** 2, axis=axis))


def _chisquared1(c, n, axis, cfg):
    """Chi-squared distance, symmetric denominator (``nfp.py:243-252``)."""
    return jnp.sum((c - n) ** 2 / (jnp.abs(c) + jnp.abs(n) + cfg.eps), axis=axis)


def _chisquared2(c, n, axis, cfg):
    """Chi-squared distance, center-only denominator (``nfp.py:254-263``)."""
    return jnp.sum((c - n) ** 2 / (jnp.abs(c) + cfg.eps), axis=axis)


def _gfc(c, n, axis, cfg):
    """Goodness-of-Fit Coefficient: dot / (||c||·||n|| + eps) (``nfp.py:265-276``)."""
    num = jnp.sum(c * n, axis=axis)
    den = (safe_sqrt(jnp.sum(c * c, axis=axis))
           * safe_sqrt(jnp.sum(n * n, axis=axis)))
    return num / (den + cfg.eps)


def _pearson(c, n, axis, cfg):
    """Pearson correlation over channels (``nfp.py:278-293``)."""
    cc = c - jnp.mean(c, axis=axis, keepdims=True)
    nc = n - jnp.mean(n, axis=axis, keepdims=True)
    num = jnp.sum(cc * nc, axis=axis)
    den = jnp.sqrt(jnp.sum(cc * cc, axis=axis) * jnp.sum(nc * nc, axis=axis) + cfg.eps)
    return num / den


def _jeffrey(c, n, axis, cfg):
    """Jeffrey (symmetric KL) divergence on |x|+eps surrogates (``nfp.py:295-308``)."""
    a = jnp.abs(c) + cfg.eps
    b = jnp.abs(n) + cfg.eps
    log_ab = jnp.log(a / b)
    return jnp.sum(a * log_ab - b * log_ab, axis=axis)


def _squaredchord(c, n, axis, cfg):
    """Squared-chord distance on |x|+eps surrogates (``nfp.py:310-324``)."""
    a = jnp.sqrt(jnp.abs(c) + cfg.eps)
    b = jnp.sqrt(jnp.abs(n) + cfg.eps)
    return jnp.sum((a - b) ** 2, axis=axis)


def _smith(c, n, axis, cfg):
    """Smith dissimilarity on absolute values (``nfp.py:326-342``)."""
    ca = jnp.abs(c)
    na = jnp.abs(n)
    min_sum = jnp.sum(jnp.minimum(ca, na), axis=axis)
    denom = jnp.minimum(jnp.sum(ca, axis=axis), jnp.sum(na, axis=axis)) + cfg.eps
    return 1.0 - min_sum / denom


def _scs_from_cos(cos, p):
    """``sign(cos) * |cos|**p`` with NaN/Inf scrubbed to 0 — shared by the
    pairwise and separable SCS forms so the sharpening always applies to
    one and the same cosine value."""
    scs = jnp.sign(cos) * jnp.abs(cos) ** p
    return jnp.nan_to_num(scs, nan=0.0, posinf=0.0, neginf=0.0)


def _scs(c, n, axis, cfg):
    """Sharpened cosine similarity, per-sample correct form.

    ``sign(cos) * |cos|**p`` with cos = <c,n> / ((||c||+q)(||n||+q)), NaN/Inf
    scrubbed to 0. The reference (``nfp.py:344-374``) additionally mixes batch
    elements via a broadcasting bug; we intentionally do not replicate that.
    """
    nc = safe_sqrt(jnp.sum(c * c, axis=axis)) + cfg.q_scs
    nn_ = safe_sqrt(jnp.sum(n * n, axis=axis)) + cfg.q_scs
    return _scs_from_cos(jnp.sum(c * n, axis=axis) / (nc * nn_), cfg.p)


def _mahalanobis(c, n, axis, cfg):
    """Diagonal-covariance Mahalanobis distance (extension; see module docstring)."""
    if cfg.inv_var is None:
        raise ValueError(
            "mahalanobis requires cfg.inv_var (per-channel inverse variance); "
            "the nfp() entry point computes it automatically."
        )
    d = c - n
    return safe_sqrt(jnp.sum(d * d * cfg.inv_var, axis=axis))


# --------------------------------------------------------------------------
# Finalization: distance/similarity sign conventions, per-measure.
# --------------------------------------------------------------------------

# "neg_if_sim": distance measure, negate when similarity=True  (nfp.py:146-148)
# "neg_if_dist": similarity measure, negate when similarity=False (nfp.py:168-169)
# "one_minus_if_dist": similarity measure, 1-x when similarity=False (nfp.py:157-158)
_FINALIZE: Dict[str, Callable[[jax.Array, bool], jax.Array]] = {
    "neg_if_sim": lambda x, sim: -x if sim else x,
    "neg_if_dist": lambda x, sim: x if sim else -x,
    "one_minus_if_dist": lambda x, sim: x if sim else 1.0 - x,
}


@dataclasses.dataclass(frozen=True)
class Measure:
    """A registered NFP measure.

    Attributes:
      name: canonical CLI name (``demo.py:440-445``).
      pairwise: ``f(center, neighbor, axis, cfg)`` reducing ``axis``.
      finalize_kind: one of the ``_FINALIZE`` keys.
      needs_softmax_over_neighbors: apply softmax over the neighbor axis
        *before* finalization (the ``attention`` measure, ``nfp.py:195-205``).
      is_distance: True if the raw value grows with dissimilarity.
    """

    name: str
    pairwise: Callable
    finalize_kind: str
    needs_softmax_over_neighbors: bool = False
    is_distance: bool = False

    def finalize(self, x: jax.Array, similarity: bool) -> jax.Array:
        return _FINALIZE[self.finalize_kind](x, similarity)


MEASURES: Dict[str, Measure] = {
    "norm": Measure("norm", _norm, "neg_if_sim", is_distance=True),
    "cosine": Measure("cosine", _cosine, "one_minus_if_dist"),
    "dot": Measure("dot", _dot, "neg_if_dist"),
    "rmse": Measure("rmse", _rmse, "neg_if_sim", is_distance=True),
    "geman": Measure("geman", _geman, "one_minus_if_dist"),
    "attention": Measure("attention", _dot, "neg_if_dist", needs_softmax_over_neighbors=True),
    "emd": Measure("emd", _emd, "neg_if_sim", is_distance=True),
    "canberra": Measure("canberra", _canberra, "neg_if_sim", is_distance=True),
    "hellinger": Measure("hellinger", _hellinger, "neg_if_sim", is_distance=True),
    "chisquared1": Measure("chisquared1", _chisquared1, "neg_if_sim", is_distance=True),
    "chisquared2": Measure("chisquared2", _chisquared2, "neg_if_sim", is_distance=True),
    "gfc": Measure("gfc", _gfc, "neg_if_dist"),
    "pearson": Measure("pearson", _pearson, "neg_if_dist"),
    "jeffrey": Measure("jeffrey", _jeffrey, "neg_if_sim", is_distance=True),
    "squaredchord": Measure("squaredchord", _squaredchord, "neg_if_sim", is_distance=True),
    "smith": Measure("smith", _smith, "neg_if_dist"),
    "scs": Measure("scs", _scs, "one_minus_if_dist"),
    "mahalanobis": Measure("mahalanobis", _mahalanobis, "neg_if_sim", is_distance=True),
}

_ALIASES = {"sharpened_cosine": "scs"}

#: Canonical CLI names, in the reference's CLI order (``demo.py:440-445``).
MEASURE_NAMES = [
    "norm", "cosine", "dot", "rmse", "geman", "attention", "emd",
    "canberra", "hellinger", "chisquared1", "chisquared2", "gfc",
    "pearson", "jeffrey", "squaredchord", "smith", "sharpened_cosine", "scs",
]


# --------------------------------------------------------------------------
# Separable (channel-accumulator) forms.
#
# Almost every measure is Σ_c f(center_c, neighbor_c) over channels followed
# by a scalar finalization. This decomposition lets a kernel iterate channels
# as an accumulation loop while keeping the SPATIAL axes on the VPU lanes —
# essential when C is small (the 112×112×16 MobileNetV3 stage-1 tap packs
# only 16 of 128 lanes if channels sit on the minor axis, an 8× slowdown).
# `map_terms` returns the per-channel addends; `finalize_sums` turns the
# accumulated sums into the measure value (identical math to `pairwise`,
# reassociated only).
#
# Not separable: `pearson` (centered two-pass form), `mahalanobis`
# (per-sample statistics). `attention` = separable `dot` + a softmax that
# runs outside the kernel anyway.
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SeparableMeasure:
    """Channel-accumulated form: value = finalize_sums(Σ_c map_terms(c, n))."""

    n_acc: int
    map_terms: Callable  # (c, n, cfg) -> tuple of n_acc per-channel terms
    finalize_sums: Callable  # (sums tuple, num_channels, cfg) -> value


def _sep_norm_terms(c, n, cfg):
    d = jnp.abs(c - n)
    if cfg.p == 1:
        return (d,)
    return (d * d,) if cfg.p == 2 else (d ** cfg.p,)


def _sep_norm_fin(s, nc, cfg):
    if cfg.p == 1:
        return s[0]
    return safe_sqrt(s[0]) if cfg.p == 2 else s[0] ** (1.0 / cfg.p)


SEPARABLE: Dict[str, SeparableMeasure] = {
    "norm": SeparableMeasure(1, _sep_norm_terms, _sep_norm_fin),
    "cosine": SeparableMeasure(
        3, lambda c, n, cfg: (c * n, c * c, n * n),
        lambda s, nc, cfg: s[0] / (jnp.maximum(safe_sqrt(s[1]), cfg.eps)
                                   * jnp.maximum(safe_sqrt(s[2]), cfg.eps))),
    "dot": SeparableMeasure(1, lambda c, n, cfg: (c * n,),
                            lambda s, nc, cfg: s[0]),
    "attention": SeparableMeasure(1, lambda c, n, cfg: (c * n,),
                                  lambda s, nc, cfg: s[0]),
    "rmse": SeparableMeasure(1, lambda c, n, cfg: ((c - n) ** 2,),
                             lambda s, nc, cfg: safe_sqrt(s[0] / nc)),
    "geman": SeparableMeasure(
        1, lambda c, n, cfg: (((c - n) ** 2) / ((c - n) ** 2 + cfg.eps),),
        lambda s, nc, cfg: s[0] / nc),
    "emd": SeparableMeasure(1, lambda c, n, cfg: (jnp.abs(c - n),),
                            lambda s, nc, cfg: s[0]),
    "canberra": SeparableMeasure(
        1, lambda c, n, cfg: (jnp.abs(c - n)
                              / (jnp.abs(c) + jnp.abs(n) + cfg.eps),),
        lambda s, nc, cfg: s[0]),
    "hellinger": SeparableMeasure(
        1, lambda c, n, cfg: ((jnp.sqrt(jnp.abs(c) + cfg.eps)
                               - jnp.sqrt(jnp.abs(n) + cfg.eps)) ** 2,),
        lambda s, nc, cfg: safe_sqrt(0.5 * s[0])),
    "chisquared1": SeparableMeasure(
        1, lambda c, n, cfg: ((c - n) ** 2
                              / (jnp.abs(c) + jnp.abs(n) + cfg.eps),),
        lambda s, nc, cfg: s[0]),
    "chisquared2": SeparableMeasure(
        1, lambda c, n, cfg: ((c - n) ** 2 / (jnp.abs(c) + cfg.eps),),
        lambda s, nc, cfg: s[0]),
    "gfc": SeparableMeasure(
        3, lambda c, n, cfg: (c * n, c * c, n * n),
        lambda s, nc, cfg: s[0] / (safe_sqrt(s[1]) * safe_sqrt(s[2])
                                   + cfg.eps)),
    "jeffrey": SeparableMeasure(
        1, lambda c, n, cfg: (
            ((jnp.abs(c) + cfg.eps) - (jnp.abs(n) + cfg.eps))
            * jnp.log((jnp.abs(c) + cfg.eps) / (jnp.abs(n) + cfg.eps)),),
        lambda s, nc, cfg: s[0]),
    "squaredchord": SeparableMeasure(
        1, lambda c, n, cfg: ((jnp.sqrt(jnp.abs(c) + cfg.eps)
                               - jnp.sqrt(jnp.abs(n) + cfg.eps)) ** 2,),
        lambda s, nc, cfg: s[0]),
    "smith": SeparableMeasure(
        3, lambda c, n, cfg: (jnp.minimum(jnp.abs(c), jnp.abs(n)),
                              jnp.abs(c), jnp.abs(n)),
        lambda s, nc, cfg: 1.0 - s[0] / (jnp.minimum(s[1], s[2]) + cfg.eps)),
    "scs": SeparableMeasure(
        3, lambda c, n, cfg: (c * n, c * c, n * n),
        lambda s, nc, cfg: _scs_from_cos(
            s[0] / ((safe_sqrt(s[1]) + cfg.q_scs)
                    * (safe_sqrt(s[2]) + cfg.q_scs)), cfg.p)),
}


def get_separable(name: str) -> Optional[SeparableMeasure]:
    return SEPARABLE.get(canonical_measure_name(name))


def canonical_measure_name(name: str) -> str:
    name = name.lower()
    return _ALIASES.get(name, name)


def get_measure(name: str) -> Measure:
    key = canonical_measure_name(name)
    if key not in MEASURES:
        raise ValueError(
            f"Similarity measure {name!r} not implemented; "
            f"available: {sorted(MEASURES)}"
        )
    return MEASURES[key]
