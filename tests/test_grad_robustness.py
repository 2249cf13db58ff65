"""Gradient robustness at degenerate inputs.

Trained networks routinely produce EXACTLY-zero feature slices (dead
ReLU/hardswish channels) and constant regions (center == neighbor).
``jnp.sqrt``'s JVP is infinite at 0, and the usual ``maximum(·, eps)`` /
``nan_to_num`` masking turns that into ``0 · inf = NaN`` — which NaN-poisons
the whole backward pass. torch special-cases the norm subgradient at 0, so
the reference trains through these inputs; ``ops.common.safe_sqrt`` matches
that. Caught live by ``scripts/reproduce_synthetic.py`` on
MobileNetV3+RADAM (all seeds collapsed to constant logits after one
NaN step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighbour_feature_pooling_tpu.ops import nfp_reference, radam_alphas, radam_pool
from neighbour_feature_pooling_tpu.ops.common import safe_sqrt
from neighbour_feature_pooling_tpu.ops.measures import MEASURE_NAMES
from neighbour_feature_pooling_tpu.ops.radam import lp_normalize_spatial


def _finite_tree(t):
    return all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(t))


def test_safe_sqrt_forward_bit_exact_and_grad_at_zero():
    s = jnp.asarray([0.0, 1e-30, 0.25, 4.0])
    np.testing.assert_array_equal(np.asarray(safe_sqrt(s)),
                                  np.asarray(jnp.sqrt(s)))
    g = jax.grad(lambda v: jnp.sum(safe_sqrt(v)))(s)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(g[0]) == 0.0                      # torch norm convention
    assert float(g[3]) == pytest.approx(0.25)      # 1/(2·sqrt(4))


def test_lp_normalize_grad_finite_with_dead_channels():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 4, 4, 16)).astype(np.float32))
    x = x.at[:, :, :, :8].set(0.0)  # dead channels
    g = jax.grad(lambda v: jnp.sum(lp_normalize_spatial(v) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_radam_grad_finite_with_dead_channels():
    c = 32
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 4, 4, c)).astype(np.float32))
    x = x.at[:, :, :, : c // 2].set(0.0)
    alphas = radam_alphas(4, c)

    def loss(v):
        return jnp.sum(radam_pool(v, alphas, spatial_size=7) ** 2)

    g = jax.grad(loss)(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert bool(jnp.any(g != 0))


def test_radam_dead_rae_contributes_zero_with_finite_grad():
    """h2 == 0 (fully saturated sigmoid, underflowed) must contribute 0
    like the reference's nan_to_num scrub — with finite gradients."""
    c = 16
    x = jnp.asarray(np.abs(np.random.default_rng(2)
                    .standard_normal((1, 7, 7, c))).astype(np.float32) + 0.1)
    # positive features + hugely negative alphas: sigmoid underflows to
    # exactly 0 at every position, so h2 == 0 for the (only) RAE
    alphas = -jnp.ones((1, 1, c)) * 1e6
    out = radam_pool(x, alphas, spatial_size=7)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    g = jax.grad(lambda v: jnp.sum(radam_pool(v, alphas,
                                              spatial_size=7)))(x)
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("measure", MEASURE_NAMES)
@pytest.mark.parametrize("case", ["constant", "dead_channels", "zeros"])
def test_nfp_measure_grads_finite_at_degenerate_inputs(measure, case):
    """Every measure's backward is finite where center == neighbor
    (constant map), where channels are dead, and on the all-zero map."""
    rng = np.random.default_rng(3)
    if case == "constant":
        x = np.ones((1, 5, 5, 8), np.float32) * 0.37
    elif case == "zeros":
        x = np.zeros((1, 5, 5, 8), np.float32)
    else:
        x = rng.standard_normal((1, 5, 5, 8)).astype(np.float32)
        x[..., :4] = 0.0
    x = jnp.asarray(x)

    def loss(v):
        return jnp.sum(nfp_reference(v, 1, measure, padding=1))

    val, g = jax.value_and_grad(loss)(x)
    assert bool(jnp.isfinite(val)), f"{measure}/{case}: fwd not finite"
    assert bool(jnp.all(jnp.isfinite(g))), f"{measure}/{case}: NaN/Inf grad"
