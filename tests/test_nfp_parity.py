"""NFP op parity: jnp oracle and Pallas kernel vs the PyTorch reference.

The PyTorch reference (``/root/reference/models/pooling/nfp.py``) is imported
at test time only, to produce golden outputs. Parity bar: ≤1e-4 elementwise
(BASELINE.json), usually much tighter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neighbour_feature_pooling_tpu.ops import (
    MEASURE_NAMES,
    nfp,
    nfp_reference,
    num_neighbors,
)
from neighbour_feature_pooling_tpu.ops.measures import SEPARABLE
from tests.conftest import add_reference_to_path, reference_available

torch = pytest.importorskip("torch")

# All reference-dispatched measures (mahalanobis raises in the reference).
REF_MEASURES = [m for m in MEASURE_NAMES if m not in ("sharpened_cosine",)]
# Measures whose reference implementation is per-sample correct. The
# reference's SCS mixes batch elements via a broadcast bug (nfp.py:344-374),
# so its parity test uses batch size 1 where the bug is inert.
BATCH_SAFE = [m for m in REF_MEASURES if m != "scs"]

ATOL = 1e-4


@pytest.fixture(scope="module")
def torch_nfp():
    if not reference_available():
        pytest.skip("reference tree not mounted")
    add_reference_to_path()
    from models.pooling.nfp import NFPPooling  # noqa: PLC0415

    return NFPPooling


def _golden(torch_nfp_cls, x_nchw: np.ndarray, **kwargs) -> np.ndarray:
    mod = torch_nfp_cls(in_channels=x_nchw.shape[1], **kwargs)
    with torch.no_grad():
        out = mod(torch.from_numpy(x_nchw))
    return out.numpy()


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("measure", BATCH_SAFE)
@pytest.mark.parametrize("similarity", [True, False])
def test_measure_parity_r1(torch_nfp, measure, similarity):
    x = _rand((2, 16, 7, 7), seed=hash(measure) % 2**31)
    golden = _golden(torch_nfp, x, R=1, measure=measure, padding=1,
                     similarity=similarity)
    ours = np.asarray(
        nfp_reference(jnp.asarray(x), 1, measure, similarity=similarity,
                      padding=1, data_format="NCHW"))
    assert ours.shape == golden.shape == (2, 8, 7, 7)
    np.testing.assert_allclose(ours, golden, atol=ATOL, rtol=1e-4)


def test_scs_parity_batch1(torch_nfp):
    # Batch size 1: the reference's batch-mixing broadcast bug is inert and
    # its output equals the mathematically correct per-sample SCS.
    x = _rand((1, 16, 7, 7), seed=7)
    golden = _golden(torch_nfp, x, R=1, measure="scs", padding=1, p=2.0)
    ours = np.asarray(
        nfp_reference(jnp.asarray(x), 1, "scs", p=2.0, padding=1,
                      data_format="NCHW"))
    np.testing.assert_allclose(ours, golden, atol=ATOL, rtol=1e-4)


def test_scs_no_batch_mixing():
    # Our SCS must be per-sample: perturbing sample 1 must not change sample 0.
    x = _rand((2, 16, 7, 7), seed=11)
    base = np.asarray(nfp_reference(jnp.asarray(x), 1, "scs", padding=1,
                                    data_format="NCHW"))
    x2 = x.copy()
    x2[1] += 1.0
    pert = np.asarray(nfp_reference(jnp.asarray(x2), 1, "scs", padding=1,
                                    data_format="NCHW"))
    np.testing.assert_allclose(base[0], pert[0], atol=1e-6)
    assert np.abs(base[1] - pert[1]).max() > 1e-3


@pytest.mark.parametrize("measure", ["cosine", "norm", "pearson"])
def test_geometry_variants(torch_nfp, measure):
    # R=2, padding=2; and R=1 padding=0 (shrinking); stride=2.
    for kwargs in (
        dict(R=2, padding=2),
        dict(R=1, padding=0),
        dict(R=1, padding=1, stride=2),
        dict(R=1, padding=1, dilation=2),
    ):
        x = _rand((2, 8, 9, 9), seed=3)
        golden = _golden(torch_nfp, x, measure=measure, **kwargs)
        ours = np.asarray(nfp_reference(
            jnp.asarray(x), kwargs.get("R", 1), measure,
            padding=kwargs.get("padding", 0), stride=kwargs.get("stride", 1),
            dilation=kwargs.get("dilation", 1), data_format="NCHW"))
        assert ours.shape == golden.shape, (kwargs, ours.shape, golden.shape)
        np.testing.assert_allclose(ours, golden, atol=ATOL, rtol=1e-4,
                                   err_msg=str(kwargs))


def test_zero_vector_cosine(torch_nfp):
    # eps-clamp semantics where a feature vector is exactly zero.
    x = _rand((1, 8, 5, 5), seed=5)
    x[0, :, 2, 2] = 0.0
    golden = _golden(torch_nfp, x, R=1, measure="cosine", padding=1)
    ours = np.asarray(nfp_reference(jnp.asarray(x), 1, "cosine", padding=1,
                                    data_format="NCHW"))
    np.testing.assert_allclose(ours, golden, atol=ATOL)


@pytest.mark.parametrize("measure", [m for m in MEASURE_NAMES
                                     if m != "sharpened_cosine"] + ["mahalanobis"])
def test_pallas_matches_oracle(measure):
    # Pallas kernel (interpret mode off-TPU) vs the jnp oracle, both layouts,
    # both the texture map and the fused-GAP output.
    x = jnp.asarray(_rand((2, 7, 7, 24), seed=13))
    for fuse_gap in (False, True):
        want = nfp_reference(x, 1, measure, padding=1, fuse_gap=fuse_gap)
        got = nfp(x, 1, measure, padding=1, fuse_gap=fuse_gap)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"{measure} fuse_gap={fuse_gap}")


def test_nfp_gradient_flows():
    x = jnp.asarray(_rand((2, 7, 7, 16), seed=17))

    def loss(xx):
        return jnp.sum(nfp(xx, 1, "cosine", padding=1, fuse_gap=True) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0

    # Gradient of the custom-vjp op == gradient of the oracle.
    def loss_ref(xx):
        return jnp.sum(nfp_reference(xx, 1, "cosine", padding=1,
                                     fuse_gap=True) ** 2)

    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_mahalanobis_extension_sane():
    x = jnp.asarray(_rand((2, 7, 7, 16), seed=19))
    out = nfp_reference(x, 1, "mahalanobis", padding=1)
    assert out.shape == (2, 7, 7, num_neighbors(1))
    assert bool(jnp.all(jnp.isfinite(out)))
    # distance convention: similarity=True negates.
    assert float(out.max()) <= 0.0


@pytest.mark.parametrize("measure", [m for m in MEASURE_NAMES
                                     if m != "sharpened_cosine"] + ["mahalanobis"])
def test_degenerate_inputs_finite(measure):
    """Constant and zero feature maps must produce finite outputs for every
    measure (eps guards); gradients may legitimately be non-finite for
    sqrt-at-zero distances, matching the reference math."""
    for x in (jnp.zeros((1, 5, 5, 8)),
              jnp.ones((1, 5, 5, 8)) * 0.7,
              jnp.ones((1, 5, 5, 8)) * -3.0):
        out = nfp_reference(x, 1, measure, padding=1)
        assert bool(jnp.all(jnp.isfinite(out))), measure


def test_separable_forms_match_pairwise():
    """Every measure's channel-accumulator form (measures.SEPARABLE) must
    reproduce its pairwise form exactly — the CHW kernel's math."""
    from neighbour_feature_pooling_tpu.ops.measures import (
        MEASURES, SEPARABLE, MeasureConfig)

    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal((4, 5, 16)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((4, 5, 16)).astype(np.float32))
    for p in (1.0, 2.0, 3.0):
        cfg = MeasureConfig(p=p)
        for name, sep in SEPARABLE.items():
            ref = MEASURES[name].pairwise(c, n, -1, cfg)
            sums = tuple(jnp.zeros((4, 5), jnp.float32)
                         for _ in range(sep.n_acc))
            for ci in range(16):
                terms = sep.map_terms(c[..., ci], n[..., ci], cfg)
                sums = tuple(s + t for s, t in zip(sums, terms))
            got = sep.finalize_sums(sums, 16, cfg)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"{name} p={p}")


@pytest.mark.parametrize("measure", sorted(SEPARABLE) + ["attention"])
def test_pallas_chw_kernel_matches_oracle_large_map(measure):
    """Large maps (>256 positions) route separable measures to the
    channels-first kernel body; parity vs the oracle on a 28x28 map
    (interpret mode off-TPU), both sign conventions, map + fused GAP."""
    from neighbour_feature_pooling_tpu.ops.nfp_pallas import nfp_pallas

    x = jnp.asarray(_rand((2, 28, 28, 16), seed=29))
    for fuse_gap in (False, True):
        for sim in (True, False):
            want = nfp_reference(x, 1, measure, similarity=sim, padding=1,
                                 fuse_gap=fuse_gap)
            got = nfp_pallas(x, 1, measure, similarity=sim, padding=1,
                             fuse_gap=fuse_gap, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
                err_msg=f"{measure} fuse_gap={fuse_gap} sim={sim}")


@pytest.mark.parametrize("measure", ["cosine", "norm", "rmse"])
def test_pallas_chw_vec_body_matches_oracle(measure):
    """The whole-C vector variant of the channels-first body
    (``chw_body="vec"``) matches the oracle at a C=64 large map — the
    shape (ResNet layer1 tap) where the per-channel fori body loses to
    the oracle and the vec body is the candidate replacement."""
    from neighbour_feature_pooling_tpu.ops.nfp_pallas import nfp_pallas

    x = jnp.asarray(_rand((2, 28, 28, 64), seed=37))
    for fuse_gap in (False, True):
        want = nfp_reference(x, 1, measure, padding=1, fuse_gap=fuse_gap)
        for body in ("vec", "fori"):
            got = nfp_pallas(x, 1, measure, padding=1, fuse_gap=fuse_gap,
                             interpret=True, chw_body=body)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
                err_msg=f"{measure} body={body} fuse_gap={fuse_gap}")


def test_pallas_chw_kernel_odd_width_and_r2():
    """CHW body geometry: non-square odd widths and R=2 (24 neighbors)."""
    from neighbour_feature_pooling_tpu.ops.nfp_pallas import nfp_pallas

    x = jnp.asarray(_rand((2, 30, 27, 12), seed=31))
    want = nfp_reference(x, 1, "cosine", padding=1)
    got = nfp_pallas(x, 1, "cosine", padding=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    x2 = jnp.asarray(_rand((1, 20, 19, 8), seed=32))
    want2 = nfp_reference(x2, 2, "cosine", padding=2)
    got2 = nfp_pallas(x2, 2, "cosine", padding=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=2e-5, rtol=1e-5)
