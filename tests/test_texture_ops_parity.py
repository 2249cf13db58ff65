"""Parity tests for fractal, lacunarity, DeepTEN and RADAM ops vs the
PyTorch reference modules (imported read-only from /root/reference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neighbour_feature_pooling_tpu.ops import (
    base_lacunarity,
    deepten_encode,
    gdcb_fractal_dim,
    lcg_sequence,
    lcg_weights,
    make_orthogonal,
    positional_encoding_2d,
    radam_alphas,
    radam_pool,
)
from neighbour_feature_pooling_tpu.ops.radam import lp_normalize_spatial
from tests.conftest import add_reference_to_path, reference_available

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason="PyTorch reference tree not mounted at /root/reference")

if reference_available():
    add_reference_to_path()

ATOL = 1e-4


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


# ---------------------------------------------------------------- fractal

def test_gdcb_parity():
    from models.Fractal_Pooling import GDCB

    x = _rand((2, 16, 7, 7), seed=1)
    with torch.no_grad():
        golden = GDCB()(torch.from_numpy(x)).numpy().reshape(2, 16)
    ours = np.asarray(gdcb_fractal_dim(jnp.asarray(_nchw_to_nhwc(x))))
    np.testing.assert_allclose(ours, golden, atol=ATOL, rtol=1e-4)


def test_gdcb_larger_map():
    from models.Fractal_Pooling import GDCB

    x = _rand((1, 4, 14, 14), seed=2)
    with torch.no_grad():
        golden = GDCB()(torch.from_numpy(x)).numpy().reshape(1, 4)
    ours = np.asarray(gdcb_fractal_dim(jnp.asarray(_nchw_to_nhwc(x))))
    np.testing.assert_allclose(ours, golden, atol=ATOL, rtol=1e-4)


# ------------------------------------------------------------- lacunarity

def test_lacunarity_global_parity():
    from models.Lacunarity_Pooling import Base_Lacunarity

    x = _rand((2, 16, 7, 7), seed=3)
    with torch.no_grad():
        golden = Base_Lacunarity(dim=2)(torch.from_numpy(x)).numpy()
    golden = golden.reshape(2, 16)
    ours = np.asarray(base_lacunarity(jnp.asarray(_nchw_to_nhwc(x))))
    np.testing.assert_allclose(ours, golden, atol=ATOL, rtol=1e-4)


def test_lacunarity_local_parity():
    from models.Lacunarity_Pooling import Base_Lacunarity

    x = _rand((2, 8, 8, 8), seed=4)
    with torch.no_grad():
        golden = Base_Lacunarity(dim=2, kernel=(3, 3), stride=(2, 2))(
            torch.from_numpy(x)).numpy()  # (B, C, 3, 3)
    ours = np.asarray(base_lacunarity(jnp.asarray(_nchw_to_nhwc(x)),
                                      kernel=(3, 3), stride=(2, 2),
                                      keep_spatial=True))
    np.testing.assert_allclose(ours, np.transpose(golden, (0, 2, 3, 1)),
                               atol=ATOL, rtol=1e-4)


# ---------------------------------------------------------------- deepten

def test_deepten_parity():
    from models.deepten import DeepTENEncoding

    b, c, h, w, k = 2, 16, 7, 7, 8
    x = _rand((b, c, h, w), seed=5)
    mod = DeepTENEncoding(in_channels=c, num_codes=k)
    with torch.no_grad():
        golden = mod(torch.from_numpy(x)).numpy()  # (B, K*C)
    codewords = jnp.asarray(mod.codewords.detach().numpy())
    scale = jnp.asarray(mod.scale.detach().numpy())
    # reference flattens NCHW spatially: (B, D, H*W) -> (B, N, D)
    x_bnd = jnp.asarray(x.reshape(b, c, h * w).transpose(0, 2, 1))
    ours = np.asarray(deepten_encode(x_bnd, codewords, scale))
    np.testing.assert_allclose(ours, golden, atol=ATOL, rtol=1e-3)


# ------------------------------------------------------------------ radam

def test_lcg_sequence_matches_pickle():
    import pickle

    with open("/root/reference/RAE_LCG_weights.pkl", "rb") as f:
        golden = pickle.load(f).numpy()
    ours = lcg_sequence(len(golden))
    np.testing.assert_array_equal(ours, golden)


def test_lcg_weights_parity():
    from models.RNN import LCG
    import os

    cwd = os.getcwd()
    os.chdir("/root/reference")  # LCG loads the pkl by relative path
    try:
        golden = LCG(1, 64, seed=128).numpy()
    finally:
        os.chdir(cwd)
    ours = lcg_weights(1, 64, seed=128)
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_make_orthogonal_parity():
    from models.RNN import make_orthogonal as torch_mo

    for shape, seed in [((1, 64), 0), ((8, 8), 1), ((16, 4), 2)]:
        t = _rand(shape, seed=seed)
        golden = torch_mo(torch.from_numpy(t.copy())).numpy()
        ours = make_orthogonal(t)
        np.testing.assert_allclose(ours, golden, atol=1e-5)


@pytest.mark.parametrize("d_model,h,w", [(16, 7, 7), (192, 14, 14), (6, 5, 5)])
def test_positional_encoding_parity(d_model, h, w):
    from models.RNN import positionalencoding2d

    golden = positionalencoding2d(d_model, h, w).numpy()
    ours = positional_encoding_2d(d_model, h, w)
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_radam_pool_parity():
    """End-to-end RADAM vs a reference-equivalent torch computation.

    The reference RADAMPooling module imports torchvision (unavailable), so we
    reproduce its exact forward with reference RAE/RNN pieces: lp-normalize
    over spatial dims, (no-op) resize, per-sample fit of M RAEs, sum of betas.
    For spatial_size == H the Resize is the identity, as in every active
    config (radam_pooling.py:29-33 with 7->7 / 14->14).
    """
    from models.RNN import RAE

    b, c, hw = 2, 16, 7
    m = 4
    x = _rand((b, c, hw, hw), seed=9)

    xt = torch.from_numpy(x)
    xt = torch.nn.functional.normalize(xt, p=2.0, dim=(2, 3), eps=1e-10)
    xs = xt.reshape(b, c, hw * hw)

    import os
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        raes = [RAE(Q=1, P=c, N=hw * hw, device="cpu",
                    seed=i * (1 * c), pos_encoding=True) for i in range(m)]
    finally:
        os.chdir(cwd)
    golden = []
    with torch.no_grad():
        for bi in range(b):
            pooled = torch.zeros(1, c)
            for rae in raes:
                pooled += rae.fit_AE(xs[bi])
            golden.append(torch.nan_to_num(pooled))
    golden = torch.stack(golden).numpy()  # (B, 1, C)

    alphas = radam_alphas(m, c)
    pe = positional_encoding_2d(c, hw, hw).reshape(c, hw * hw)
    ours = np.asarray(radam_pool(jnp.asarray(_nchw_to_nhwc(x)),
                                 jnp.asarray(alphas), jnp.asarray(pe),
                                 spatial_size=hw))
    np.testing.assert_allclose(ours, golden, atol=ATOL, rtol=1e-3)


def test_lp_normalize_matches_torch():
    x = _rand((2, 8, 7, 7), seed=10)
    golden = torch.nn.functional.normalize(
        torch.from_numpy(x), p=2.0, dim=(2, 3), eps=1e-10).numpy()
    ours = np.asarray(lp_normalize_spatial(jnp.asarray(_nchw_to_nhwc(x))))
    np.testing.assert_allclose(ours, _nchw_to_nhwc(golden), atol=1e-6)


@pytest.mark.parametrize("p", [1.0, 3.0])
def test_lp_normalize_general_p_matches_torch(p):
    """The reference lp_norm_layer is parameterized on p
    (radam_pooling.py:8-16); non-default p must actually take effect
    (regression: it used to be silently ignored, always computing L2)."""
    x = _rand((2, 8, 7, 7), seed=11)
    golden = torch.nn.functional.normalize(
        torch.from_numpy(x), p=p, dim=(2, 3), eps=1e-10).numpy()
    ours = np.asarray(lp_normalize_spatial(
        jnp.asarray(_nchw_to_nhwc(x)), p=p))
    np.testing.assert_allclose(ours, _nchw_to_nhwc(golden), atol=1e-6)
    # and p must change the answer (the old bug made every p an L2)
    l2 = np.asarray(lp_normalize_spatial(jnp.asarray(_nchw_to_nhwc(x))))
    assert np.abs(ours - l2).max() > 1e-3


# ------------------------------------------------------------- gradients

def test_ops_differentiable():
    x = jnp.asarray(_rand((2, 7, 7, 16), seed=20))

    def f_fractal(xx):
        return jnp.sum(gdcb_fractal_dim(xx))

    def f_lac(xx):
        return jnp.sum(base_lacunarity(xx))

    for f in (f_fractal, f_lac):
        g = jax.grad(f)(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    cw = jnp.asarray(_rand((8, 16), seed=21)) * 0.1
    sc = -jnp.abs(jnp.asarray(_rand((8,), seed=22)))
    xb = x.reshape(2, 49, 16)

    def f_ten(c, s):
        return jnp.sum(deepten_encode(xb, c, s) ** 2)

    gc, gs = jax.grad(f_ten, argnums=(0, 1))(cw, sc)
    assert bool(jnp.all(jnp.isfinite(gc))) and bool(jnp.all(jnp.isfinite(gs)))
