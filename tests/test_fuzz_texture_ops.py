"""Seeded property fuzz over the non-NFP texture ops.

Companion to ``test_fuzz_nfp.py``: the directed tests in
``test_texture_ops_parity.py`` pin one or two known shapes per op; this
file samples the broader parameter space with a fixed seed — GDCB level
counts and map sizes, lacunarity dims 1/2/3 global/local (including
tanh-saturated inputs, where the reference's quirky ``n_pts`` actually
matters), DeepTEN code counts and softmax-stressing input scales, RADAM
RAE counts with and without positional encoding — and checks each config
against the PyTorch reference modules imported from ``/root/reference``,
plus gradient finiteness through the JAX ops.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neighbour_feature_pooling_tpu.ops import (
    base_lacunarity,
    deepten_encode,
    gdcb_fractal_dim,
    positional_encoding_2d,
    radam_alphas,
    radam_pool,
)
from tests.conftest import add_reference_to_path, reference_available

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason="PyTorch reference tree not mounted at /root/reference")

if reference_available():
    add_reference_to_path()

SEED = 20260819


def _rand(shape, seed, scale=1.0, loc=0.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale + loc).astype(np.float32)


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


# ---------------------------------------------------------------- fractal

def _gdcb_configs(n=10):
    rng = np.random.default_rng(SEED)
    cfgs = []
    while len(cfgs) < n:
        nlv = int(rng.integers(3, 7))
        h = int(rng.integers(nlv, 24))
        w = int(rng.integers(nlv, 24))
        c = int(rng.choice([1, 3, 8, 17, 64]))
        b = int(rng.integers(1, 4))
        scale = float(rng.choice([0.1, 1.0, 10.0]))
        cfgs.append(dict(nlv=nlv, h=h, w=w, c=c, b=b, scale=scale))
    return cfgs


GDCB_CFGS = _gdcb_configs()
GDCB_IDS = [f"{i}-nlv{c['nlv']}-{c['h']}x{c['w']}x{c['c']}-s{c['scale']}"
            for i, c in enumerate(GDCB_CFGS)]


@pytest.mark.parametrize("cfg", GDCB_CFGS, ids=GDCB_IDS)
def test_fuzz_gdcb(cfg):
    from models.Fractal_Pooling import GDCB

    x = _rand((cfg["b"], cfg["c"], cfg["h"], cfg["w"]),
              seed=hash(str(sorted(cfg.items()))) % 2**31,
              scale=cfg["scale"])
    with torch.no_grad():
        golden = GDCB(nlv_bcd=cfg["nlv"])(torch.from_numpy(x)).numpy()
    golden = golden.reshape(cfg["b"], cfg["c"])
    ours = np.asarray(gdcb_fractal_dim(jnp.asarray(_nchw_to_nhwc(x)),
                                       nlv_bcd=cfg["nlv"]))
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-4)


def test_gdcb_constant_and_zero_inputs():
    """Degenerate maps: all-zero input (log2(ReLU(0)+1) = 0 everywhere) and
    constant input must stay finite like the reference."""
    from models.Fractal_Pooling import GDCB

    for fill in (0.0, 3.25, -1.0):
        x = np.full((1, 4, 8, 8), fill, np.float32)
        with torch.no_grad():
            golden = GDCB()(torch.from_numpy(x)).numpy().reshape(1, 4)
        ours = np.asarray(gdcb_fractal_dim(jnp.asarray(_nchw_to_nhwc(x))))
        assert np.all(np.isfinite(ours))
        np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------- lacunarity

def _lac_configs(n_per_dim=4):
    rng = np.random.default_rng(SEED + 1)
    cfgs = []
    for dim in (1, 2, 3):
        for _ in range(n_per_dim):
            spatial = tuple(int(rng.integers(4, 12)) for _ in range(dim))
            c = int(rng.choice([1, 5, 16]))
            b = int(rng.integers(1, 3))
            local = bool(rng.integers(0, 2))
            if local:
                kernel = tuple(int(rng.integers(2, min(4, s) + 1))
                               for s in spatial)
                stride = tuple(int(rng.integers(1, k + 1)) for k in kernel)
            else:
                kernel = stride = None
            # loc=-6: tanh saturates near -1, E[x] → 0 — the regime where
            # the reference's n_pts quirk (C·L for dim=1, H·W for dim=3)
            # is numerically visible through the eps term.
            loc = float(rng.choice([0.0, 0.0, -6.0]))
            cfgs.append(dict(dim=dim, spatial=spatial, c=c, b=b,
                             kernel=kernel, stride=stride, loc=loc))
    return cfgs


LAC_CFGS = _lac_configs()
LAC_IDS = [f"{i}-d{c['dim']}-{'x'.join(map(str, c['spatial']))}c{c['c']}"
           f"-{'loc' if c['kernel'] else 'glob'}-m{c['loc']}"
           for i, c in enumerate(LAC_CFGS)]


@pytest.mark.parametrize("cfg", LAC_CFGS, ids=LAC_IDS)
def test_fuzz_lacunarity(cfg):
    from models.Lacunarity_Pooling import Base_Lacunarity

    dim, spatial = cfg["dim"], cfg["spatial"]
    x = _rand((cfg["b"], cfg["c"]) + spatial,
              seed=hash(str(sorted(cfg.items()))) % 2**31, loc=cfg["loc"])
    mod = Base_Lacunarity(dim=dim, kernel=cfg["kernel"], stride=cfg["stride"])
    # float64 golden: at tanh saturation the reference's own float32
    # (tanh(x)+1) cancels catastrophically; the double run is the true
    # value, which our sigmoid(2x) formulation tracks in float32.
    with torch.no_grad():
        golden = mod(torch.from_numpy(x).double()).numpy().astype(np.float32)

    # channels-first → channels-last
    perm = (0,) + tuple(range(2, 2 + dim)) + (1,)
    x_cl = np.transpose(x, perm)
    ours = np.asarray(base_lacunarity(
        jnp.asarray(x_cl), kernel=cfg["kernel"], stride=cfg["stride"],
        keep_spatial=cfg["kernel"] is not None))
    if cfg["kernel"] is None:
        golden = golden.reshape(cfg["b"], cfg["c"])
    else:
        golden = np.transpose(golden, perm)
    np.testing.assert_allclose(ours, golden, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------- deepten

def _ten_configs(n=10):
    rng = np.random.default_rng(SEED + 2)
    cfgs = []
    for _ in range(n):
        cfgs.append(dict(
            b=int(rng.integers(1, 4)),
            c=int(rng.choice([4, 8, 16, 48])),
            k=int(rng.choice([2, 8, 16, 32])),
            h=int(rng.integers(2, 12)),
            w=int(rng.integers(2, 12)),
            scale=float(rng.choice([0.1, 1.0, 10.0])),
        ))
    return cfgs


TEN_CFGS = _ten_configs()
TEN_IDS = [f"{i}-c{c['c']}k{c['k']}-{c['h']}x{c['w']}-s{c['scale']}"
           for i, c in enumerate(TEN_CFGS)]


@pytest.mark.parametrize("cfg", TEN_CFGS, ids=TEN_IDS)
def test_fuzz_deepten(cfg):
    from models.deepten import DeepTENEncoding

    b, c, h, w, k = cfg["b"], cfg["c"], cfg["h"], cfg["w"], cfg["k"]
    x = _rand((b, c, h, w), seed=hash(str(sorted(cfg.items()))) % 2**31,
              scale=cfg["scale"])
    mod = DeepTENEncoding(in_channels=c, num_codes=k)
    with torch.no_grad():
        golden = mod(torch.from_numpy(x)).numpy()
    codewords = jnp.asarray(mod.codewords.detach().numpy())
    scale = jnp.asarray(mod.scale.detach().numpy())
    x_bnd = jnp.asarray(x.reshape(b, c, h * w).transpose(0, 2, 1))
    ours = np.asarray(deepten_encode(x_bnd, codewords, scale))
    # large-scale inputs sharpen the softmax; tolerance follows magnitude
    tol = 1e-4 * max(1.0, cfg["scale"])
    np.testing.assert_allclose(ours, golden, atol=tol, rtol=1e-3)


# ------------------------------------------------------------------ radam

def _radam_configs():
    return [
        dict(b=1, c=8, hw=4, m=1, pe=True),
        dict(b=2, c=16, hw=7, m=2, pe=False),
        dict(b=3, c=16, hw=5, m=4, pe=True),
        dict(b=1, c=32, hw=7, m=8, pe=True),
        dict(b=2, c=8, hw=14, m=2, pe=False),
        dict(b=2, c=24, hw=6, m=3, pe=True),
    ]


RADAM_CFGS = _radam_configs()
RADAM_IDS = [f"{i}-c{c['c']}hw{c['hw']}m{c['m']}pe{int(c['pe'])}"
             for i, c in enumerate(RADAM_CFGS)]


@pytest.mark.parametrize("cfg", RADAM_CFGS, ids=RADAM_IDS)
def test_fuzz_radam(cfg):
    """radam_pool vs the reference RAE ensemble (per-sample torch loop),
    across M, spatial size, channel width and pos-encoding on/off."""
    from models.RNN import RAE

    b, c, hw, m = cfg["b"], cfg["c"], cfg["hw"], cfg["m"]
    x = _rand((b, c, hw, hw), seed=hash(str(sorted(cfg.items()))) % 2**31)

    xt = torch.nn.functional.normalize(
        torch.from_numpy(x), p=2.0, dim=(2, 3), eps=1e-10)
    xs = xt.reshape(b, c, hw * hw)

    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        raes = [RAE(Q=1, P=c, N=hw * hw, device="cpu", seed=i * c,
                    pos_encoding=cfg["pe"]) for i in range(m)]
    finally:
        os.chdir(cwd)
    golden = []
    with torch.no_grad():
        for bi in range(b):
            pooled = torch.zeros(1, c)
            for rae in raes:
                pooled += rae.fit_AE(xs[bi])
            golden.append(torch.nan_to_num(pooled))
    golden = np.stack([g.numpy() for g in golden])  # (B, 1, C)

    alphas = jnp.asarray(radam_alphas(m, c))
    pe = (jnp.asarray(positional_encoding_2d(c, hw, hw).reshape(c, hw * hw))
          if cfg["pe"] else None)
    ours = np.asarray(radam_pool(jnp.asarray(_nchw_to_nhwc(x)), alphas, pe,
                                 spatial_size=hw))
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-3)


# ------------------------------------------------------------- gradients

@pytest.mark.parametrize("scale", [0.1, 1.0, 10.0])
def test_fuzz_gradients_finite(scale):
    """All four op families stay finite through jax.grad at every input
    scale sampled above (softmax saturation, tanh saturation, log2 guards)."""
    x = jnp.asarray(_rand((2, 8, 8, 16), seed=77, scale=scale))

    def f_fractal(v):
        return jnp.sum(gdcb_fractal_dim(v))

    def f_lac(v):
        return jnp.sum(base_lacunarity(v))

    def f_radam(v):
        alphas = jnp.asarray(radam_alphas(2, 16))
        return jnp.sum(radam_pool(v, alphas, None, spatial_size=8))

    for f in (f_fractal, f_lac, f_radam):
        g = jax.grad(f)(x)
        assert bool(jnp.all(jnp.isfinite(g))), f

    cw = jnp.asarray(_rand((8, 16), seed=78)) * 0.1
    sc = -jnp.abs(jnp.asarray(_rand((8,), seed=79)))
    xb = x.reshape(2, 64, 16)

    def f_ten(c, s):
        return jnp.sum(deepten_encode(xb, c, s) ** 2)

    gc, gs = jax.grad(f_ten, argnums=(0, 1))(cw, sc)
    assert bool(jnp.all(jnp.isfinite(gc))) and bool(jnp.all(jnp.isfinite(gs)))
