"""Tests for models/torch_init.py — re-sampling a flax params tree from
the torch nn.Conv2d/nn.Linear default distributions (the init-sensitivity
arm of the offline parity experiment)."""

import importlib.util
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighbour_feature_pooling_tpu.models import get_model, torch_default_init

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def resampled():
    model = get_model("resnet18", "gap_only", 4)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    new = torch_default_init(variables, jax.random.PRNGKey(1))
    return model, variables, new


def _kernel_leaves(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _kernel_leaves(v, path + (k,))
    elif path[-1] == "kernel" and tree.ndim >= 2:
        yield path, tree


def test_kernels_within_torch_bound(resampled):
    """kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)): every kernel
    stays inside the bound and actually fills it (uniform, not normal)."""
    _, _, new = resampled
    n = 0
    for path, k in _kernel_leaves(new["params"]):
        bound = 1.0 / math.sqrt(float(np.prod(k.shape[:-1])))
        a = np.asarray(k)
        assert np.abs(a).max() <= bound, path
        if a.size >= 4096:
            assert np.abs(a).max() > 0.95 * bound, path
            # uniform std = bound/sqrt(3)
            assert a.std() == pytest.approx(bound / math.sqrt(3), rel=0.05)
        n += 1
    assert n > 15  # the whole resnet18 conv/dense stack was re-sampled


def test_biases_resampled_bn_untouched(resampled):
    """Dense biases leave flax's zeros for the torch uniform law; BN
    scale/bias (ones/zeros, identical defaults in both frameworks) and
    batch_stats pass through bit-identically."""
    _, old, new = resampled
    fc_b = np.asarray(new["params"]["fc"]["bias"])
    fan_in = new["params"]["fc"]["kernel"].shape[0]
    assert np.abs(fc_b).max() <= 1.0 / math.sqrt(fan_in)
    assert np.abs(fc_b).max() > 0.0

    def bn_scales(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "scale" in v:
                    yield v["scale"]
                else:
                    yield from bn_scales(v)

    scales = list(bn_scales(new["params"]))
    assert scales and all(np.all(np.asarray(s) == 1.0) for s in scales)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           old["batch_stats"], new["batch_stats"])


def test_deterministic_and_structure_preserving(resampled):
    model, old, new = resampled
    again = torch_default_init(old, jax.random.PRNGKey(1))
    jax.tree_util.tree_map(np.testing.assert_array_equal, new, again)
    assert (jax.tree_util.tree_structure(old)
            == jax.tree_util.tree_structure(new))
    # and the model still runs on the re-sampled tree
    logits = model.apply(new, jnp.ones((2, 32, 32, 3)), train=False)
    assert logits.shape == (2, 4) and bool(jnp.isfinite(logits).all())


def _load_rs():
    spec = importlib.util.spec_from_file_location(
        "reproduce_synthetic",
        os.path.join(REPO, "scripts", "reproduce_synthetic.py"))
    rs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rs)
    return rs


def test_torch_init_rejected_for_vittiny(tmp_path):
    """--torch_init is conv-net-only: the ViT fused-QKV kernel would get
    an overcounted fan_in and timm ViTs use trunc-normal anyway
    (advisor round-3 finding)."""
    rs = _load_rs()
    with pytest.raises(SystemExit, match="conv-net-only"):
        rs.main(["--quick", "--torch_init", "--frameworks", "jax",
                 "--model_type", "vittiny", "--variants", "gap_only",
                 "--image_size", "48",
                 "--out", str(tmp_path / "o.jsonl"),
                 "--workdir", str(tmp_path / "work")])


def test_flax_init_torch_matches_flax_law():
    """flax_default_init_torch re-draws conv/linear/attention weights with
    lecun-normal stddev and ±2σ truncation, zeroes biases, and leaves
    LayerNorm/pos-embed conventions alone."""
    import torch
    import torch.nn as nn

    rs = _load_rs()
    torch.manual_seed(0)
    model = rs._build_torch_model("vittiny", "gap_only", 4, 48)
    rs.flax_default_init_torch(model)

    checked = 0
    for mod in model.modules():
        if isinstance(mod, nn.Linear):
            w = mod.weight.detach().numpy()
            std = (1.0 / mod.in_features) ** 0.5
            # post-truncation stddev ≈ sqrt(1/fan_in); hard ±2σ(pre) cut
            assert abs(float(w.std()) - std) / std < 0.12
            assert np.abs(w).max() <= 2.0 * std / 0.87962566103423978 + 1e-7
            assert np.all(mod.bias.detach().numpy() == 0.0)
            checked += 1
        elif isinstance(mod, nn.MultiheadAttention):
            w = mod.in_proj_weight.detach().numpy()
            std = (1.0 / mod.embed_dim) ** 0.5
            assert abs(float(w.std()) - std) / std < 0.12
            assert np.all(mod.in_proj_bias.detach().numpy() == 0.0)
            checked += 1
    assert checked > 20
    # cls stays zeros, pos embed stays N(0, 0.02) — both already agree
    bb = model.backbone
    assert np.all(bb.cls.detach().numpy() == 0.0)
    assert abs(float(bb.pos.detach().numpy().std()) - 0.02) < 0.005
    # the re-initialized model still runs
    out = model(torch.zeros(2, 3, 48, 48))
    assert out.shape == (2, 4) and bool(torch.isfinite(out).all())


def test_reproduce_synthetic_flax_init_arm(tmp_path):
    """--flax_init flows through the experiment script: torch rows tagged,
    quick config completes."""
    rs = _load_rs()
    out = tmp_path / "repro.jsonl"
    rs.main(["--quick", "--flax_init", "--frameworks", "torch",
             "--variants", "gap_only", "--out", str(out),
             "--workdir", str(tmp_path / "work")])
    records = [json.loads(l) for l in out.read_text().splitlines()]
    runs = [r for r in records if "framework" in r]
    assert runs and all(r.get("flax_init") for r in runs)


def test_reproduce_synthetic_torch_init_arm(tmp_path):
    """--torch_init flows through the experiment script: the jax rows are
    tagged and the run completes on the quick config."""
    spec = importlib.util.spec_from_file_location(
        "reproduce_synthetic",
        os.path.join(REPO, "scripts", "reproduce_synthetic.py"))
    rs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rs)
    out = tmp_path / "repro.jsonl"
    rs.main(["--quick", "--torch_init", "--frameworks", "jax",
             "--variants", "gap_only", "--out", str(out),
             "--workdir", str(tmp_path / "work")])
    records = [json.loads(l) for l in out.read_text().splitlines()]
    runs = [r for r in records if "framework" in r]
    assert runs and all(r.get("torch_init") for r in runs)
    assert records[-1]["config"]["torch_init"] is True
