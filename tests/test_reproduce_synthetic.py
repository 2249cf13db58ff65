"""Tests for scripts/reproduce_synthetic.py — the offline accuracy-parity
experiment (torch reference stack vs this framework on identical synthetic
texture data)."""

import importlib.util
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def rs():
    spec = importlib.util.spec_from_file_location(
        "reproduce_synthetic",
        os.path.join(REPO, "scripts", "reproduce_synthetic.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_texture_dataset_matched_marginals(rs):
    """Every image has the EXACT same sorted pixel values (rank-normalized
    to a uniform grid), so the class signal is purely local structure —
    global intensity statistics are identical across classes by
    construction."""
    dm = rs.SyntheticTextureDataModule(num_per_class=4, image_size=32,
                                       orientations=2, lengths=(2.0,))
    dm.setup()
    assert dm.num_classes == 2
    imgs = dm._splits["train"].images
    a, b = imgs[0], imgs[-1]
    assert a.shape == (32, 32, 3) and a.dtype == np.float32
    ref = np.linspace(0.0, 1.0, 32 * 32, dtype=np.float64).astype(np.float32)
    np.testing.assert_array_equal(np.sort(a[:, :, 0].ravel()), ref)
    np.testing.assert_array_equal(np.sort(b[:, :, 0].ravel()), ref)
    # 3 replicated channels
    np.testing.assert_array_equal(a[:, :, 0], a[:, :, 2])
    # ...but different spatial arrangements
    assert np.abs(a - b).max() > 0.1


def test_texture_dataset_split_constant_across_seeds(rs):
    """The run seed shuffles batches/augments but the split (and hence the
    test set) is pinned by split_seed — the reference's protocol
    (DataModules.py:61)."""
    dm1 = rs.SyntheticTextureDataModule(num_per_class=4, image_size=32,
                                        orientations=2, lengths=(2.0,),
                                        seed=42)
    dm2 = rs.SyntheticTextureDataModule(num_per_class=4, image_size=32,
                                        orientations=2, lengths=(2.0,),
                                        seed=999)
    dm1.setup()
    # drop the generation cache so dm2 regenerates from scratch — this
    # test proves DETERMINISM of the generator, not cache sharing
    rs.SyntheticTextureDataModule._split_cache.clear()
    dm2.setup()
    for s1, s2 in zip(dm1._splits["test"].images, dm2._splits["test"].images):
        np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(dm1._splits["test"].labels,
                                  dm2._splits["test"].labels)


def test_identical_batch_streams_across_frameworks(rs):
    """Both stacks consume the same datamodule class at the same seed, so
    the pixels each framework trains on are bit-identical."""
    mk = lambda: rs.SyntheticTextureDataModule(  # noqa: E731
        num_per_class=6, image_size=32, batch_size=4, orientations=2,
        lengths=(2.0,), seed=7)
    dm1, dm2 = mk(), mk()
    dm1.setup()
    dm2.setup()
    for b1, b2 in zip(dm1.train_batches(3), dm2.train_batches(3)):
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(b1["label"], b2["label"])


def test_torch_vit_builder_shapes(rs):
    """The hand-built torch ViT-Tiny (timm structure) + reference
    lacunarity head produce (B, num_classes) logits at a 48px input."""
    import torch

    x = torch.randn(2, 3, 48, 48)
    for variant in ("gap_only", "texture_lacunarity"):
        model = rs._build_torch_model("vittiny", variant, 5, 48)
        with torch.no_grad():
            out = model(x)
        assert out.shape == (2, 5)
    # grid = 48/16 = 3 -> 9 patch tokens + CLS
    assert model.backbone.pos.shape == (1, 10, 192)


def test_torch_mnv3_builder_shapes(rs):
    """Hand-built MobileNetV3-Large (timm geometry) + the reference's own
    RADAMPooling head (imported through the torchvision stub, LCG pkl
    loaded from /root/reference) produce (B, num_classes) logits."""
    import torch

    x = torch.randn(2, 3, 64, 64)
    for variant in ("gap_only", "texture_radam"):
        model = rs._build_torch_model("mobilenetv3", variant, 5, 64)
        with torch.no_grad():
            out = model(x)
        assert out.shape == (2, 5)
    # timm mobilenetv3_large_100 feature extractor is 2.97M params
    n = sum(p.numel() for p in model.backbone.parameters())
    assert abs(n - 2_971_952) == 0
    # the RADAM encoder matrices come from the reference's LCG pickle
    assert model.pool.RAEs[0]._alpha.shape == (1, 960)


def test_torch_unknown_variant_rejected(rs):
    with pytest.raises(SystemExit, match="unknown variant"):
        rs._build_torch_model("resnet18", "texture_radam", 5, 48)


def test_torch_deepten_fractal_builder_shapes(rs):
    """The remaining two pooling families on ResNet18: the reference's own
    DeepTENEncoding (texture_pooling.py:467-483 wiring) and fractal_pooling
    (texture_pooling.py:96-112 wiring) heads produce (B, num_classes)
    logits and carry gradients."""
    import torch

    for variant, size in (("texture_deepten", 64), ("texture_fractal", 192)):
        model = rs._build_torch_model("resnet18", variant, 5, size)
        model.train()
        out = model(torch.randn(2, 3, size, size))
        assert out.shape == (2, 5)
        out.sum().backward()
    # DeepTEN head: K=32 codewords over D=512
    assert model.fc.in_features == 512  # fractal (last built) keeps C
    dt = rs._build_torch_model("resnet18", "texture_deepten", 5, 64)
    assert dt.encoding.codewords.shape == (32, 512)
    assert dt.fc.in_features == 32 * 512


def test_fractal_variant_needs_192px(rs, tmp_path):
    """GDCB's kernel-6 pool constrains BOTH stacks identically; the CLI
    rejects under-sized configs up front."""
    with pytest.raises(SystemExit, match="image_size >= 192"):
        rs.main(["--variants", "texture_fractal", "--image_size", "64",
                 "--out", str(tmp_path / "o.jsonl"),
                 "--workdir", str(tmp_path / "w")])


def test_quick_end_to_end_both_frameworks(rs, tmp_path, capsys):
    """--quick trains both stacks for one epoch on the tiny config and
    appends per-run + summary records."""
    out = tmp_path / "repro.jsonl"
    rs.main(["--quick", "--out", str(out),
             "--workdir", str(tmp_path / "work")])
    text = capsys.readouterr().out
    assert "torch gap_only" in text and "jax" in text
    records = [json.loads(l) for l in out.read_text().splitlines()]
    runs = [r for r in records if "framework" in r]
    assert {(r["framework"], r["variant"]) for r in runs} == {
        ("torch", "gap_only"), ("torch", "texture_nfp"),
        ("jax", "gap_only"), ("jax", "texture_nfp")}
    assert all(0.0 <= r["test_acc"] <= 1.0 for r in runs)
    summary = records[-1]
    assert "delta_texture_nfp" in summary
