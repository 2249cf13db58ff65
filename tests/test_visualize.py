"""NFP visualization tool (scripts/visualize_nfp.py).

The reference ships only a static architecture figure; the tool renders
live similarity maps. These tests drive every code path on the CPU
backend and check the rendered artifacts exist and the underlying maps
have the op's semantics.
"""
import importlib.util
import os

import numpy as np
import pytest


def _load():
    path = __file__.replace("tests/test_visualize.py",
                            "scripts/visualize_nfp.py")
    spec = importlib.util.spec_from_file_location("visualize_nfp", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


viz = _load()


class TestPieces:
    def test_synthetic_image_shape_range(self):
        img = viz.synthetic_image(64)
        assert img.shape == (1, 64, 64, 3) and img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_similarity_maps_semantics(self):
        """Production head geometry: same-spatial output, k²−1 channels,
        cosine similarity bounded by [−1, 1]."""
        img = viz.synthetic_image(32)
        maps = viz.similarity_maps(img, radius=1, measure="cosine")
        assert maps.shape == (32, 32, 8)
        assert maps.min() >= -1.0 - 1e-5 and maps.max() <= 1.0 + 1e-5
        maps2 = viz.similarity_maps(img, radius=2, measure="norm")
        assert maps2.shape == (32, 32, 24)

    def test_neighbor_labels(self):
        assert viz.neighbor_labels(1) == ["NW", "N", "NE", "W", "E",
                                          "SW", "S", "SE"]
        labels2 = viz.neighbor_labels(2)
        assert len(labels2) == 24 and labels2[0] == "(-2,-2)"

    def test_backbone_tap_shapes(self):
        img = viz.synthetic_image(64)
        fmap = viz.backbone_feature_map("resnet18", "texture_nfp", img)
        assert fmap.shape == (1, 2, 2, 512)


class TestEndToEnd:
    def test_pixel_tap_png(self, tmp_path):
        out = str(tmp_path / "maps.png")
        viz.main(["--input_size", "48", "--measure", "cosine",
                  "--out", out])
        assert os.path.getsize(out) > 10_000
        from PIL import Image

        assert Image.open(out).size[0] > 100

    def test_all_measures_png(self, tmp_path):
        out = str(tmp_path / "measures.png")
        viz.main(["--input_size", "24", "--all_measures", "--out", out])
        assert os.path.getsize(out) > 10_000

    def test_backbone_tap_png(self, tmp_path):
        out = str(tmp_path / "tap.png")
        viz.main(["--input_size", "64", "--model_type", "vittiny",
                  "--model_variant", "texture_nfp", "--out", out])
        assert os.path.getsize(out) > 10_000

    def test_imported_checkpoint_tap(self, tmp_path):
        """Migration composition: visualize what a reference-trained
        model's NFP head sees."""
        torch = pytest.importorskip("torch")
        from tests.test_import_torch import (_RefComposite,
                                             _save_lightning_ckpt,
                                             _randomize)

        torch.manual_seed(0)
        net = _RefComposite("texture_nfp", 21, input_size=2).eval()
        _randomize(net, 3)
        ckpt = str(tmp_path / "best.ckpt")
        _save_lightning_ckpt(net, ckpt)
        out = str(tmp_path / "imported.png")
        viz.main(["--input_size", "64", "--model_type", "resnet18",
                  "--import_ckpt", ckpt, "--out", out])
        assert os.path.getsize(out) > 10_000
