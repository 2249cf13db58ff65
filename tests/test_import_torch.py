"""Full-model import of trained reference checkpoints.

End-to-end oracle: a torch model assembled exactly like the reference's
active classes (``texture_pooling.py``: ``self.backbone`` with timm
parameter names + ``self.pool``/``self.encoding`` from the ACTUAL reference
head modules + ``self.fc``), randomly initialized as if trained, saved as a
Lightning-style checkpoint — then imported with
``import_reference_checkpoint`` and compared against this framework's
``get_model`` forward at ≤1e-4.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neighbour_feature_pooling_tpu.models import get_model
from neighbour_feature_pooling_tpu.models.import_torch import (
    import_reference_checkpoint,
    load_reference_state_dict,
)
from tests.conftest import add_reference_to_path, reference_available

torch = pytest.importorskip("torch")
nn = torch.nn

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason="PyTorch reference tree not mounted at /root/reference")

if reference_available():
    add_reference_to_path()


#: timm feature dims (demo.py:269-290 num_ftrs registry)
_NUM_FTRS = {"resnet18": 512, "mobilenetv3": 960, "vittiny": 192}


def _ref_params(num_classes, input_size, backbone="resnet18"):
    """Minimal reference Params dict (demo.py:519-543 shape)."""
    return {
        "num_ftrs": {backbone: _NUM_FTRS[backbone]},
        "Model_name": backbone,
        "Dataset": "UCMerced",
        "num_classes": {"UCMerced": num_classes},
        "input_size": input_size,
    }


def _torch_backbone(backbone):
    if backbone == "resnet18":
        from tests.test_timm_port import _torch_resnet18_features

        return _torch_resnet18_features()
    if backbone == "mobilenetv3":
        from tests.test_timm_port import _torch_mobilenetv3_features

        return _torch_mobilenetv3_features()
    from tests.test_timm_port import _torch_vit_tiny

    return _torch_vit_tiny()


class _RefComposite(nn.Module):
    """Reference active-class structure with a timm-named backbone."""

    def __init__(self, variant, num_classes, input_size,
                 backbone="resnet18"):
        super().__init__()
        self.backbone = _torch_backbone(backbone)
        self._backbone_type = backbone
        self._variant = variant
        dim = _NUM_FTRS[backbone]
        if variant == "texture_nfp":
            from models.NFP_Pooling import nfp_pooling

            self.pool = nfp_pooling(
                Params=_ref_params(num_classes, input_size, backbone))
        elif variant == "texture_fractal":
            from models.Fractal_Pooling import fractal_pooling

            self.pool = fractal_pooling(
                Params=_ref_params(num_classes, input_size, backbone))
        elif variant == "texture_lacunarity":
            from models.Lacunarity_Pooling import lacunarity_pooling

            self.pool = lacunarity_pooling(
                Params=_ref_params(num_classes, input_size, backbone))
        elif variant == "texture_deepten":
            from models.deepten import DeepTENEncoding

            self.encoding = DeepTENEncoding(in_channels=dim, num_codes=32)
            self.bn = nn.BatchNorm1d(32 * dim)
        elif variant == "texture_radam":
            # the reference RADAMPooling module imports torchvision
            # (unavailable); reproduce its exact forward with the reference
            # RAE pieces, as test_texture_ops_parity does. Resize is the
            # identity for spatial_size == H (every active config). Like
            # the real module, this holds NO registered parameters.
            from models.RNN import RAE

            cwd = os.getcwd()
            os.chdir("/root/reference")  # LCG loads its pkl by relative path
            try:
                raes = [RAE(Q=1, P=512, N=49, device="cpu", seed=i * 512,
                            pos_encoding=True) for i in range(4)]
            finally:
                os.chdir(cwd)

            class _RefRADAM(nn.Module):
                def forward(self, x):
                    x = nn.functional.normalize(x, p=2.0, dim=(2, 3),
                                                eps=1e-10)
                    xs = x.reshape(x.shape[0], x.shape[1], -1)
                    rows = []
                    for bi in range(xs.shape[0]):
                        pooled = torch.zeros(1, xs.shape[1])
                        for rae in raes:
                            pooled = pooled + rae.fit_AE(xs[bi])
                        rows.append(torch.nan_to_num(pooled))
                    return torch.stack(rows)

            self.pool = _RefRADAM()
        out_dim = dim * 32 if variant == "texture_deepten" else dim
        self.fc = nn.Linear(out_dim, num_classes)

    def forward(self, x):
        x = self.backbone(x)
        if self._backbone_type == "vittiny":
            # reference CLS-strip token->map (texture_pooling.py:123-131)
            patch = x[:, 1:]
            b, n, c = patch.shape
            h = int(n ** 0.5)
            x = patch.transpose(1, 2).reshape(b, c, h, h)
        if self._variant == "gap_only":
            x = nn.functional.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        elif self._variant == "texture_deepten":
            x = self.bn(self.encoding(x))
        elif self._variant == "texture_radam":
            x = self.pool(x).squeeze(1)
        else:
            x = self.pool(x)
        return self.fc(x)


def _randomize(net, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            if not p.requires_grad:
                continue  # the reference's frozen NFP neighbor convs are
            # deterministic constructions (nfp.py:60-81) that the importer
            # reconstructs; randomizing them would corrupt the torch oracle
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in net.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(
                    1 + 0.3 * torch.rand(m.running_var.shape, generator=g))


def _lightning_ckpt(net):
    """state_dict wrapped the way Lightning_Wrapper saves it."""
    sd = {f"model.{k}": v.detach().numpy()
          for k, v in net.state_dict().items()}
    # torchmetrics buffers Lightning persists alongside the model
    sd["train_acc.correct"] = np.zeros((), np.int64)
    sd["val_f1.tp"] = np.zeros((3,), np.int64)
    return sd


CASES = [
    ("resnet18", "gap_only", 64, 2e-4),
    ("resnet18", "texture_nfp", 64, 2e-4),
    ("resnet18", "texture_fractal", 224, 5e-4),  # 224: GDCB needs >=6x6 map
    ("resnet18", "texture_lacunarity", 64, 2e-4),
    ("resnet18", "texture_deepten", 64, 2e-4),
    ("resnet18", "texture_radam", 224, 5e-4),  # ref RADAM built for 7x7 maps
    # the other backbone families ride the same head map over their own
    # timm porters — one NFP composite each pins the end-to-end chain
    ("mobilenetv3", "texture_nfp", 64, 5e-4),
    ("vittiny", "texture_nfp", 224, 5e-4),     # torch oracle is 224-only
]


@pytest.mark.parametrize("backbone,variant,input_size,tol",
                         CASES, ids=[f"{c[0]}-{c[1]}" for c in CASES])
def test_import_full_model_parity(backbone, variant, input_size, tol):
    torch.manual_seed(0)
    net = _RefComposite(variant, num_classes=5,
                        input_size=input_size // 32,
                        backbone=backbone).eval()
    _randomize(net, seed=7)
    sd = _lightning_ckpt(net)

    model = get_model(backbone, variant, 5)
    rng = np.random.default_rng(3)
    x = rng.random((2, input_size, input_size, 3), np.float32)
    init = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.asarray(x[:1]), train=False)
    variables, report = import_reference_checkpoint(
        sd, backbone, variant, validate_against=init)
    assert report["backbone_keys"] > 100

    with torch.no_grad():
        golden = net(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, golden, atol=tol, rtol=tol)


def test_import_rejects_wrong_variant():
    net = _RefComposite("texture_nfp", 5, 2).eval()
    sd = _lightning_ckpt(net)
    with pytest.raises(KeyError):
        import_reference_checkpoint(sd, "resnet18", "texture_deepten")
    with pytest.raises(KeyError):  # nfp_proj keys unconsumed under gap_only
        import_reference_checkpoint(sd, "resnet18", "gap_only")


def test_import_accepts_bare_state_dict(tmp_path):
    """A raw torch.save(model.state_dict()) file — no Lightning wrapper."""
    net = _RefComposite("gap_only", 4, 2).eval()
    _randomize(net, 1)
    path = str(tmp_path / "model.pt")
    torch.save(net.state_dict(), path)
    sd = load_reference_state_dict(path)
    variables, _ = import_reference_checkpoint(sd, "resnet18", "gap_only")
    assert variables["params"]["fc"]["kernel"].shape == (512, 4)


def _save_lightning_ckpt(net, path):
    """A full Lightning .ckpt container: weights under 'state_dict' with
    the 'model.' prefix, non-tensor bookkeeping beside them
    (demo.py:381-392 saves via ModelCheckpoint)."""
    import argparse

    torch.save({
        "state_dict": {f"model.{k}": v for k, v in net.state_dict().items()},
        "epoch": 3,
        "global_step": 120,
        "pytorch-lightning_version": "2.1.0",
        "optimizer_states": [],
        "lr_schedulers": [],
        # hparams payloads hold numpy objects + Namespace — the strict
        # weights_only unpickler rejects these without the loader's
        # safe-globals allowlist (models/import_torch.py)
        "hyper_parameters": {
            "class_weights": np.ones(4, np.float32),
            "lr": np.float64(1e-3),
            "args": argparse.Namespace(model="resnet18", seed=42),
        },
    }, path)


def test_lightning_container_file(tmp_path):
    """.ckpt files carry non-tensor bookkeeping that must be skipped."""
    net = _RefComposite("gap_only", 4, 2).eval()
    _save_lightning_ckpt(net, str(tmp_path / "best.ckpt"))
    sd = load_reference_state_dict(str(tmp_path / "best.ckpt"))
    assert "fc.weight" in sd and "epoch" not in sd
    variables, _ = import_reference_checkpoint(
        str(tmp_path / "best.ckpt"), "resnet18", "gap_only")
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["fc"]["bias"]),
        net.fc.bias.detach().numpy())


def test_predictor_serves_imported_checkpoint_int8(tmp_path):
    """Migration × quantization: a reference .ckpt served on the int8 tier.
    int8 drift is a few % relative (PARITY.md) — the bar is top-1 agreement
    with the fp32 import plus bounded probability drift."""
    from neighbour_feature_pooling_tpu.serve import Predictor

    torch.manual_seed(0)
    net = _RefComposite("texture_nfp", 5, input_size=2).eval()
    _randomize(net, 13)
    path = str(tmp_path / "best.ckpt")
    _save_lightning_ckpt(net, path)

    kw = dict(batch_size=2, input_size=64, resize_size=64, import_ckpt=path)
    fp32 = Predictor("resnet18", "texture_nfp", 5, **kw)
    int8 = Predictor("resnet18", "texture_nfp", 5, quantize="int8", **kw)
    rng = np.random.default_rng(9)
    imgs = rng.random((2, 64, 64, 3), np.float32)
    a = fp32.predict(list(imgs), preprocessed=True)
    b = int8.predict(list(imgs), preprocessed=True)
    np.testing.assert_array_equal(a["label"], b["label"])
    np.testing.assert_allclose(a["probabilities"], b["probabilities"],
                               atol=0.05)


def test_predictor_serves_imported_checkpoint(tmp_path):
    """The migration fast path: reference .ckpt -> TPU serving endpoint,
    no retraining. Probabilities must match the torch model's softmax."""
    from neighbour_feature_pooling_tpu.serve import Predictor

    torch.manual_seed(0)
    net = _RefComposite("texture_nfp", 5, input_size=2).eval()
    _randomize(net, 11)
    path = str(tmp_path / "best.ckpt")
    _save_lightning_ckpt(net, path)

    pred = Predictor("resnet18", "texture_nfp", 5, import_ckpt=path,
                     batch_size=2, input_size=64, resize_size=64)
    rng = np.random.default_rng(5)
    imgs = rng.random((2, 64, 64, 3), np.float32)
    out = pred.predict(list(imgs), preprocessed=True)

    with torch.no_grad():
        logits = net(torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))))
        golden = torch.softmax(logits, dim=-1).numpy()
    np.testing.assert_allclose(out["probabilities"], golden,
                               atol=2e-4, rtol=2e-4)


def test_cli_finetune_from_imported_checkpoint(tmp_path, monkeypatch,
                                               capsys):
    """--import_ckpt warm-starts training from a reference checkpoint."""
    from neighbour_feature_pooling_tpu.cli import main

    net = _RefComposite("gap_only", 4, 2).eval()  # synthetic has 4 classes
    _randomize(net, 3)
    path = str(tmp_path / "last.ckpt")
    _save_lightning_ckpt(net, path)

    monkeypatch.chdir(tmp_path)
    main(["--dataset", "synthetic", "--model_type", "resnet18",
          "--model_variant", "gap_only", "--input_size", "24",
          "--batch_size", "16", "--max_epochs", "1", "--seeds", "7",
          "--learning_rate", "1e-3", "--import_ckpt", path,
          "--num_devices", "1"])
    out = capsys.readouterr().out
    assert "imported reference checkpoint" in out
    assert "Final Test Accuracy" in out


def test_cli_import_excludes_pretrained(tmp_path, monkeypatch):
    from neighbour_feature_pooling_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit):
        main(["--dataset", "synthetic", "--model_variant", "gap_only",
              "--import_ckpt", "x.ckpt", "--pretrained", "y.pth",
              "--seeds", "7"])
