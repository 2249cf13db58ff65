#!/usr/bin/env python
"""Offline accuracy-parity experiment: torch reference stack vs TPU rebuild.

The reference's published results (``/root/reference/README.md:68-76``)
cannot be reproduced in this container — they need timm pretrained weights
and the real datasets, both behind network egress
(``scripts/reproduce_readme.py --download`` is the one-command path on a
networked machine). What CAN be proven offline is the other half of
accuracy parity: **given identical data and the identical training
protocol, the torch reference stack and this framework reach the same
accuracy**. This script does exactly that:

* generates a deterministic synthetic *texture* dataset in which every
  image has an identical (exactly uniform) marginal intensity histogram —
  classes differ only in local spatial structure (oriented correlation of
  a Gaussian random field), i.e. the discriminative signal is the one NFP
  was designed for;
* feeds BOTH frameworks bit-identical pixels: the shared
  ``ArrayDataModule`` pipeline does the augmentation with per-record
  seeded rngs, so at equal seeds the two sides see the same batches in
  the same order;
* trains the reference composition — hand-built standard ResNet18
  (the timm backbone of ``texture_pooling.py:156``; timm is not installed
  here) + the reference's OWN ``NFPPooling`` op imported read-only from
  ``/root/reference`` + the ``nfp_pooling`` fusion head
  (``NFP_Pooling.py:25-36``) — under the reference protocol: Adam,
  CE(label_smoothing=0.05) (``Lightning_Wrapper.py:35``), best-val-acc
  checkpoint selection (``demo.py:381-392``), macro accuracy
  (torchmetrics default), seeds {42,123,999} mean±std
  (``demo.py:545-554``);
* trains this framework's ``resnet18 × {gap_only, texture_nfp}`` through
  the real ``Trainer`` on the same data, and prints both tables.

All five texture-pooling families are covered across three backbones:
ResNet18 × {gap_only, texture_nfp, texture_deepten, texture_fractal},
ViT-Tiny × {gap_only, texture_lacunarity} (the PlantVillage row's
composition) and MobileNetV3 × {gap_only, texture_radam} (the
GTOS-Mobile row's) — each texture head is the reference's OWN module
imported read-only from ``/root/reference``. ``texture_fractal`` needs
``--image_size 192`` (GDCB's kernel-6 pool on the input_size/32 map).

Usage::

    python scripts/reproduce_synthetic.py                 # full (both stacks)
    python scripts/reproduce_synthetic.py --model_type vittiny
    python scripts/reproduce_synthetic.py --frameworks jax
    python scripts/reproduce_synthetic.py --quick         # tiny smoke config

Appends one JSON record per (framework, variant, seed) plus a summary
record to ``reproduce_synthetic.jsonl``.
"""

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from neighbour_feature_pooling_tpu.data.datamodules import (  # noqa: E402
    ArrayDataModule, _Split)
from neighbour_feature_pooling_tpu.data.transforms import (  # noqa: E402
    TransformConfig)
from neighbour_feature_pooling_tpu.train.metrics import (  # noqa: E402
    metrics_from_confusion_np)

#: variants the torch side implements per backbone: the flagship NFP row
#: (ResNet18, README.md:72-73), the lacunarity row's composition
#: (ViT-Tiny, README.md:75), the RADAM row's (MobileNetV3, README.md:74),
#: plus the two remaining pooling families (DeepTEN, fractal) on ResNet18 —
#: together all five texture-pooling families are covered
VARIANTS = {
    "resnet18": ("gap_only", "texture_nfp", "texture_deepten",
                 "texture_fractal"),
    "vittiny": ("gap_only", "texture_lacunarity"),
    "mobilenetv3": ("gap_only", "texture_radam"),
}

#: the pair a bare invocation runs (GAP control + the backbone's
#: README-row texture head); the extra resnet18 families run via
#: ``--variants texture_deepten,texture_fractal``
DEFAULT_VARIANTS = {
    "resnet18": ("gap_only", "texture_nfp"),
    "vittiny": ("gap_only", "texture_lacunarity"),
    "mobilenetv3": ("gap_only", "texture_radam"),
}


# --------------------------------------------------------------------- data


def _oriented_kernel(theta: float, length: float, size: int = 15):
    """Anisotropic Gaussian: long axis ``length`` along ``theta``."""
    r = np.arange(size) - size // 2
    yy, xx = np.meshgrid(r, r, indexing="ij")
    u = np.cos(theta) * xx + np.sin(theta) * yy
    v = -np.sin(theta) * xx + np.cos(theta) * yy
    k = np.exp(-0.5 * ((u / length) ** 2 + (v / 0.7) ** 2))
    return k / k.sum()


def _texture_image(rng, kernel, size: int) -> np.ndarray:
    """One HWC float32 [0,1] texture sample with an EXACTLY uniform
    marginal histogram (rank-normalized), so global pooling of raw
    intensities carries zero class signal by construction."""
    from scipy.signal import fftconvolve

    pad = kernel.shape[0]
    noise = rng.standard_normal((size + 2 * pad, size + 2 * pad))
    field = fftconvolve(noise, kernel, mode="same")[pad:-pad, pad:-pad]
    flat = field.ravel()
    out = np.empty_like(flat)
    out[np.argsort(flat, kind="stable")] = np.linspace(
        0.0, 1.0, flat.size, dtype=np.float64)
    img = out.reshape(size, size).astype(np.float32)
    return np.repeat(img[:, :, None], 3, axis=2)


class SyntheticTextureDataModule(ArrayDataModule):
    """Matched-marginal oriented-texture classes; constant split across
    run seeds (``split_seed`` fixed like the reference, DataModules.py:61)."""

    def __init__(self, num_per_class: int = 96, image_size: int = 64,
                 batch_size: int = 32, seed: int = 42,
                 orientations: int = 4, lengths=(2.0, 5.0)):
        self.orientations = orientations
        self.lengths = tuple(lengths)
        num_classes = orientations * len(self.lengths)
        transform = TransformConfig(
            resize_size=image_size, input_size=image_size,
            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
            scale_range=(0.8, 1.0))
        super().__init__(num_classes, batch_size, transform=transform,
                         seed=seed)
        self.num_per_class = num_per_class
        self.image_size = image_size

    #: generation cache: the splits depend only on the size/shape args and
    #: split_seed (NOT the run seed — proven by
    #: test_texture_dataset_split_constant_across_seeds), so the 12 runs of
    #: a default invocation share one generation pass. Images are read-only
    #: downstream (augmentation copies), so sharing the arrays is safe.
    _split_cache: dict = {}

    def setup(self, stage=None) -> None:
        if self._splits:
            return
        key = (self.num_per_class, self.image_size, self.orientations,
               self.lengths, self.split_seed)
        cached = self._split_cache.get(key)
        if cached is not None:
            self._splits = cached
            return
        rng = np.random.default_rng(self.split_seed)
        kernels = [_oriented_kernel(np.pi * o / self.orientations, ln)
                   for ln in self.lengths for o in range(self.orientations)]
        tr_i, tr_l, va_i, va_l, te_i, te_l = [], [], [], [], [], []
        n_tr = int(0.7 * self.num_per_class)
        n_va = int(0.15 * self.num_per_class)
        for label, kernel in enumerate(kernels):
            imgs = [_texture_image(rng, kernel, self.image_size)
                    for _ in range(self.num_per_class)]
            tr_i += imgs[:n_tr]
            va_i += imgs[n_tr:n_tr + n_va]
            te_i += imgs[n_tr + n_va:]
            tr_l += [label] * n_tr
            va_l += [label] * n_va
            te_l += [label] * (self.num_per_class - n_tr - n_va)
        self._splits = {
            "train": _Split(tr_i, np.asarray(tr_l, np.int64)),
            "val": _Split(va_i, np.asarray(va_l, np.int64)),
            "test": _Split(te_i, np.asarray(te_l, np.int64)),
        }
        self._split_cache[key] = self._splits


# -------------------------------------------------------------- torch stack


def flax_default_init_torch(model):
    """Re-initialize a torch model from flax's default weight law — the
    mirror arm of ``--torch_init`` (models/torch_init.py): every
    ``nn.Conv2d``/``nn.Linear`` weight becomes lecun-normal (truncated
    normal at ±2σ, stddev √(1/fan_in), flax's
    ``variance_scaling(1.0, "fan_in", "truncated_normal")`` including its
    1/0.8796 truncation-variance correction) with zero bias, and
    ``nn.MultiheadAttention``'s fused ``in_proj`` gets fan_in=embed_dim
    per row — matching ``backbones/vit.py::_ProjParams``, which flattens
    the fused QKV kernel to (fan_in=D, fan_out) before lecun_normal.
    BatchNorm/LayerNorm (ones/zeros) and the ViT cls (zeros) /
    pos-embed (N(0, 0.02)) already agree between the two stacks and are
    left untouched.  Uses the ambient torch RNG (caller seeds)."""
    import torch
    import torch.nn as nn

    # flax truncates the UNIT normal at ±2 then rescales so the post-
    # truncation stddev is exactly sqrt(1/fan_in)
    trunc_correction = 1.0 / 0.87962566103423978

    def lecun_trunc_(weight, fan_in):
        std = (1.0 / fan_in) ** 0.5 * trunc_correction
        nn.init.trunc_normal_(weight, mean=0.0, std=std,
                              a=-2.0 * std, b=2.0 * std)

    for mod in model.modules():
        if isinstance(mod, nn.Conv2d):
            kh, kw = mod.kernel_size
            lecun_trunc_(mod.weight,
                         mod.in_channels // mod.groups * kh * kw)
            if mod.bias is not None:
                nn.init.zeros_(mod.bias)
        elif isinstance(mod, nn.Linear):
            lecun_trunc_(mod.weight, mod.in_features)
            if mod.bias is not None:
                nn.init.zeros_(mod.bias)
        elif isinstance(mod, nn.MultiheadAttention):
            if mod.in_proj_weight is not None:
                lecun_trunc_(mod.in_proj_weight, mod.embed_dim)
            if mod.in_proj_bias is not None:
                nn.init.zeros_(mod.in_proj_bias)
            # out_proj is an nn.Linear and is re-drawn by the branch above
    return model


def _build_torch_model(model_type: str, variant: str, num_classes: int,
                       image_size: int):
    """The reference composition with timm replaced by equivalent
    hand-built backbones (same structure timm's ``resnet18`` /
    ``vit_tiny_patch16_224`` have; timm is not installed in this
    container). The pooling ops and head structures are the reference's
    own (``models/pooling/nfp.py``, ``models/NFP_Pooling.py:25-36``,
    ``models/Lacunarity_Pooling.py:53-73``,
    ``models/texture_pooling.py:40-65,153-167,427-448``)."""
    if variant not in VARIANTS.get(model_type, ()):
        raise SystemExit(f"unknown variant {variant!r}; the torch side "
                         f"implements {VARIANTS}")
    if model_type == "vittiny":
        return _build_torch_vit(variant, num_classes, image_size)
    if model_type == "mobilenetv3":
        return _build_torch_mnv3(variant, num_classes)
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class ResNet18Features(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
                nn.ReLU(), nn.MaxPool2d(3, 2, 1))
            layers, cin = [], 64
            for cout, stride in ((64, 1), (128, 2), (256, 2), (512, 2)):
                layers += [BasicBlock(cin, cout, stride),
                           BasicBlock(cout, cout)]
                cin = cout
            self.layers = nn.Sequential(*layers)

        def forward(self, x):
            return self.layers(self.stem(x))

    class GapOnly(nn.Module):
        """texture_pooling.py:12-35 (RESNET18_GAP_ONLY)."""

        def __init__(self):
            super().__init__()
            self.backbone = ResNet18Features()
            self.fc = nn.Linear(512, num_classes)

        def forward(self, x):
            f = self.backbone(x)
            return self.fc(
                torch.nn.functional.adaptive_avg_pool2d(f, 1).flatten(1))

    class TextureNFP(nn.Module):
        """texture_pooling.py:153-167 + NFP_Pooling.py:25-36, with the
        reference's own NFPPooling op imported at runtime."""

        def __init__(self):
            super().__init__()
            if "/root/reference" not in sys.path:
                sys.path.insert(0, "/root/reference")
            from models.pooling.nfp import NFPPooling

            self.backbone = ResNet18Features()
            self.nfp = NFPPooling(in_channels=512, R=1, measure="cosine",
                                  padding=1)
            self.nfp_proj = nn.Linear(8, 512)
            self.fc = nn.Linear(512, num_classes)

        def forward(self, x):
            f = self.backbone(x)
            x_avg = torch.nn.functional.adaptive_avg_pool2d(f, 1).flatten(1)
            m = self.nfp(f)
            v = torch.nn.functional.adaptive_avg_pool2d(m, 1).flatten(1)
            return self.fc(x_avg * self.nfp_proj(v))

    class TextureDeepTEN(nn.Module):
        """texture_pooling.py:467-483 (ResNet18_DeepTENPooling) with the
        reference's own DeepTENEncoding op imported at runtime."""

        def __init__(self):
            super().__init__()
            if "/root/reference" not in sys.path:
                sys.path.insert(0, "/root/reference")
            from models.deepten import DeepTENEncoding

            num_codes = 32
            self.backbone = ResNet18Features()
            self.encoding = DeepTENEncoding(in_channels=512,
                                            num_codes=num_codes)
            self.bn = nn.BatchNorm1d(num_codes * 512)
            self.fc = nn.Linear(num_codes * 512, num_classes)

        def forward(self, x):
            return self.fc(self.bn(self.encoding(self.backbone(x))))

    class TextureFractal(nn.Module):
        """texture_pooling.py:96-112 (ResNet18_FractalPooling) with the
        reference's own fractal_pooling head (GDCB box-count), which takes
        the reference Params-dict shape (Fractal_Pooling.py:44-49)."""

        def __init__(self):
            super().__init__()
            if "/root/reference" not in sys.path:
                sys.path.insert(0, "/root/reference")
            from models.Fractal_Pooling import fractal_pooling

            self.backbone = ResNet18Features()
            self.pool = fractal_pooling(Params={
                "Model_name": "resnet18",
                "num_ftrs": {"resnet18": 512},
                "Dataset": "synthetic",
                "num_classes": {"synthetic": num_classes},
            })
            self.fc = nn.Linear(512, num_classes)

        def forward(self, x):
            f = self.backbone(x)
            return self.fc(self.pool(f).view(x.shape[0], -1))

    return {"texture_nfp": TextureNFP, "texture_deepten": TextureDeepTEN,
            "texture_fractal": TextureFractal,
            "gap_only": GapOnly}[variant]()


def _build_torch_vit(variant: str, num_classes: int, image_size: int):
    """ViT-Tiny (timm ``vit_tiny_patch16_224`` structure: 16×16 conv patch
    embed, CLS + learned pos embed, 12 pre-LN blocks of MHA(3 heads)/
    MLP(×4), final LN) + the reference's CLS-strip token→map reshape
    (``texture_pooling.py:55-59``) and its own ``lacunarity_pooling`` head
    imported from ``/root/reference``."""
    import torch
    import torch.nn as nn

    dim, depth, heads = 192, 12, 3

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(dim, eps=1e-6)
            self.attn = nn.MultiheadAttention(dim, heads, batch_first=True)
            self.ln2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                     nn.Linear(4 * dim, dim))

        def forward(self, x):
            h = self.ln1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            return x + self.mlp(self.ln2(x))

    class ViTTinyFeatures(nn.Module):
        def __init__(self):
            super().__init__()
            self.grid = image_size // 16
            n = self.grid * self.grid
            self.patch = nn.Conv2d(3, dim, 16, 16)
            self.cls = nn.Parameter(torch.zeros(1, 1, dim))
            self.pos = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
            self.blocks = nn.Sequential(*[Block() for _ in range(depth)])
            self.norm = nn.LayerNorm(dim, eps=1e-6)

        def forward(self, x):
            x = self.patch(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls.expand(x.shape[0], -1, -1), x], dim=1)
            return self.norm(self.blocks(x + self.pos))

        def feature_map(self, x):
            tokens = self.forward(x)[:, 1:]  # strip CLS
            b, n, c = tokens.shape
            return tokens.transpose(1, 2).reshape(b, c, self.grid, self.grid)

    class ViTGapOnly(nn.Module):
        """texture_pooling.py:40-65 (VITTINY_GAP_ONLY)."""

        def __init__(self):
            super().__init__()
            self.backbone = ViTTinyFeatures()
            self.fc = nn.Linear(dim, num_classes)

        def forward(self, x):
            fmap = self.backbone.feature_map(x)
            return self.fc(
                torch.nn.functional.adaptive_avg_pool2d(fmap, 1).flatten(1))

    class ViTLacunarity(nn.Module):
        """texture_pooling.py:427-448 (ViTTiny_LacunarityPooling) with the
        reference's own lacunarity_pooling head."""

        def __init__(self):
            super().__init__()
            if "/root/reference" not in sys.path:
                sys.path.insert(0, "/root/reference")
            from models.Lacunarity_Pooling import lacunarity_pooling

            self.backbone = ViTTinyFeatures()
            self.pool = lacunarity_pooling()
            self.fc = nn.Linear(dim, num_classes)

        def forward(self, x):
            fmap = self.backbone.feature_map(x)
            return self.fc(self.pool(fmap).view(x.shape[0], -1))

    return ViTLacunarity() if variant == "texture_lacunarity" \
        else ViTGapOnly()


#: mobilenetv3_large_100 block stages (paper Table 1 / timm arch_def) —
#: (kernel, stride, exp_ch, out_ch, use_se, act); the same table the flax
#: backbone is built from (backbones/mobilenetv3.py::_STAGES)
_MNV3_STAGES = (
    ((3, 1, 16, 16, False, "re"),),
    ((3, 2, 64, 24, False, "re"), (3, 1, 72, 24, False, "re")),
    ((5, 2, 72, 40, True, "re"), (5, 1, 120, 40, True, "re"),
     (5, 1, 120, 40, True, "re")),
    ((3, 2, 240, 80, False, "hs"), (3, 1, 200, 80, False, "hs"),
     (3, 1, 184, 80, False, "hs"), (3, 1, 184, 80, False, "hs")),
    ((3, 1, 480, 112, True, "hs"), (3, 1, 672, 112, True, "hs")),
    ((5, 2, 672, 160, True, "hs"), (5, 1, 960, 160, True, "hs"),
     (5, 1, 960, 160, True, "hs")),
)


def _stub_torchvision():
    """The reference's ``radam_pooling.py`` imports torchvision (absent in
    this container) only for ``T.Resize``; provide that one class backed by
    ``F.interpolate`` (bilinear — identical to torchvision for the
    UPSAMPLING this path does, antialias only differs on downscale)."""
    import types

    import torch
    import torch.nn as nn

    if "torchvision" in sys.modules:
        return

    class Resize(nn.Module):
        def __init__(self, size):
            super().__init__()
            self.size = (size, size) if isinstance(size, int) else size

        def forward(self, x):
            return torch.nn.functional.interpolate(
                x, size=self.size, mode="bilinear", align_corners=False)

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Resize = Resize
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def _build_torch_mnv3(variant: str, num_classes: int):
    """MobileNetV3-Large-100 (timm geometry: hardswish stem 16ch, the
    paper-Table-1 inverted-residual stages above, final 1×1 ConvBnAct 960)
    + the reference's own ``RADAMPooling`` head imported from
    ``/root/reference`` (``texture_pooling.py:612-626`` wiring: spatial 7,
    in 960, M=4, ``pool(x).squeeze(1)`` → fc; device 'cpu' instead of the
    reference's hard-coded 'cuda')."""
    import torch
    import torch.nn as nn

    def divisible(v, d=8):
        nv = max(d, int(v + d / 2) // d * d)
        return nv + d if nv < 0.9 * v else nv

    def act(name):
        return nn.ReLU() if name == "re" else nn.Hardswish()

    class SqueezeExcite(nn.Module):
        def __init__(self, ch, rd):
            super().__init__()
            self.reduce = nn.Conv2d(ch, rd, 1)
            self.expand = nn.Conv2d(rd, ch, 1)
            self.gate = nn.Hardsigmoid()

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            return x * self.gate(self.expand(torch.relu(self.reduce(s))))

    class InvertedResidual(nn.Module):
        def __init__(self, cin, k, s, exp, cout, se, a):
            super().__init__()
            layers = []
            if exp != cin:
                layers += [nn.Conv2d(cin, exp, 1, bias=False),
                           nn.BatchNorm2d(exp), act(a)]
            layers += [nn.Conv2d(exp, exp, k, s, k // 2, groups=exp,
                                 bias=False),
                       nn.BatchNorm2d(exp), act(a)]
            if se:
                layers += [SqueezeExcite(exp, divisible(exp / 4))]
            layers += [nn.Conv2d(exp, cout, 1, bias=False),
                       nn.BatchNorm2d(cout)]
            self.body = nn.Sequential(*layers)
            self.residual = s == 1 and cin == cout

        def forward(self, x):
            y = self.body(x)
            return x + y if self.residual else y

    class MNv3Features(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 16, 3, 2, 1, bias=False), nn.BatchNorm2d(16),
                nn.Hardswish())
            blocks, cin = [], 16
            for stage in _MNV3_STAGES:
                for (k, s, exp, cout, se, a) in stage:
                    blocks.append(InvertedResidual(cin, k, s, exp, cout,
                                                   se, a))
                    cin = cout
            blocks += [nn.Conv2d(cin, 960, 1, bias=False),
                       nn.BatchNorm2d(960), nn.Hardswish()]
            self.blocks = nn.Sequential(*blocks)

        def forward(self, x):
            return self.blocks(self.stem(x))

    class MNv3GapOnly(nn.Module):
        """texture_pooling.py:70-92 (MOBILENETV3_GAP_ONLY)."""

        def __init__(self):
            super().__init__()
            self.backbone = MNv3Features()
            self.fc = nn.Linear(960, num_classes)

        def forward(self, x):
            f = self.backbone(x)
            return self.fc(
                torch.nn.functional.adaptive_avg_pool2d(f, 1).flatten(1))

    class MNv3RADAM(nn.Module):
        """texture_pooling.py:612-626 (MobileNetV3_RADAMPooling)."""

        def __init__(self):
            super().__init__()
            _stub_torchvision()
            if "/root/reference" not in sys.path:
                sys.path.insert(0, "/root/reference")
            cwd = os.getcwd()
            os.chdir("/root/reference")  # RNN.py:95 loads the LCG pkl
            try:                         # by a CWD-relative path
                from models.radam_pooling import RADAMPooling

                self.pool = RADAMPooling(spatial_size=7, in_channels=960,
                                         M=4, device="cpu")
            finally:
                os.chdir(cwd)
            self.backbone = MNv3Features()
            self.fc = nn.Linear(960, num_classes)

        def forward(self, x):
            f = self.backbone(x)
            return self.fc(self.pool(f).squeeze(1))

    return MNv3RADAM() if variant == "texture_radam" else MNv3GapOnly()


def _torch_eval(model, batches, num_classes: int):
    import torch

    cm = np.zeros((num_classes, num_classes), np.int64)
    model.eval()
    with torch.no_grad():
        for batch in batches:
            x = torch.from_numpy(
                np.transpose(batch["image"], (0, 3, 1, 2))).contiguous()
            preds = model(x).argmax(dim=1).numpy()
            for t, p, w in zip(batch["label"], preds, batch["weight"]):
                if w > 0:
                    cm[int(t), int(p)] += 1
    return metrics_from_confusion_np(cm)


def train_torch(variant: str, seed: int, args) -> float:
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    dm = _make_dm(args, seed)
    dm.setup()
    model = _build_torch_model(args.model_type, variant, dm.num_classes,
                               args.image_size)
    if getattr(args, "flax_init", False):
        # init-sensitivity mirror arm: torch stack, flax weight law
        flax_default_init_torch(model)
    opt = torch.optim.Adam(model.parameters(), lr=args.learning_rate)
    crit = nn.CrossEntropyLoss(label_smoothing=0.05, reduction="none")
    best_acc, best_state = -1.0, None
    for epoch in range(args.max_epochs):
        model.train()
        for batch in dm.train_batches(epoch):
            x = torch.from_numpy(
                np.transpose(batch["image"], (0, 3, 1, 2))).contiguous()
            y = torch.from_numpy(batch["label"]).long()
            w = torch.from_numpy(batch["weight"])
            opt.zero_grad()
            losses = crit(model(x), y)
            ((losses * w).sum() / w.sum().clamp(min=1.0)).backward()
            opt.step()
        acc = float(_torch_eval(model, dm.val_batches(),
                                dm.num_classes)["accuracy"])
        if acc > best_acc:  # best-val-acc selection, demo.py:381-392
            best_acc = acc
            best_state = copy.deepcopy(model.state_dict())
    model.load_state_dict(best_state)
    return float(_torch_eval(model, dm.test_batches(),
                             dm.num_classes)["accuracy"])


# ---------------------------------------------------------------- jax stack


def train_jax(variant: str, seed: int, args, workdir: str) -> float:
    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import Trainer, TrainerConfig
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dm = _make_dm(args, seed)
    model = get_model(args.model_type, variant, dm.num_classes)
    init_variables = None
    if getattr(args, "torch_init", False):
        # init-sensitivity arm: re-sample the flax init from the torch
        # nn.Conv2d/nn.Linear default distributions so both stacks start
        # from the SAME weight law (models/torch_init.py). The compiled
        # train step is unchanged — only the initial leaves differ.
        import jax
        import jax.numpy as jnp

        from neighbour_feature_pooling_tpu.models import torch_default_init

        dummy = jnp.zeros((1, args.image_size, args.image_size, 3),
                          jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(seed)}, dummy,
                               train=False)
        init_variables = torch_default_init(variables,
                                            jax.random.PRNGKey(seed))
    run = os.path.join(workdir, f"{variant}-seed{seed}")
    trainer = Trainer(model, dm.num_classes, init_variables=init_variables,
                      config=TrainerConfig(
        learning_rate=args.learning_rate, max_epochs=args.max_epochs,
        patience=args.max_epochs + 1,  # fixed-epoch protocol (both stacks)
        label_smoothing=0.05, seed=seed, tensorboard=False,
        log_every_n_steps=0, log_dir=os.path.join(run, "logs"),
        ckpt_dir=os.path.join(run, "ckpt")))
    try:
        trainer.fit(dm)
        return float(trainer.test(dm, restore="best")["accuracy"])
    finally:
        trainer.close()


# --------------------------------------------------------------------- main


def _make_dm(args, seed: int) -> SyntheticTextureDataModule:
    return SyntheticTextureDataModule(
        num_per_class=args.num_per_class, image_size=args.image_size,
        batch_size=args.batch_size, seed=seed,
        orientations=args.orientations,
        lengths=tuple(args.lengths))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--frameworks", default="torch,jax",
                   help="comma list of torch,jax")
    p.add_argument("--model_type", default="resnet18",
                   choices=sorted(VARIANTS))
    p.add_argument("--variants", default=None,
                   help="comma list; default = the torch-implemented pair "
                        "for --model_type")
    p.add_argument("--seeds", type=int, nargs="+", default=[42, 123, 999])
    p.add_argument("--max_epochs", type=int, default=12)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_per_class", type=int, default=96)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--orientations", type=int, default=4)
    p.add_argument("--lengths", type=float, nargs="+", default=[2.0, 5.0])
    p.add_argument("--workdir", default="logs/reproduce_synthetic")
    p.add_argument("--out", default=os.path.join(
        REPO, "reproduce_synthetic.jsonl"))
    p.add_argument("--quick", action="store_true",
                   help="tiny smoke config (2 classes, 8 img/class, 48px, "
                        "1 epoch, seed 42)")
    p.add_argument("--torch_init", action="store_true",
                   help="jax side only: re-sample the flax init from torch "
                        "nn.Conv2d/nn.Linear defaults (kaiming-uniform "
                        "a=sqrt(5) kernels, uniform biases) so both stacks "
                        "start from the same weight distribution — the "
                        "init-sensitivity arm of the parity experiment")
    p.add_argument("--flax_init", action="store_true",
                   help="torch side only: re-init nn.Conv2d/nn.Linear/"
                        "MultiheadAttention from flax defaults (lecun-"
                        "normal kernels, zero biases) — the mirror of "
                        "--torch_init, used to test whether a residual "
                        "accuracy gap is init-distribution-driven")
    p.add_argument("--cpu", action="store_true",
                   help="run the jax side on the CPU backend (the axon "
                        "sitecustomize ignores JAX_PLATFORMS; this flag is "
                        "the supported override)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.seeds = [42]
        args.max_epochs = 1
        args.num_per_class = 8
        args.image_size = 48
        args.orientations = 2
        args.lengths = [2.0]
        args.batch_size = 8

    frameworks = [f.strip() for f in args.frameworks.split(",") if f.strip()]
    variants = ([v.strip() for v in args.variants.split(",") if v.strip()]
                if args.variants else list(DEFAULT_VARIANTS[args.model_type]))
    if args.model_type == "vittiny" and args.image_size % 16:
        raise SystemExit("vittiny needs --image_size divisible by 16")
    if getattr(args, "torch_init", False) and args.model_type == "vittiny":
        # torch_default_init targets the conv-net families only: the ViT
        # fused-QKV ReshapedKernelDense kernel is 3-D (overcounted fan_in)
        # and timm ViTs use trunc-normal, not torch module defaults — a
        # vittiny --torch_init arm would be a mis-initialized experiment
        # (models/torch_init.py docstring).
        raise SystemExit("--torch_init is conv-net-only (resnet18/resnet50/"
                         "mobilenetv3); it would mis-initialize vittiny's "
                         "fused-QKV kernel and timm ViTs use trunc-normal "
                         "init anyway")
    if "texture_fractal" in variants and args.image_size < 192:
        # GDCB's kernel-6 VALID max-pool needs a >=6x6 feature map — the
        # same constraint in BOTH stacks (the reference's nn.MaxPool2d and
        # ops/fractal.py fail identically below it); ResNet18's map is
        # input_size/32
        raise SystemExit("texture_fractal needs --image_size >= 192 "
                         "(GDCB kernel-6 pool on the input_size/32 map)")
    results = {}
    records = []
    for fw in frameworks:
        for variant in variants:
            accs = []
            for seed in args.seeds:
                t0 = time.perf_counter()
                if fw == "torch":
                    acc = train_torch(variant, seed, args)
                elif fw == "jax":
                    acc = train_jax(variant, seed, args, args.workdir)
                else:
                    raise SystemExit(f"unknown framework {fw!r}")
                dt = time.perf_counter() - t0
                print(f"{fw:5s} {variant:12s} seed {seed}: "
                      f"test acc {acc:.4f}  ({dt:.0f}s)")
                accs.append(acc)
                rec = {"framework": fw,
                       "model_type": args.model_type,
                       "variant": variant,
                       "seed": seed, "test_acc": acc,
                       "train_s": round(dt, 1)}
                if args.torch_init and fw == "jax":
                    rec["torch_init"] = True
                if getattr(args, "flax_init", False) and fw == "torch":
                    rec["flax_init"] = True
                records.append(rec)
            results[(fw, variant)] = accs

    print("\n== mean ± std over seeds", args.seeds, "==")
    summary = {"config": {k: v for k, v in vars(args).items()
                          if k not in ("out", "workdir")}}
    for (fw, variant), accs in results.items():
        m, s = float(np.mean(accs)), float(np.std(accs))
        print(f"{fw:5s} {variant:12s}: {m:.4f} ± {s:.4f}")
        summary[f"{fw}_{variant}"] = {"mean": round(m, 4),
                                      "std": round(s, 4)}
    for variant in variants:
        a, b = results.get(("torch", variant)), results.get(("jax", variant))
        if a and b:
            d = float(np.mean(b)) - float(np.mean(a))
            print(f"jax - torch ({variant}): {d:+.4f}")
            summary[f"delta_{variant}"] = round(d, 4)
    with open(args.out, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps(summary) + "\n")
    print(f"appended {len(records) + 1} records to {args.out}")


if __name__ == "__main__":
    main()
