#!/usr/bin/env python
"""Visualize Neighborhood Feature Pooling similarity maps.

Renders what the NFP op actually computes — one similarity map per
neighbor direction (k²−1 of them), plus their mean — either directly on
an image's pixels or on a model's backbone feature map, for any of the
16 measures. The reference repo ships only a static architecture figure
(``/root/reference/nfp_overview.png``); this produces the equivalent
live view from real data and real (optionally trained) models.

    # raw-pixel similarity structure of an image
    python scripts/visualize_nfp.py --image leaf.jpg --measure cosine \
        --out nfp_cosine.png

    # what a trained model's NFP head sees at the backbone tap
    python scripts/visualize_nfp.py --image leaf.jpg \
        --model_type resnet18 --model_variant texture_nfp \
        --checkpoint checkpoints/UCMerced/exp_seed42/best --out tap.png

    # one mean-map panel per measure
    python scripts/visualize_nfp.py --image leaf.jpg --all_measures \
        --out measures.png

Runs on CPU by default (``--device tpu`` to opt in): nothing here needs
the accelerator, and in this container the axon sitecustomize would
otherwise claim the TPU chip for a plotting script.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_image(path: str, size: int) -> np.ndarray:
    """Decode + bilinear-resize to (1, size, size, 3) float32 in [0, 1]."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size),
                                                 Image.BILINEAR)
    return np.asarray(img, np.float32)[None] / 255.0


def synthetic_image(size: int, seed: int = 0) -> np.ndarray:
    """A structured test pattern (oriented stripes + blobs + noise) whose
    neighborhood-similarity maps are visually interpretable."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    stripes = 0.5 + 0.5 * np.sin((xx + yy) * 24.0)
    blobs = np.exp(-(((xx - 0.3) ** 2 + (yy - 0.6) ** 2) / 0.02))
    img = np.stack([stripes, blobs,
                    0.5 * stripes + 0.5 * blobs], axis=-1)
    img = 0.85 * img + 0.15 * rng.random((size, size, 3), np.float32)
    return np.clip(img, 0.0, 1.0)[None].astype(np.float32)


def backbone_feature_map(model_type: str, model_variant: str, x,
                         checkpoint: str | None = None,
                         import_ckpt: str | None = None,
                         num_classes: int = 21) -> np.ndarray:
    """Run the zoo model and capture its backbone output (NHWC map).

    ViT token sequences are reshaped through the same CLS-strip
    ``tokens_to_map`` the model itself uses (zoo.py).
    """
    import jax
    import jax.numpy as jnp
    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.models.backbones import tokens_to_map

    model = get_model(model_type, model_variant, num_classes)
    if checkpoint:
        from neighbour_feature_pooling_tpu.serve import restore_for_inference

        params, batch_stats = restore_for_inference(checkpoint)
        variables = {"params": params, "batch_stats": batch_stats}
    elif import_ckpt:
        from neighbour_feature_pooling_tpu.models.import_torch import (
            import_reference_checkpoint)

        variables, _ = import_reference_checkpoint(
            import_ckpt, model_type, model_variant)
    else:
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.asarray(x), train=False)

    _, inter = model.apply(
        variables, jnp.asarray(x), train=False,
        capture_intermediates=lambda mdl, _name: mdl.name == "backbone",
        mutable=["intermediates"])
    fmap = inter["intermediates"]["backbone"]["__call__"][0]
    if isinstance(fmap, tuple):  # features+head backbone modes
        fmap = fmap[-1]
    if fmap.ndim == 3:  # ViT (B, 1+N, C) token sequence
        fmap = tokens_to_map(fmap)
    return np.asarray(fmap)


def similarity_maps(fmap: np.ndarray, radius: int, measure: str,
                    similarity: bool = True) -> np.ndarray:
    """NFP at stride 1 / padding R (the production head geometry):
    returns (H, W, k²−1) similarity maps for ``fmap[0]``."""
    from neighbour_feature_pooling_tpu.ops import nfp_reference

    out = nfp_reference(fmap, radius, measure, similarity=similarity,
                        padding=radius)
    return np.asarray(out[0])


def neighbor_labels(radius: int) -> list:
    """Compass labels for R=1, (dy,dx) offsets beyond."""
    from neighbour_feature_pooling_tpu.ops.neighborhood import (
        neighbor_offsets)

    compass = {(-1, -1): "NW", (-1, 0): "N", (-1, 1): "NE",
               (0, -1): "W", (0, 1): "E",
               (1, -1): "SW", (1, 0): "S", (1, 1): "SE"}
    labels = []
    for (i, j) in neighbor_offsets(radius):
        d = (i - radius, j - radius)
        labels.append(compass.get(d, f"({d[0]:+d},{d[1]:+d})"))
    return labels


def _setup_axes(n_panels: int, title: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cols = min(5, n_panels)
    rows = (n_panels + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_1d(axes).ravel()
    for ax in axes:
        ax.set_axis_off()
    fig.suptitle(title)
    return fig, axes


def render_neighbors(image: np.ndarray, maps: np.ndarray, labels: list,
                     measure: str, out: str) -> None:
    """PNG grid: input, mean map, then one panel per neighbor direction."""
    import matplotlib.pyplot as plt

    fig, axes = _setup_axes(2 + maps.shape[-1],
                            f"NFP similarity maps — {measure}")
    axes[0].imshow(image[0])
    axes[0].set_title("input")
    vmin, vmax = float(maps.min()), float(maps.max())
    panels = [("mean", maps.mean(-1))] + [
        (labels[n], maps[..., n]) for n in range(maps.shape[-1])]
    for ax, (label, m) in zip(axes[1:], panels):
        im = ax.imshow(m, cmap="magma", vmin=vmin, vmax=vmax)
        ax.set_title(label)
    fig.colorbar(im, ax=axes[1:2 + maps.shape[-1]].tolist(),
                 fraction=0.02)
    fig.savefig(out, dpi=110, bbox_inches="tight")
    plt.close(fig)


def render_measures(image: np.ndarray, mean_maps: dict, out: str) -> None:
    """PNG grid: input + the MEAN similarity map for every measure (each
    on its own scale — measures have incommensurate ranges)."""
    import matplotlib.pyplot as plt

    names = sorted(mean_maps)
    fig, axes = _setup_axes(1 + len(names), "NFP mean similarity by measure")
    axes[0].imshow(image[0])
    axes[0].set_title("input")
    for ax, name in zip(axes[1:], names):
        ax.imshow(mean_maps[name], cmap="magma")
        ax.set_title(name)
    fig.savefig(out, dpi=110, bbox_inches="tight")
    plt.close(fig)


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--image", default=None,
                    help="input image (default: a synthetic test pattern)")
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--measure", default="cosine")
    ap.add_argument("--all_measures", action="store_true",
                    help="one mean-map panel per measure instead of "
                         "per-neighbor panels of one measure")
    ap.add_argument("--dissimilarity", action="store_true",
                    help="similarity=False sign convention")
    ap.add_argument("--radius", type=int, default=1)
    ap.add_argument("--model_type", default=None,
                    help="tap a backbone feature map instead of raw pixels")
    ap.add_argument("--model_variant", default="texture_nfp")
    ap.add_argument("--num_classes", type=int, default=21)
    ap.add_argument("--checkpoint", default=None,
                    help="trained checkpoint prefix (…/best)")
    ap.add_argument("--import_ckpt", default=None,
                    help="trained PyTorch reference .ckpt (migration path)")
    ap.add_argument("--out", default="nfp_maps.png")
    ap.add_argument("--device", choices=["cpu", "default"], default="cpu",
                    help="cpu (default): force the CPU backend — env vars "
                         "alone don't override this container's TPU "
                         "sitecustomize; 'default' keeps whatever backend "
                         "jax picks")
    args = ap.parse_args(argv)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    image = (load_image(args.image, args.input_size) if args.image
             else synthetic_image(args.input_size))
    if args.model_type:
        fmap = backbone_feature_map(
            args.model_type, args.model_variant, image,
            checkpoint=args.checkpoint, import_ckpt=args.import_ckpt,
            num_classes=args.num_classes)
        src = f"{args.model_type} backbone tap {fmap.shape[1:3]}"
    else:
        fmap, src = image, "raw pixels"

    sim = not args.dissimilarity
    if args.all_measures:
        from neighbour_feature_pooling_tpu.ops.measures import MEASURES

        mean_maps = {
            name: similarity_maps(fmap, args.radius, name, sim).mean(-1)
            for name in MEASURES}
        render_measures(image, mean_maps, args.out)
        print(f"wrote {args.out}: {len(mean_maps)} measures on {src}")
    else:
        maps = similarity_maps(fmap, args.radius, args.measure, sim)
        render_neighbors(image, maps, neighbor_labels(args.radius),
                         args.measure, args.out)
        print(f"wrote {args.out}: {maps.shape[-1]} neighbor maps "
              f"({args.measure}) on {src}")
    return args.out


if __name__ == "__main__":
    main()
