#!/usr/bin/env python
"""Freeze an existing training checkpoint into a serving artifact.

Standalone twin of the CLI's ``--export_dir`` handoff (cli.py::
_export_artifact) for checkpoints trained elsewhere / earlier: builds
the Predictor, optionally quantizes (full int8 or the mixed tier,
calibrated from an ``.npy`` sample file), and writes the ``jax.export``
artifact that ``serve.load_exported`` / ``serve_http --exported`` run
without any model code.

    python scripts/export_model.py \
        --checkpoint checkpoints/UCMerced/exp_seed42/best \
        --model_type resnet18 --model_variant texture_nfp \
        --num_classes 21 --quantize int8 \
        --calibration_npy val_images.npy --out art/
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint path prefix (…/best or …/last)")
    ap.add_argument("--import_ckpt", default=None,
                    help="OR: a trained PyTorch reference checkpoint "
                         "(Lightning .ckpt / torch state_dict) converted "
                         "via models.import_torch — export a reference-"
                         "trained model straight to a TPU serving artifact")
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--model_type", default="resnet18")
    ap.add_argument("--model_variant", default="texture_nfp")
    ap.add_argument("--num_classes", type=int, required=True)
    ap.add_argument("--num_input_channels", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--resize_size", type=int, default=256)
    ap.add_argument("--similarity", default="cosine")
    ap.add_argument("--nfp_radius", type=int, default=1)
    ap.add_argument("--bf16", action="store_true",
                    help="model dtype bf16 (must match training)")
    ap.add_argument("--stem_s2d", action=argparse.BooleanOptionalAction,
                    default=True, help="must match training")
    ap.add_argument("--quantize", choices=["none", "int8", "int8_mixed"],
                    default="none")
    ap.add_argument("--calibration_npy", default=None,
                    help="int8 tiers: .npy (N,H,W,C) raw [0,1] images for "
                         "static activation calibration (preprocessed "
                         "through the eval transform here)")
    args = ap.parse_args(argv)
    if bool(args.checkpoint) == bool(args.import_ckpt):
        ap.error("pass exactly one of --checkpoint / --import_ckpt")

    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.serve import (Predictor,
                                                     export_predictor)

    mixed = args.quantize == "int8_mixed"
    dtype = jnp.bfloat16 if (args.bf16 or mixed) else jnp.float32
    pred = Predictor(
        args.model_type, args.model_variant, args.num_classes,
        checkpoint=args.checkpoint, import_ckpt=args.import_ckpt,
        batch_size=args.batch_size,
        input_size=args.input_size, resize_size=args.resize_size,
        num_input_channels=args.num_input_channels,
        model_kwargs=dict(measure=args.similarity,
                          nfp_radius=args.nfp_radius,
                          dtype=dtype, stem_s2d=args.stem_s2d),
        quantize=None if args.quantize == "none" else "int8",
        quantize_spatial=not mixed)
    if args.quantize != "none" and args.calibration_npy:
        samples = np.asarray(np.load(args.calibration_npy), np.float32)
        n = pred.calibrate(list(samples))
        print(f"calibrated {n} layers on {len(samples)} images")
    export_predictor(pred, args.out)
    size = sum(os.path.getsize(os.path.join(args.out, f))
               for f in os.listdir(args.out))
    print(f"artifact written to {args.out} ({size / 1e6:.1f} MB, "
          f"tier={args.quantize})")


if __name__ == "__main__":
    main()
