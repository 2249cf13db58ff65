#!/usr/bin/env python
"""Train and evaluate texture-pooling models — TPU-native CLI.

Flag-compatible with the reference's ``demo.py`` (see
``neighbour_feature_pooling_tpu/cli.py`` for the implementation and the
documented additions).

Example:
    python demo.py --dataset synthetic --model_type resnet18 \
        --model_variant texture_nfp --input_size 64 --max_epochs 3 --seeds 42
"""

from neighbour_feature_pooling_tpu.cli import main

if __name__ == "__main__":
    main()
