"""neighbour_feature_pooling_tpu — a TPU-native (JAX/Flax/XLA/Pallas) framework for
texture-aware image classification with Neighborhood Feature Pooling.

A from-scratch re-design of the capabilities of
`Advanced-Vision-and-Learning-Lab/Neighbour_Feature_Pooling` (PyTorch/Lightning):

* ``ops``      — the scientific core: NFP (16+ similarity measures, fused Pallas
                 kernel), fractal box-counting, lacunarity, DeepTEN encoding and
                 RADAM randomized-autoencoder pooling, all as XLA-friendly fused ops.
* ``models``   — Flax backbones (ResNet18/50, MobileNetV3-Large, ViT-Tiny), a
                 composable texture-pooling head library and a model registry that
                 mirrors the reference's ``model_type`` × ``model_variant`` grid.
* ``data``     — host-side input pipelines for the reference's dataset zoo with
                 synthetic fallbacks for offline environments.
* ``train``    — jit-compiled train/eval engine: Adam + label-smoothed CE, metric
                 suite, early stopping, best/last checkpointing (Orbax), 3-seed driver.
* ``parallel`` — ``jax.sharding.Mesh`` based data-parallel scaling over ICI.
"""

__version__ = "0.1.0"
