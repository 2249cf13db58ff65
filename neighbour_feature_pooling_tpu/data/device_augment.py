"""Device-side train-batch augmentation (crop + resize + flip + normalize).

TPU-native alternative to the host augment stage: the reference runs
torchvision transforms in 12 DataLoader worker processes
(``/root/reference/demo.py:523``); here the host only *plans* each sample's
random crop box and flip (``transforms.plan_train`` — microseconds), and the
pixel work — one fused bilinear gather-resize + flip + normalize over the
whole batch — runs as a jitted kernel on the accelerator. On hosts with few
cores the CPU pipeline caps training throughput (this container measures
~500 img/s/core vs a ~9k img/s device train step); the device path removes
that ceiling for any dataset whose decoded images share one shape.

Semantics: equivalent sampling grid to the host pipeline's single-pass
crop+resize (``transforms.py`` "Crop plans" note) with plain bilinear
filtering — i.e. torchvision's ``antialias=False``. PIL antialiases
downscales, so device-augmented TRAIN pixels differ slightly from the host
oracle; eval batches always use the host path, keeping reported accuracy
bit-identical to the reference pipeline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["augment_batch_device"]


@functools.partial(jax.jit, static_argnames=("out_size",))
def augment_batch_device(raw: jax.Array, crops: jax.Array, flips: jax.Array,
                         out_size: int, mean: jax.Array,
                         std: jax.Array) -> jax.Array:
    """Crop+resize+flip+normalize a uniform-shape image batch on device.

    raw:   (B, H, W, C) float32 in [0, 1] or uint8 in [0, 255] — uint8 is
           the preferred transport: it crosses host->device at 1/4 the
           bytes and is rescaled on the accelerator (the dtype is static
           at trace time, so each variant compiles once)
    crops: (B, 4) int32 — per-sample (top, left, h, w) source boxes
    flips: (B,) int32 — 1 = horizontal flip
    mean/std: (C,) float32 normalization constants
    Returns (B, out_size, out_size, C) float32.
    """
    _, h, w, _ = raw.shape
    # bilinear interpolation is linear, so uint8 inputs can stay in 0-255
    # space through the gather and fold the 1/255 into the final affine
    scale = jnp.float32(1.0 / 255.0) if raw.dtype == jnp.uint8 \
        else jnp.float32(1.0)

    def one(img, box, flip):
        top, left, ch, cw = (box[0].astype(jnp.float32),
                             box[1].astype(jnp.float32),
                             box[2].astype(jnp.float32),
                             box[3].astype(jnp.float32))
        # bilinear sample positions, torchvision/PIL convention:
        # src = (dst + 0.5) * scale - 0.5, offset into the crop box
        sy = (jnp.arange(out_size) + 0.5) * (ch / out_size) - 0.5 + top
        sx = (jnp.arange(out_size) + 0.5) * (cw / out_size) - 0.5 + left
        y0f = jnp.floor(sy)
        x0f = jnp.floor(sx)
        wy = (sy - y0f)[:, None, None]
        wx = (sx - x0f)[None, :, None]
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        rows = img[y0] * (1.0 - wy) + img[y1] * wy      # (out, W, C)
        out = (rows[:, x0] * (1.0 - wx)
               + rows[:, x1] * wx)                      # (out, out, C)
        return jnp.where(flip > 0, out[:, ::-1], out)

    out = jax.vmap(one)(raw.astype(jnp.float32), crops, flips)
    return (out * scale - mean) / std


def normalization_constants(cfg, channels: int) -> Tuple["np.ndarray",
                                                         "np.ndarray"]:
    """Per-channel mean/std broadcast like the host pipeline
    (``transforms._normalize``: single stat spread over all bands when the
    config does not match the channel count, e.g. 13-band EuroSAT). The
    single shared implementation for the native and device pipelines."""
    import numpy as np

    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    if mean.size != channels:
        mean = np.full((channels,), float(mean.mean()), np.float32)
        std = np.full((channels,), float(std.mean()), np.float32)
    return mean, std
