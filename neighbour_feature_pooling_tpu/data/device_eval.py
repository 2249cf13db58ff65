"""Device-side EVAL preprocessing: PIL-exact antialiased resize as matmuls.

The eval pipeline (Resize -> CenterCrop -> Normalize, the reference's
``/root/reference/DataModules.py:31-40``) runs on the host in this
framework so reported metrics are bit-exact against the reference's
torchvision transforms. ``--device_eval`` moves it onto the accelerator
for uniform-shape datasets: PIL's antialiased bilinear resample is a
*separable linear* operator, so the whole Resize+CenterCrop chain per
axis collapses into one (out, in) weight matrix — precomputed on the
host with PIL's exact triangle-filter weight schedule (mirroring
``native/augment.cpp::compute_weights``) — and the device applies it as
two MXU matmuls over the batch:

    out[b, o, p, c] = Wy[o, h] * img[b, h, w, c] * Wx[p, w]

Combined with the device-resident split (``device_data.py``) eval needs
no per-epoch pixel traffic at all. Numerics: identical sampling weights,
different accumulation order than PIL's sequential float32 loops ->
matches the host oracle to ~1e-6 (tested at 1e-5); opt-in so defaults
stay bit-exact.
"""

from __future__ import annotations

from typing import Tuple

import jax  # this module is imported lazily, only on the device-eval path
import jax.numpy as jnp
import numpy as np

__all__ = ["axis_weights", "eval_matrices", "eval_batch_device"]


def axis_weights(in_size: int, out_size: int) -> np.ndarray:
    """PIL triangle-filter (bilinear, antialias) resample weights as a
    dense (out_size, in_size) float32 matrix.

    Mirrors Pillow's ``ImagingResampleHorizontal`` weight schedule (and
    ``native/augment.cpp::compute_weights``): taps computed and
    normalized in double precision, then cast to float32.
    """
    scale = in_size / out_size
    fs = max(scale, 1.0)  # filterscale: widen support when downscaling
    support = fs  # triangle filter support = 1.0
    W = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        x = (np.arange(xmin, xmax, dtype=np.float64) - center + 0.5) / fs
        v = np.clip(1.0 - np.abs(x), 0.0, None)
        t = v.sum()
        if t > 0:
            v = v / t
        W[i, xmin:xmax] = v
    return W


def eval_matrices(shape_hw: Tuple[int, int], cfg) -> Tuple[np.ndarray,
                                                           np.ndarray]:
    """(Wy, Wx) composing the full host eval geometry for one source shape.

    Replicates ``transforms.eval_transform`` exactly: short side ->
    ``resize_size`` with truncated long side, then CenterCrop
    (``input_size``), including the upscale corner case where the crop
    covers the whole short side and is re-resized. Each step is a
    separable linear map, so the chain is two matrix products.
    """
    h, w = shape_hw
    R, inp = cfg.resize_size, cfg.input_size
    if h == w:
        rh = rw = R
    elif h < w:
        rh, rw = R, int(R * w / h)
    else:
        rh, rw = int(R * h / w), R
    Wy = axis_weights(h, rh)
    Wx = axis_weights(w, rw)
    if inp > min(rh, rw):  # crop to the short side, then upscale
        m = min(rh, rw)
        top = max((rh - m) // 2, 0)
        left = max((rw - m) // 2, 0)
        Wy = (axis_weights(m, inp).astype(np.float64)
              @ Wy[top: top + m].astype(np.float64)).astype(np.float32)
        Wx = (axis_weights(m, inp).astype(np.float64)
              @ Wx[left: left + m].astype(np.float64)).astype(np.float32)
    else:
        top = max((rh - inp) // 2, 0)
        left = max((rw - inp) // 2, 0)
        Wy = Wy[top: top + inp]
        Wx = Wx[left: left + inp]
    return Wy, Wx


@jax.jit
def eval_batch_device(raw, wy, wx, mean, std):
    """Antialiased resize+crop+normalize of a uniform batch on device.

    raw: (B, H, W, C) uint8 [0,255] or float32 [0,1]
    wy/wx: (out, H) / (out, W) composed weight matrices (``eval_matrices``)
    Returns (B, out, out, C) float32 — the eval pixels.
    """
    scale = jnp.float32(1.0 / 255.0) if raw.dtype == jnp.uint8 \
        else jnp.float32(1.0)
    x = raw.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST  # resample weights sum to 1; keep fp32
    x = jnp.einsum("oh,bhwc->bowc", wy, x, precision=hi)
    x = jnp.einsum("pw,bowc->bopc", wx, x, precision=hi)
    return (x * scale - mean) / std
