"""Native (C++) host-pipeline components, loaded via ctypes.

``augment_batch``: fused multithreaded resize→crop→flip→normalize over a
batch of variable-size images (see ``augment.cpp``). Compiled on first use
with ``g++ -O3``; falls back to the pure-numpy transform path when no
compiler is available. The numpy implementation in ``data/transforms.py`` is
the semantics oracle (tested against each other in
``tests/test_native_augment.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["augment_batch", "native_available", "build_library"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "augment.cpp")
_LIB_PATH = os.path.join(_HERE, "libnfp_augment.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build_library(force: bool = False) -> Optional[str]:
    """Compile augment.cpp → libnfp_augment.so (idempotent)."""
    if os.path.exists(_LIB_PATH) and not force:
        if not force and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
            return _LIB_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-o", _LIB_PATH, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        # always route through build_library(): it mtime-checks the source
        # so an edited augment.cpp cannot silently run as a stale binary
        path = build_library()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.nfp_augment_batch.restype = ctypes.c_int
        lib.nfp_augment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # images
            ctypes.POINTER(ctypes.c_int64),   # offsets
            ctypes.POINTER(ctypes.c_int32),   # shapes
            ctypes.POINTER(ctypes.c_int32),   # crops
            ctypes.POINTER(ctypes.c_int32),   # flips
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),   # mean
            ctypes.POINTER(ctypes.c_float),   # std
            ctypes.POINTER(ctypes.c_float),   # out
            ctypes.c_int,                     # num_threads
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def augment_batch(
    images: Sequence[np.ndarray],
    crops: np.ndarray,
    flips: np.ndarray,
    out_size: Tuple[int, int],
    mean: np.ndarray,
    std: np.ndarray,
    num_threads: int = 0,
) -> np.ndarray:
    """Fused resize(crop)→flip→normalize over a list of HWC images.

    Args:
      images: per-image HWC arrays (any sizes, same channel count);
        float32 in [0, 1] or uint8 in [0, 255] (scaled to [0, 1] here,
        matching ``transforms.to_float01``).
      crops: int32 (n, 4) crop boxes (top, left, h, w) in source coords.
      flips: int32/bool (n,) horizontal-flip flags.
      out_size: (out_h, out_w).
      mean/std: per-channel normalization, shape (C,).
      num_threads: worker threads (0 = cpu count).

    Returns:
      float32 (n, out_h, out_w, C).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native augment library unavailable "
                           "(g++ failed); use data/transforms.py")
    n = len(images)
    c = images[0].shape[2]
    out_h, out_w = out_size
    mean = np.asarray(mean, np.float32).reshape(-1)
    std = np.asarray(std, np.float32).reshape(-1)
    if mean.size != c or std.size != c:
        raise ValueError(
            f"mean/std must have {c} entries (one per channel), got "
            f"{mean.size}/{std.size}")
    crops = np.asarray(crops, np.int32)
    flips = np.asarray(flips, np.int32).reshape(-1)
    if crops.shape != (n, 4) or flips.shape != (n,):
        raise ValueError(
            f"crops must be ({n}, 4) and flips ({n},), got "
            f"{crops.shape}/{flips.shape}")
    flat_parts = []
    offsets = np.zeros(n, np.int64)
    shapes = np.zeros((n, 2), np.int32)
    off = 0
    for i, img in enumerate(images):
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0  # bit-identical to_float01
        elif img.dtype != np.float32 or not img.flags["C_CONTIGUOUS"]:
            img = np.ascontiguousarray(img, np.float32)
        flat_parts.append(img.reshape(-1))
        offsets[i] = off
        shapes[i] = img.shape[:2]
        off += img.size
    flat = np.concatenate(flat_parts) if flat_parts else np.zeros(0, np.float32)
    crops = np.ascontiguousarray(crops, np.int32)
    flips = np.ascontiguousarray(flips, np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((n, out_h, out_w, c), np.float32)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = lib.nfp_augment_batch(
        flat.ctypes.data_as(fp),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        shapes.ctypes.data_as(ip), crops.ctypes.data_as(ip),
        flips.ctypes.data_as(ip), n, c, out_h, out_w,
        mean.ctypes.data_as(fp), std.ctypes.data_as(fp),
        out.ctypes.data_as(fp), num_threads)
    if rc != 0:
        raise RuntimeError(f"nfp_augment_batch failed with code {rc}")
    return out
