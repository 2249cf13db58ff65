"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations

import jax

__all__ = ["use_interpret"]


def use_interpret() -> bool:
    """Pallas kernels compile via Mosaic on TPU and fall back to
    interpret mode everywhere else (the CPU test backend)."""
    return jax.default_backend() != "tpu"
