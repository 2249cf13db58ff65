"""Persistent XLA compilation cache.

Compiles through this environment's TPU relay cost 1-6 minutes; the
persistent cache brings repeat startups down ~5x. Enabled by default by the
CLI, the benchmark and the driver entry points.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.expanduser("~/.cache/nfp_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Best-effort enablement; returns True when active."""
    import jax

    try:
        path = cache_dir or os.environ.get("NFP_TPU_CACHE_DIR", _DEFAULT_DIR)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
