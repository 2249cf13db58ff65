"""Persistent XLA compilation cache.

Compiles through this environment's TPU relay cost 1-6 minutes; the
persistent cache brings repeat startups down ~5x. Enabled by default by the
CLI, the benchmark and the driver entry points.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.expanduser("~/.cache/nfp_tpu_xla")


def _host_fingerprint() -> str:
    """Hash of (jaxlib version, host CPU flags). XLA:CPU cache entries are
    AOT machine code whose cache key does NOT cover the exact CPU feature
    set — an entry compiled in a container scheduled on different hardware
    (or under a different LLVM feature table) loads with a 'machine type
    doesn't match' warning and can SIGILL/abort at execution (observed:
    metrics_from_confusion aborting inside a cached CPU executable). The
    fingerprint keys the cache dir so entries never cross environments.

    Tradeoff accepted: TPU executables are NOT host-CPU-sensitive, so a
    container rescheduled onto a host with different CPU flags also
    orphans its cached remote TPU compiles (one-time 1–6 min recompiles).
    The cache dir is global per-process — it cannot be split per backend
    — and a wrong-host CPU entry aborts the process, so correctness wins.
    """
    import hashlib
    import platform
    import re

    parts = [platform.machine()]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", ""))
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            # x86 says "flags :", aarch64 says "Features :"
            m = re.search(r"(?:flags|Features)\s*:\s*(.*)", f.read())
        parts.append(m.group(1) if m else platform.processor())
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha256(" ".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Best-effort enablement; returns True when active."""
    import jax

    try:
        base = cache_dir or os.environ.get("NFP_TPU_CACHE_DIR", _DEFAULT_DIR)
        path = os.path.join(base, _host_fingerprint())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
