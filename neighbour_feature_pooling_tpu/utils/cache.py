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
    """Hash of (jaxlib version, host CPU flags), keying the TPU cache dir
    so entries never cross jaxlib versions or host environments (a
    container rescheduled onto a different host orphans its cached remote
    compiles — a one-time 1–6 min recompile, safe)."""
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


def _cpu_backend_selected() -> bool:
    """True when this process will run on the XLA:CPU backend.

    Read from config/env only — never calls ``jax.default_backend()``,
    which would force device discovery (through the TPU relay that can
    block for minutes while a chip is claimed). In this container the
    relay sitecustomize owns the default, so an unset platform means TPU;
    tests/conftest.py and CLI ``--cpu`` paths set ``jax_platforms=cpu``
    explicitly before enabling the cache.
    """
    plats = ""
    try:
        import jax

        plats = jax.config.jax_platforms or ""
    except Exception:
        pass
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    return plats.split(",")[0].strip().lower() == "cpu"


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Best-effort enablement; returns True when active.

    CPU-backend processes get NO persistent cache. XLA:CPU entries are
    AOT host machine code, and this jaxlib's loader compares the
    compile-time feature list (which bakes in the pseudo-features
    ``+prefer-no-scatter,+prefer-no-gather``) against the runtime host
    probe (which never reports them) — so EVERY reload logs a
    machine-mismatch error (two-process repro in a fresh dir shows the
    mismatch on every load), and the dir cannot be split per backend
    within one process. The log spam alone outweighs the seconds a CPU
    cache saves. NOTE (corrected in round 4): the test_cli SIGABRTs this
    skip was once blamed for were NOT cache-related — they reproduce
    with the guard verified active and are XLA:CPU's 40 s cross-device
    all-reduce rendezvous timing out when 8 virtual-device threads
    contend for 1 core (``rendezvous.cc: Termination timeout for all
    reduce``, process aborted by design); see tests/test_cli.py's module
    docstring and CLAUDE.md. TPU entries are device code —
    host-portable and 1–6 min each through the relay — so TPU processes
    keep the persistent cache.
    """
    import jax

    try:
        if _cpu_backend_selected():
            return False
        base = cache_dir or os.environ.get("NFP_TPU_CACHE_DIR", _DEFAULT_DIR)
        path = os.path.join(base, _host_fingerprint())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
