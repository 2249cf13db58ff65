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

    Insufficient on its own under VM CPU templates (second occurrence,
    2026-08-19): this Firecracker guest reports the masked model name
    "Intel(R) Xeon(R) Processor @ 2.10GHz" and an identical flag set on
    *different* physical hosts, so two containers collide on the same
    fingerprint while LLVM's CPUID-based host detection (which the AOT
    entry baked in) differs — the poisoned entry loads and aborts.
    ``enable_compilation_cache`` therefore additionally salts CPU-backend
    processes with the VM boot id.

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


def _boot_salt() -> str:
    """Per-VM-boot salt: stable across process restarts inside one
    container (cache hits where they are safe), fresh for every new
    container (where the physical CPU may silently differ)."""
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            return f.read().strip().replace("-", "")[:12]
    except OSError:
        return "noboot"


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Best-effort enablement; returns True when active.

    CPU-backend processes get a boot-salted subdirectory: XLA:CPU entries
    are host-AOT machine code that crosses containers unsafely (see
    ``_host_fingerprint``). TPU entries are device code — host-portable
    and expensive to recompile through the relay — so TPU processes keep
    the stable fingerprint dir and survive container reschedules.
    """
    import jax

    try:
        base = cache_dir or os.environ.get("NFP_TPU_CACHE_DIR", _DEFAULT_DIR)
        leaf = _host_fingerprint()
        if _cpu_backend_selected():
            leaf = f"{leaf}-cpu-{_boot_salt()}"
        path = os.path.join(base, leaf)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
