"""Test configuration: run everything on a virtual 8-device CPU backend.

This is the standard JAX fake-backend trick for exercising pjit/sharding and
Pallas (interpret mode) without TPU hardware. Must run before jax is imported
anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the env presets axon/TPU; tests are CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU plugin at interpreter start and
# env vars alone no longer win; the config update does (backends are not yet
# initialized at import time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: Read-only mount of the PyTorch reference implementation; tests import its
#: modules (torch CPU) to generate golden outputs for parity checks.
REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
