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


# --------------------------------------------------------------- quick tier
# ``pytest -m quick`` = a <10-minute signal on this 1-core host (round-3
# VERDICT #4). Selection is whole fast modules, chosen from the measured
# run-B durations report (2026-08-20: the set below sums to ~6.5 min;
# the full suite is ~63 min and stays the merge gate). The tier keeps the
# scientific core's torch-parity coverage (test_nfp_parity,
# test_texture_ops_parity, test_grad_robustness) plus every sub-second
# unit surface; the excluded modules are the training/sharding/serving
# e2e suites whose individual tests run 20-150 s.

QUICK_MODULES = {
    "test_data",
    "test_fuzz_texture_ops",
    "test_grad_robustness",
    "test_heads_extra",
    "test_int8_conv",
    "test_int8_gemm",
    "test_native_augment",
    "test_nfp_parity",
    "test_serve_http",
    "test_texture_ops_parity",
    "test_timm_port",
    "test_torch_init",
    "test_tpu_launcher",
    "test_visualize",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.module.__name__ in QUICK_MODULES:
            item.add_marker(_pytest.mark.quick)
