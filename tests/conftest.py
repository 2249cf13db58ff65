"""Test configuration: run everything on a virtual 8-device CPU backend.

This is the standard JAX fake-backend trick for exercising pjit/sharding and
Pallas (interpret mode) without TPU hardware. Must run before jax is imported
anywhere.
"""

import os
import sys

import pytest

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


# ------------------------------------------- order-independence hardening
# Round 4 reproduced an XLA:CPU compiler segfault (backend_compile_and_load)
# building the suite's first big shard_map/ppermute program with ~500 tests'
# compiled executables resident. The mitigation (jax.clear_caches() before
# the module's compiles, commit 68e1c34) lived in test_pp only — position-
# dependent: under a different module order any shard_map-compiling module
# could be the victim. Generalized here: caches are dropped at the START of
# every module that compiles shard_map/mesh programs, bounding resident-
# executable count at each risky compile point regardless of order.

SHARD_HEAVY_MODULES = {
    "test_cli",          # sharded/pipeline CLI e2e
    "test_data",         # device-resident split placement
    "test_pp",           # the original crash site (GPipe ppermute)
    "test_seed_parallel",
    "test_sharding",
    "test_tp",
    "test_zero",
}


@pytest.fixture(scope="module", autouse=True)
def _fresh_caches_before_shard_heavy(request):
    if request.module.__name__ in SHARD_HEAVY_MODULES:
        jax.clear_caches()
    yield


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.module.__name__ in QUICK_MODULES:
            item.add_marker(_pytest.mark.quick)

    # NFP_TEST_SHUFFLE=<seed>: randomize MODULE order (within-module order
    # is preserved — tests in a module may share module-scoped fixtures
    # whose cost assumes one setup per module). Used to prove the suite is
    # order-independent (round-4 VERDICT #3); the seed is printed so a
    # failing order can be replayed.
    seed = os.environ.get("NFP_TEST_SHUFFLE")
    if seed:
        import random

        modules = []
        by_module = {}
        for item in items:
            name = item.module.__name__
            if name not in by_module:
                by_module[name] = []
                modules.append(name)
            by_module[name].append(item)
        random.Random(int(seed)).shuffle(modules)
        items[:] = [it for name in modules for it in by_module[name]]
        print(f"\n[conftest] NFP_TEST_SHUFFLE={seed}: module order = "
              f"{', '.join(modules)}")
