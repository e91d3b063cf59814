"""Test configuration: force CPU with 8 virtual devices.

Multi-chip logic is tested on a virtual CPU mesh (SURVEY §4 "Multi-chip
without a cluster").

Environment gotcha: this image's sitecustomize (/root/.axon_site, on
PYTHONPATH) imports jax and initializes the axon TPU backend at
interpreter startup — *before* conftest runs.  Env vars are therefore too
late; we must clear the initialized backends and redirect the platform
via jax.config.  Without this, "CPU" tests silently run on the real TPU
through the tunnel (~10x slower and single-device).
"""

import os
import sys

# Keep anything we spawn from re-registering axon.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is CPU-COMPILE-bound (~3.8 s/test average, mostly XLA/LLVM
# time on tiny programs).  Tests assert correctness, not performance —
# compile at low optimization: measured 28% faster on the heaviest file
# (81.5 s vs 113.3 s, all green).  XLA parses these at first backend
# use, which happens after clear_backends below re-creates the CPU
# client, so setting them here (post-sitecustomize) still takes effect.
if "xla_backend_optimization_level" not in _flags:
    _flags += (" --xla_backend_optimization_level=0"
               " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = _flags
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

import pytest  # noqa: E402

import jax  # noqa: E402
import jax.extend.backend  # noqa: E402

jax.extend.backend.clear_backends()
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # already 8 via XLA_FLAGS if backends weren't pre-initialized
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (the multi-minute quality-"
             "recovery workloads; the fast tier keeps functional "
             "coverage of the same code paths)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
