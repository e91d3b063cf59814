"""Test configuration: force CPU with 8 virtual devices.

Multi-chip logic is tested on a virtual CPU mesh
(SURVEY §4 "Multi-chip without a cluster"); this must run before any
`import jax` in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
