"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in this environment; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices, and the real-chip bench
path is exercised separately by bench.py.

This must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
