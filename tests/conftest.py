"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in this environment; sharding tests run
on ``xla_force_host_platform_device_count=8`` CPU devices, and the real-chip
bench path is exercised separately by bench.py.

Note: this machine's sitecustomize force-registers the experimental 'axon'
TPU platform ahead of the JAX_PLATFORMS env var, so env vars alone don't
select CPU — we must override jax.config after import, before first use.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
