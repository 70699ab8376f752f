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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _jax_memory_guard():
    """Per-module RSS log + a high-water cache drop (diagnosis aid for the
    full-suite XLA segfault, see NEXT.md).

    The full single-process suite reproducibly segfaults inside XLA's CPU
    compile (backend_compile_and_load) at test_tracking's first compile —
    three times at the exact same position, once inside a persistent-cache
    read. NOT memory: RSS measured 6.6 GB at the crash (this fixture's
    log), and every subset tried — the module alone, lens+e2e+tracking,
    parallel+tracking, cache-enabled standalone repro — passes. The
    trigger is some accumulated in-process XLA state; bisection notes in
    NEXT.md. The RSS log (CAMKIFU_RSS_LOG=path) and the >20 GB
    clear_caches() stay as cheap instrumentation/insurance, not as the
    fix.
    """
    yield
    with open("/proc/self/statm") as f:
        rss_gb = int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e9
    log = os.environ.get("CAMKIFU_RSS_LOG")
    if log:
        with open(log, "a") as f:
            f.write(f"{rss_gb:.2f}\n")
    if rss_gb > 20.0:
        jax.clear_caches()
