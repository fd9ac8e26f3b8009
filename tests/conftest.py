"""Test configuration: force JAX onto a virtual 8-device CPU backend.

This is the JAX fake-backend trick (SURVEY.md §4d): multi-chip sharding
logic is exercised on CPU with xla_force_host_platform_device_count=8 so
tests never need TPU hardware.

Note: this environment's sitecustomize registers a TPU ("axon") PJRT plugin
and force-sets jax_platforms, so the JAX_PLATFORMS env var alone is NOT
enough — we must override via jax.config before any backend initializes.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


def pytest_collection_modifyitems(config, items):
    """Run the multi-process distributed smoke FIRST.

    test_multihost spawns 2 real processes that must exchange gloo
    heartbeats; on this 1-core host it is the test most sensitive to
    machine load, and it flaked mid-suite in r3 (passed alone).  Running
    it before the long CPU-heavy tests gives it the coldest machine the
    suite can offer (the widened heartbeat budget in the test handles the
    rest).
    """
    items.sort(key=lambda it: 0 if "test_multihost" in it.nodeid else 1)
