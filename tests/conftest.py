"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so sharding / collective paths can
be exercised without TPU hardware. Must run before jax initializes a backend.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
