"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so sharding / collective paths can
be exercised without TPU hardware. Must run before jax initializes a backend.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the sandbox presets JAX_PLATFORMS=axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# This environment's JAX defaults matmuls to low precision (TPU-style bf16
# passes) even on CPU; parity tests need true f32 accumulation. jax may already
# be imported by a pytest plugin, so set platform via the config API too (the
# sandbox presets JAX_PLATFORMS=axon at process start).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# The whole suite runs torch and jax in ONE process; batched (broadcast_all)
# scipy matcher callbacks intermittently wedge the single-threaded XLA CPU
# executor in exactly that mixed-runtime condition (see train/matcher.py).
# Pin the conservative path suite-wide; both methods' equivalence is covered
# explicitly in test_train_stack.
os.environ.setdefault("DETRPOSE_SCIPY_VMAP", "sequential")
