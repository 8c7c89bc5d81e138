"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (sharding tests) and float64
enabled (accuracy references; TPU itself is float32 — dedicated tests cover
f32 tolerance accounting). Must set env vars before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
