"""Test config: force an 8-device virtual CPU mesh.

Tests must be hermetic and runnable without TPU hardware; multi-chip
sharding tests use the virtual host devices. Note: this environment's
sitecustomize force-registers a TPU ('axon') backend ignoring the
JAX_PLATFORMS env var, so we must override via jax.config after import.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
