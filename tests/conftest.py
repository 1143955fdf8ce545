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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The CPU backend hard-aborts the whole process when a collective
# rendezvous takes >40 s (default xla_cpu_collective_call_terminate_
# timeout_seconds=40). On a contended 1-core host the 8 virtual devices'
# threads can legitimately take longer to all arrive — raise the
# termination timeouts so slowness degrades to a warning, not an abort.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=600"
if "xla_cpu_collective_timeout_seconds" not in flags:
    flags += " --xla_cpu_collective_timeout_seconds=600"
os.environ["XLA_FLAGS"] = flags

# On low-core machines the PJRT CPU client sizes its worker pool from
# nproc; with 1 worker, one virtual device's in-process collective blocks
# the only thread and the other participants never run — XLA hard-aborts
# the rendezvous after 40 s. PJRT_NPROC overrides the pool size so every
# virtual device can make progress concurrently.
if int(os.environ.get("PJRT_NPROC", "0") or 0) < 16:
    os.environ["PJRT_NPROC"] = "16"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (fingerprinted like __graft_entry__.py:
# XLA:CPU AOT entries embed host ISA features, so a different machine
# must cold-compile rather than load foreign binaries). Cuts repeat
# suite runs from minutes of XLA compile to cache replay.
try:
    import hashlib

    with open("/proc/cpuinfo") as _f:
        _flags = next((ln for ln in _f if ln.startswith("flags")), "")
    _fp = hashlib.sha1(_flags.encode()).hexdigest()[:12]
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".xla_cache", _fp),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
