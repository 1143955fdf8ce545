"""Persistent XLA compilation cache — deployment warm start.

The tracker's first call pays a multi-second XLA compile (6-16 s measured
on the TPU tunnel, BENCH_r02.json) — for a robot that is blind bring-up
time on EVERY process start. The reference has no analog (its CUDA/torch
kernels are precompiled); the TPU-native fix is jax's persistent
compilation cache: the first process compiles, every later process replays
the serialized executable in well under a second.

Cache entries are keyed by a HARDWARE FINGERPRINT directory:

  - TPU backends: the device kind string (a v5e executable must not load
    on a v4 host).
  - CPU backend: a hash of /proc/cpuinfo flags — XLA:CPU AOT results
    embed host ISA features and load across machines with only a warning
    (risking SIGILL), so a different host gets its own cold cache.

``enable_persistent_cache()`` is idempotent and cheap; Tracker.__init__,
the CLIs (apps/predict.py, apps/predict_ros.py, apps/train.py) and
bench.py call it by default. Opt out with ``JAX_NO_PERSISTENT_CACHE=1``
or by passing ``persistent_cache=False`` to the Tracker.
"""
from __future__ import annotations

import hashlib
import os

_ENABLED_DIR: str | None = None


def _fingerprint() -> str:
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "cpu":
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
            return "cpu-" + hashlib.sha1(flags.encode()).hexdigest()[:12]
        except OSError:
            return "cpu-nocpuinfo"
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = backend
    return hashlib.sha1(f"{backend}-{kind}".encode()).hexdigest()[:12]


def default_cache_root() -> str:
    root = os.environ.get("IROS20_TPU_CACHE_DIR")
    if root:
        return root
    xdg = os.environ.get("XDG_CACHE_HOME",
                         os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(xdg, "iros20_6d_pose_tracking_tpu", "xla")


def enable_persistent_cache(cache_root: str | None = None,
                            min_compile_secs: float = 1.0) -> str | None:
    """Point jax's persistent compilation cache at a fingerprinted
    directory. Returns the directory, or None when disabled/failed.

    Safe to call at any time (compilations after the call are cached);
    repeated calls are no-ops. Honors ``JAX_NO_PERSISTENT_CACHE=1``.
    """
    global _ENABLED_DIR
    if os.environ.get("JAX_NO_PERSISTENT_CACHE", "") not in ("", "0"):
        return None
    if _ENABLED_DIR is not None and cache_root is None:
        return _ENABLED_DIR
    try:
        import jax

        path = os.path.join(cache_root or default_cache_root(),
                            _fingerprint())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        _ENABLED_DIR = path
        return path
    except Exception:
        return None
