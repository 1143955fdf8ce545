"""Profiling & observability hooks.

The reference has none (SURVEY.md section 5: unused ``time`` imports and
prints only). Here:

  - :class:`StepTimer` — honest device-step timing. On the tunneled TPU
    backend ``block_until_ready`` can return before execution completes,
    so completion is forced with a tiny D2H fetch.
  - :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-readable trace directory.
  - :class:`MetricsLogger` — JSONL metrics sink (step, loss, Hz, ...)
    usable from the trainer's ``log_fn``.
"""
from __future__ import annotations

import contextlib
import json
import os
import time

import numpy as np


class StepTimer:
    """Measure steady-state per-iteration time of a device computation."""

    def __init__(self, warmup: int = 1, reps: int = 3):
        self.warmup = warmup
        self.reps = reps

    def measure(self, fn, *args, iters_per_call: int = 1) -> dict:
        """fn(*args) -> a jax array (or pytree); returns timing stats."""
        import jax

        def run():
            out = fn(*args)
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf)  # force completion (tunnel-safe)
            return out

        for _ in range(self.warmup):
            run()
        times = []
        for _ in range(self.reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        per_iter = min(times) / iters_per_call
        return {
            "best_s": min(times),
            "mean_s": float(np.mean(times)),
            "per_iter_ms": per_iter * 1e3,
            "hz": 1.0 / per_iter,
        }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (TensorBoard 'profile' plugin format)."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only JSONL metrics file + stdout echo."""

    def __init__(self, path: str, echo: bool = True):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self.echo = echo
        self._f = open(path, "a")

    def log(self, **kv):
        kv.setdefault("t", time.time())
        self._f.write(json.dumps(kv, default=float) + "\n")
        self._f.flush()
        if self.echo:
            print(" ".join(f"{k}={v}" for k, v in kv.items() if k != "t"),
                  flush=True)

    def __call__(self, msg):
        """Trainer log_fn compatibility (accepts plain strings)."""
        self.log(msg=str(msg))

    def close(self):
        self._f.close()
