"""Characterize the degraded-hour scan collapse (VERDICT r4 next-step #1).

The r4 record showed the fused 100-frame tracking scan collapsing ~7x
(727.9 -> 95.5 Hz) on a degraded shared-device hour while the per-frame
host loop (240 Hz incl. H2D) and training (4007 samples/s) were
untouched. Correlation was established (device_probe_ms high -> scan
slow); this experiment establishes the MECHANISM by sweeping the two
axes the hypothesis space splits on:

  1. **Dispatched-program length**: the SAME fused step run as programs
     of T in {1, 4, 8, 32, 100} frames per dispatch — using the
     product's closure-jitted programs (tracking/dispatch.py::
     AdaptiveVideoTracker._get_fn: weights/mesh lifted into the
     executable, calls pass only pose/buffer/chunk/index), so the curve
     measures device+tunnel behavior, not per-call pytree flattening.
     If degradation multiplies per-PROGRAM overhead (queueing between
     dispatches), short programs collapse hardest; if it multiplies
     per-ITERATION cost inside a program (timeslicing at loop
     boundaries), long programs collapse hardest and the curve inverts.
  2. **Kernel composition** at fixed T=100: raster-only scan (the
     Pallas pass-1/2 pipeline, no CNN), CNN-only scan (conv stack on a
     fixed ROI pair, no raster), and the full step. Whichever component
     carries the collapse names the contended unit (VPU/Pallas vs
     MXU/conv).

Brackets everything with the fixed-work MXU device probe so the hour
classifies itself. Writes one JSON to
benchmarks/degradation_runs/<stamp>.json and prints it. Safe to re-run
any hour; the interesting samples are degraded ones (probe_ms > ~8).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # reuse build(), device_probe(), logging


def _scan_curve(b, lengths=(1, 4, 8, 32, 100), reps=3, total_min=100):
    """Per-frame ms for the product's closure-jitted tracking program
    at different frames-per-dispatch T. Each sample runs >= total_min
    frames as ceil(total_min/T) back-to-back dispatches over a
    device-resident 100-frame chunk."""
    import jax
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.tracking.dispatch import (
        AdaptiveVideoTracker)
    from iros20_6d_pose_tracking_tpu.tracking.tracker import Tracker

    t = Tracker.from_parts(b.model, b.cfg, b.variables, b.mesh, b.K,
                           b.mean, b.std)
    d = AdaptiveVideoTracker(t, candidates=lengths)
    L = 100
    rgb_dev = jnp.asarray(np.broadcast_to(b.rgb_u8, (L,) + b.rgb_u8.shape))
    dep_dev = jnp.asarray(
        np.broadcast_to(b.depth_u16, (L,) + b.depth_u16.shape))
    buf = jnp.zeros((L, 4, 4), jnp.float32)
    pose0 = jnp.asarray(b.pose, jnp.float32)

    out = {}
    for T in lengths:
        n_disp = max(1, int(np.ceil(total_min / T)))

        def run():
            pose, bb = pose0, buf
            for k in range(n_disp):
                a = (k * T) % L
                pose, bb = d._run_scan(pose, bb, None, rgb_dev, dep_dev,
                                       a, a + T, T)[:2] if T > 1 else \
                    d._run_per_frame(pose, bb, None, rgb_dev, dep_dev,
                                     a, a + 1, 0)[:2]
            np.asarray(pose)

        t0 = time.perf_counter()
        run()  # compile
        bench.log(f"scan[T={T}] compile+first: "
                  f"{time.perf_counter() - t0:.2f}s")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        # NOTE: for T=1 each "dispatch" above runs ONE frame, so frames
        # per sample = n_disp * (T if T > 1 else 1)
        frames = n_disp * (T if T > 1 else 1)
        per_frame_ms = min(times) / frames * 1e3
        out[str(T)] = round(per_frame_ms, 3)
        bench.log(f"scan[T={T}] {n_disp} dispatches ({frames} frames): "
                  f"{per_frame_ms:.3f} ms/frame = "
                  f"{1e3 / per_frame_ms:.1f} Hz")
    return out


def _composition(b, T=100, reps=3):
    """Raster-only vs CNN-only vs full scan at T frames/dispatch, all
    closure-jitted (constants lifted; one dispatch per sample run)."""
    import jax
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.ops import roi as roi_ops
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
    from iros20_6d_pose_tracking_tpu.tracking import tracker as trk

    cfg = b.cfg
    res = (cfg.resolution, cfg.resolution)
    Kd = jnp.asarray(b.K, jnp.float32)
    mesh = b.mesh
    model, variables = b.model, b.variables
    pose_c = jnp.asarray(b.pose, jnp.float32)

    # raster-only: render the prior ROI per frame, carry a scalar.
    @jax.jit
    def raster_scan(seeds):
        def step(carry, seed):
            bbox = roi_ops.compute_bbox(pose_c, Kd, cfg.object_width_mm,
                                        (1000.0, 1000.0, 1000.0))
            _, d = rz.render(mesh, pose_c, Kd, rz.window_from_bbox(bbox),
                             out_hw=res, near=cfg.near, far=cfg.far,
                             impl=cfg.render_impl,
                             cull_backfaces=cfg.cull_backfaces)
            return carry + d[0, 0] + seed * 0.0, ()

        c, _ = trk.frame_scan(step, jnp.float32(0.0), seeds)
        return c

    # CNN-only: the two-branch forward on a fixed normalized pair.
    bufA = jnp.zeros((1,) + res + (4,), jnp.float32)

    @jax.jit
    def cnn_scan(seeds):
        def step(carry, seed):
            out = model.apply(variables, bufA + carry, bufA, train=False)
            return out["trans"][0, 0] + seed * 0.0, ()

        c, _ = trk.frame_scan(step, jnp.float32(0.0), seeds)
        return c

    seeds = jnp.arange(T, dtype=jnp.float32)
    rows = {}
    for name, fn in (("raster_only", raster_scan), ("cnn_only", cnn_scan)):
        t0 = time.perf_counter()
        np.asarray(fn(seeds))
        bench.log(f"{name} compile+first: {time.perf_counter() - t0:.2f}s")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(seeds))
            times.append(time.perf_counter() - t0)
        ms = min(times) / T * 1e3
        rows[name] = round(ms, 3)
        bench.log(f"{name}[T={T}]: {ms:.3f} ms/frame")
    return rows


def main():
    out = {"stamp": time.strftime("%Y%m%d_%H%M%S")}
    b = bench.build()
    probe_ms, probe_tf = bench.device_probe()
    out["probe_start_ms"] = probe_ms
    out["probe_start_tflops"] = probe_tf
    out["scan_ms_per_frame_by_T"] = _scan_curve(b)
    out["composition_ms_per_frame_T100"] = _composition(b)
    probe_ms2, probe_tf2 = bench.device_probe()
    out["probe_end_ms"] = probe_ms2
    out["probe_end_tflops"] = probe_tf2
    out["degraded_hour"] = bool(max(probe_ms, probe_ms2) > 8.0)
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "degradation_runs")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, out["stamp"] + ".json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    bench.log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
