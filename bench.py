"""Benchmark: single-object tracking frequency on one TPU chip.

Measures the fused per-frame tracking step (render prior ROI -> crop
observed frame -> normalize -> Se3TrackNet forward -> se(3) compose) in
steady state over a preloaded synthetic video via ``lax.scan`` — the
deployment path of tracking/tracker.py.

Reference baseline: 90.9 Hz on the paper's GPU (BASELINE.md). North star:
>300 Hz single-object on one TPU core (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_HZ = 90.9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.models import tracknet
    from iros20_6d_pose_tracking_tpu.render import mesh as M
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
    from iros20_6d_pose_tracking_tpu.tracking import tracker as trk

    log(f"devices: {jax.devices()}")

    res = 176
    # Flagship mesh: subdiv-4 icosphere (5120 faces / 2562 verts), a
    # realistic decimated-CAD budget for 176x176 ROI rendering.
    tm = M.make_icosphere(subdiv=4, radius=0.05)
    mesh = rz.upload(tm)
    log(f"mesh: {tm.num_faces} faces (padded {tm.faces.shape[0]})")

    model = tracknet.Se3TrackNet(image_size=res)
    variables = tracknet.init_variables(model, jax.random.PRNGKey(0))
    cfg = trk.TrackerConfig(
        resolution=res, object_width_mm=tm.diameter * 1000 * 1.1,
        render_impl="pallas",
    )
    K = jnp.array(
        [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]],
        jnp.float32,
    )
    mean = jnp.zeros(8)
    std = jnp.full(8, 100.0)

    # Synthetic observed video: the object rendered full-frame at a fixed
    # pose (contents don't affect timing; shapes/dtypes match deployment).
    pose = jnp.eye(4).at[2, 3].set(0.6)
    rgb_f, depth_f = rz.render(
        mesh, pose, K, rz.full_frame_window(640, 480), out_hw=(480, 640)
    )
    T = 100
    frames_rgb = jnp.broadcast_to(rgb_f, (T,) + rgb_f.shape)
    frames_depth = jnp.broadcast_to(depth_f, (T,) + depth_f.shape)

    run = lambda: trk.track_video(
        model, cfg, variables, mesh, K, mean, std, pose,
        frames_rgb, frames_depth,
    )

    t0 = time.perf_counter()
    np.asarray(run())  # D2H fetch: block_until_ready is unreliable on the
    compile_and_first = time.perf_counter() - t0  # tunneled axon backend
    log(f"first call (compile + {T} frames): {compile_and_first:.2f}s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run())
        times.append(time.perf_counter() - t0)
    per_frame = min(times) / T
    hz = 1.0 / per_frame
    log(f"steady-state: {per_frame * 1e3:.3f} ms/frame = {hz:.1f} Hz "
        f"(runs: {[f'{t:.3f}' for t in times]})")

    # Host-loop mode (per-frame call with H2D upload) for reference.
    rgb_np = np.asarray(rgb_f)
    depth_np = np.asarray(depth_f)
    pose_np = np.asarray(pose)
    step = lambda: trk.track_step(
        model, cfg, variables, mesh, K, mean, std,
        jnp.asarray(pose_np), jnp.asarray(rgb_np), jnp.asarray(depth_np),
    )
    np.asarray(step()[0])
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        out2 = step()
    np.asarray(out2[0])
    host_hz = n / (time.perf_counter() - t0)
    log(f"host-loop mode: {host_hz:.1f} Hz (incl. per-frame H2D upload)")

    print(json.dumps({
        "metric": "tracking_hz_single_object",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / BASELINE_HZ, 3),
    }))


if __name__ == "__main__":
    main()
