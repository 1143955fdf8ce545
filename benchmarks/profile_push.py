"""Profile the StreamTracker push path on the bench host.

Breaks the live per-frame loop into its host-side components so a
below-baseline Hz number is attributable (VERDICT r3 next-step #2):
window slice+pack memcpy, offset lookup, dispatch, background-fetch
interference. Prints a per-component ms/frame table to stderr and a
JSON summary to stdout.
"""
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B

    b = B.build()
    from iros20_6d_pose_tracking_tpu.tracking.stream import (
        StreamTracker, pack_window)

    t = types.SimpleNamespace(
        model=b.model, cfg=b.cfg, variables=b.variables, mesh=b.mesh,
        K=b.K, mean=b.mean, std=b.std,
    )
    s = StreamTracker(t, window=True)
    s.begin(np.asarray(b.pose), image_hw=b.rgb_u8.shape[:2])
    s.push(b.rgb_u8, b.depth_u16)  # compile
    _ = s.current_pose()

    n = 300
    res = {"host_cpu_cores": os.cpu_count() or 1}

    # 1. Full push loop (the bench row).
    s.begin(np.asarray(b.pose), image_hw=b.rgb_u8.shape[:2])
    t0 = time.perf_counter()
    for _ in range(n):
        s.push(b.rgb_u8, b.depth_u16)
    _ = s.current_pose()
    res["full_push_ms"] = (time.perf_counter() - t0) / n * 1e3

    # 2. Host-only slice+pack cost (no dispatch).
    side = s._bucket(s._side_px)
    top, left = 80, 160
    t0 = time.perf_counter()
    for _ in range(n):
        packed = pack_window(
            np.ascontiguousarray(b.rgb_u8[top:top+side, left:left+side]),
            np.ascontiguousarray(b.depth_u16[top:top+side, left:left+side]))
    res["slice_pack_ms"] = (time.perf_counter() - t0) / n * 1e3

    # 3. Dispatch-only: pre-packed host buffer, same jitted step.
    fn = s._get_step(side)
    off = s._offset_dev(top, left)
    pose = s._pose_dev
    t0 = time.perf_counter()
    for _ in range(n):
        pose = fn(pose, packed, off)
    np.asarray(pose)
    res["prepacked_dispatch_ms"] = (time.perf_counter() - t0) / n * 1e3

    # 4. Dispatch with device-resident frame (no H2D at all).
    packed_dev = jax.device_put(packed)
    pose = s._pose_dev
    t0 = time.perf_counter()
    for _ in range(n):
        pose = fn(pose, packed_dev, off)
    np.asarray(pose)
    res["device_resident_dispatch_ms"] = (time.perf_counter() - t0) / n * 1e3

    # 5. Pure H2D: device_put of the packed buffer alone.
    t0 = time.perf_counter()
    for _ in range(n):
        jax.device_put(packed).block_until_ready()
    res["h2d_blocking_ms"] = (time.perf_counter() - t0) / n * 1e3

    # 6. Push loop without the background fetch thread (refetch off).
    s2 = StreamTracker(t, window=True, refetch_every=10**9)
    s2.begin(np.asarray(b.pose), image_hw=b.rgb_u8.shape[:2])
    s2.push(b.rgb_u8, b.depth_u16)
    _ = s2.current_pose()
    s2.begin(np.asarray(b.pose), image_hw=b.rgb_u8.shape[:2])
    t0 = time.perf_counter()
    for _ in range(n):
        s2.push(b.rgb_u8, b.depth_u16)
    _ = s2.current_pose()
    res["push_no_fetch_ms"] = (time.perf_counter() - t0) / n * 1e3

    # 7. Push loop without history retention.
    s3 = StreamTracker(t, window=True, keep_history=False)
    s3.begin(np.asarray(b.pose), image_hw=b.rgb_u8.shape[:2])
    s3.push(b.rgb_u8, b.depth_u16)
    _ = s3.current_pose()
    s3.begin(np.asarray(b.pose), image_hw=b.rgb_u8.shape[:2])
    t0 = time.perf_counter()
    for _ in range(n):
        s3.push(b.rgb_u8, b.depth_u16)
    _ = s3.current_pose()
    res["push_no_history_ms"] = (time.perf_counter() - t0) / n * 1e3

    for k, v in res.items():
        if k.endswith("_ms"):
            print(f"{k:32s} {v:8.3f} ms/frame = {1e3/v:7.1f} Hz",
                  file=sys.stderr)
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
