"""Second-stage push profile: can the H2D window transfer be overlapped
with host pack + dispatch? Tests explicit async device_put vs implicit
arg conversion, and a smaller window bucket."""
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

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
    s.push(b.rgb_u8, b.depth_u16)
    _ = s.current_pose()

    n = 300
    side = s._bucket(s._side_px)
    top, left = 80, 160
    fn = s._get_step(side)
    off = s._offset_dev(top, left)
    res = {"side": side}

    def timed(name, loop):
        pose = s._pose_dev
        loop(pose, 10)  # warm
        t0 = time.perf_counter()
        p = loop(pose, n)
        np.asarray(p)
        ms = (time.perf_counter() - t0) / n * 1e3
        res[name] = round(ms, 3)
        print(f"{name:36s} {ms:8.3f} ms = {1e3/ms:7.1f} Hz",
              file=sys.stderr, flush=True)

    def loop_implicit(pose, k):
        for _ in range(k):
            packed = pack_window(
                np.ascontiguousarray(b.rgb_u8[top:top+side, left:left+side]),
                np.ascontiguousarray(b.depth_u16[top:top+side, left:left+side]))
            pose = fn(pose, packed, off)
        return pose

    def loop_explicit_put(pose, k):
        for _ in range(k):
            packed = pack_window(
                np.ascontiguousarray(b.rgb_u8[top:top+side, left:left+side]),
                np.ascontiguousarray(b.depth_u16[top:top+side, left:left+side]))
            dev = jax.device_put(packed)
            pose = fn(pose, dev, off)
        return pose

    def loop_put_ahead(pose, k):
        # double-buffer: start frame i+1's transfer before dispatching i
        packed = pack_window(
            np.ascontiguousarray(b.rgb_u8[top:top+side, left:left+side]),
            np.ascontiguousarray(b.depth_u16[top:top+side, left:left+side]))
        dev = jax.device_put(packed)
        for _ in range(k):
            packed = pack_window(
                np.ascontiguousarray(b.rgb_u8[top:top+side, left:left+side]),
                np.ascontiguousarray(b.depth_u16[top:top+side, left:left+side]))
            nxt = jax.device_put(packed)
            pose = fn(pose, dev, off)
            dev = nxt
        return pose

    timed("implicit_arg_h2d", loop_implicit)
    timed("explicit_device_put", loop_explicit_put)
    timed("device_put_one_ahead", loop_put_ahead)

    # pure h2d, non-blocking queue drain rate
    packed = pack_window(
        np.ascontiguousarray(b.rgb_u8[top:top+side, left:left+side]),
        np.ascontiguousarray(b.depth_u16[top:top+side, left:left+side]))
    devs = []
    t0 = time.perf_counter()
    for _ in range(n):
        devs.append(jax.device_put(packed))
    for d in devs:
        d.block_until_ready()
    ms = (time.perf_counter() - t0) / n * 1e3
    res["h2d_pipelined"] = round(ms, 3)
    print(f"{'h2d_pipelined':36s} {ms:8.3f} ms = {1e3/ms:7.1f} Hz",
          file=sys.stderr, flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
