"""Third-stage push profile: dispatch-worker-thread overlap and
transfer-size scaling of the jit-arg H2D path."""
import json
import os
import queue
import sys
import threading
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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

    def mkpacked():
        return pack_window(
            np.ascontiguousarray(b.rgb_u8[top:top+side, left:left+side]),
            np.ascontiguousarray(b.depth_u16[top:top+side, left:left+side]))

    # A. worker-thread dispatch: main thread packs, worker calls fn.
    def run_threaded(k, qdepth=2):
        q = queue.Queue(maxsize=qdepth)
        pose_box = [s._pose_dev]

        def worker():
            while True:
                item = q.get()
                if item is None:
                    return
                pose_box[0] = fn(pose_box[0], item, off)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        t0 = time.perf_counter()
        for _ in range(k):
            q.put(mkpacked())
        q.put(None)
        th.join()
        np.asarray(pose_box[0])
        return (time.perf_counter() - t0) / k * 1e3

    run_threaded(10)
    ms = run_threaded(n)
    res["threaded_dispatch_ms"] = round(ms, 3)
    print(f"threaded_dispatch    {ms:8.3f} ms = {1e3/ms:7.1f} Hz",
          file=sys.stderr, flush=True)

    # B. transfer scaling: jit-arg H2D rate vs payload size.
    for kside in (128, 192, 256, 320, 448):
        g = jax.jit(lambda x: x.astype(jnp.float32).sum())
        buf = np.zeros((kside, kside, 5), np.uint8)
        r = g(buf)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(100):
            r = g(buf)
        np.asarray(r)
        ms = (time.perf_counter() - t0) / 100 * 1e3
        kb = buf.nbytes / 1024
        res[f"h2d_jitarg_{kside}"] = round(ms, 3)
        print(f"jit-arg {kside}px ({kb:6.0f} KB) {ms:8.3f} ms "
              f"= {kb/ms*1000/1024:6.1f} MB/s", file=sys.stderr, flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
