"""Instrument the stream-CLI path: where do the ms/frame go?

Breaks bench_stream_cli into: chunk decode wait, push wall, pose drain.
"""
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench as B

    b = B.build()
    import tempfile

    from PIL import Image

    from iros20_6d_pose_tracking_tpu.apps import predict as P
    from iros20_6d_pose_tracking_tpu.tracking.tracker import Tracker
    from iros20_6d_pose_tracking_tpu.tracking.stream import StreamTracker

    n = 120
    tmp = tempfile.mkdtemp(prefix="prof_cli_")
    rgb_files, depth_files = [], []
    Image.fromarray(b.rgb_u8).save(os.path.join(tmp, "r.png"))
    Image.fromarray(b.depth_u16.astype(np.int32), mode="I").save(
        os.path.join(tmp, "d.png"))
    for i in range(n):
        rp = os.path.join(tmp, f"{i:05d}rgb.png")
        dp = os.path.join(tmp, f"{i:05d}depth.png")
        os.link(os.path.join(tmp, "r.png"), rp)
        os.link(os.path.join(tmp, "d.png"), dp)
        rgb_files.append(rp)
        depth_files.append(dp)

    t = Tracker.from_parts(b.model, b.cfg, b.variables, b.mesh, b.K,
                           b.mean, b.std)
    pose0 = np.asarray(b.pose)

    import concurrent.futures as cf

    def run(tag):
        s = StreamTracker(t)
        s.begin(pose0)
        chunk = 16
        get_rgb = P._batch_src(rgb_files, "rgb")
        get_depth = P._batch_src(depth_files, "depth")

        def load(a, bb):
            return get_rgb(a, bb), get_depth(a, bb).astype(np.uint16)

        wait_s = push_s = 0.0
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(1) as ex:
            fut = ex.submit(load, 1, min(1 + chunk, n))
            for a in range(1, n, chunk):
                bb = min(a + chunk, n)
                tw = time.perf_counter()
                rgb_c, dep_c = fut.result()
                wait_s += time.perf_counter() - tw
                if bb < n:
                    fut = ex.submit(load, bb, min(bb + chunk, n))
                tp = time.perf_counter()
                for j in range(bb - a):
                    s.push(rgb_c[j], dep_c[j])
                push_s += time.perf_counter() - tp
        td = time.perf_counter()
        _ = s.current_pose()
        drain = time.perf_counter() - td
        total = time.perf_counter() - t0
        print(f"[{tag}] total {total:.2f}s = {(n-1)/total:.1f} Hz | "
              f"decode-wait {wait_s*1e3/(n-1):.2f} ms/f, "
              f"push {push_s*1e3/(n-1):.2f} ms/f, drain {drain:.2f}s, "
              f"stats {s.stats()}", flush=True)

    run("warm-compile")   # first run: includes compiles
    run("steady-1")
    run("steady-2")


if __name__ == "__main__":
    main()
