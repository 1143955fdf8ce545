"""Isolate the stream-CLI slowdown: decode-thread contention vs tracker
construction. Pre-decodes all frames, then times a pure push loop using
the same Tracker.from_parts the CLI builds."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench as B

    b = B.build()
    from iros20_6d_pose_tracking_tpu.tracking.tracker import Tracker
    from iros20_6d_pose_tracking_tpu.tracking.stream import StreamTracker

    t = Tracker.from_parts(b.model, b.cfg, b.variables, b.mesh, b.K,
                           b.mean, b.std)
    pose0 = np.asarray(b.pose)
    n = 120

    def run(tag):
        s = StreamTracker(t)
        s.begin(pose0)
        t0 = time.perf_counter()
        for _ in range(n):
            s.push(b.rgb_u8, b.depth_u16)
        mid = time.perf_counter()
        _ = s.current_pose()
        end = time.perf_counter()
        print(f"[{tag}] push {(mid-t0)*1e3/n:.2f} ms/f, "
              f"drain {end-mid:.2f}s, total {n/(end-t0):.1f} Hz, "
              f"stats {s.stats()}", flush=True)

    run("warm")
    run("steady-1")
    run("steady-2")


if __name__ == "__main__":
    main()
