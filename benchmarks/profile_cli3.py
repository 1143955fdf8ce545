"""A/B the StreamTracker push loop: SimpleNamespace tracker (bench row)
vs Tracker.from_parts (CLI path), interleaved in one process so tunnel
variance can't masquerade as a code difference."""
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench as B

    b = B.build()
    from iros20_6d_pose_tracking_tpu.tracking.tracker import Tracker
    from iros20_6d_pose_tracking_tpu.tracking.stream import StreamTracker

    ns = types.SimpleNamespace(model=b.model, cfg=b.cfg,
                               variables=b.variables, mesh=b.mesh, K=b.K,
                               mean=b.mean, std=b.std)
    fp = Tracker.from_parts(b.model, b.cfg, b.variables, b.mesh, b.K,
                            b.mean, b.std)
    pose0 = np.asarray(b.pose)
    n = 120

    def run(tag, t):
        s = StreamTracker(t)
        s.begin(pose0, image_hw=b.rgb_u8.shape[:2])
        t0 = time.perf_counter()
        for _ in range(n):
            s.push(b.rgb_u8, b.depth_u16)
        mid = time.perf_counter()
        _ = s.current_pose()
        end = time.perf_counter()
        print(f"[{tag}] push {(mid-t0)*1e3/n:.2f} ms/f, "
              f"drain {end-mid:.2f}s, total {n/(end-t0):.1f} Hz",
              flush=True)

    run("ns-warm", ns)
    run("fp-warm", fp)
    for i in range(3):
        run(f"ns-{i}", ns)
        run(f"fp-{i}", fp)


if __name__ == "__main__":
    main()
