"""Single-chip SP datapoint (VERDICT r4 stretch #8).

parallel/latency.py's face-sharded render is correctness-pinned on the
virtual 8-device CPU mesh but had zero hardware numbers. Only one real
chip exists here, so the one measurable datapoint is the 1-shard
overhead: `sharded_render` on an sp=(1,) mesh vs the plain `render()` —
i.e. what the shard_map plumbing (full-ROI z-buffer merge layout, the
degenerate collectives, the padded face soup) costs before any
parallelism pays it back. A small 1-shard overhead means the SP design's
break-even point on a real multi-chip ICI pod is low.

Writes benchmarks/degradation_runs/sp_datapoint_<stamp>.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main(res=176, reps=30):
    import jax
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.ops import roi as roi_ops
    from iros20_6d_pose_tracking_tpu.parallel import latency as L
    from iros20_6d_pose_tracking_tpu.render import mesh as M
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
    from iros20_6d_pose_tracking_tpu.utils.cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    out = {"stamp": time.strftime("%Y%m%d_%H%M%S")}
    probe_ms, _ = bench.device_probe()
    out["probe_ms"] = probe_ms

    tm_full = M.make_icosphere(subdiv=4, radius=0.05)
    tm = M.build_trimesh(*M.decimate(
        tm_full.verts, tm_full.faces[: tm_full.num_faces], tm_full.colors,
        2048))
    mesh = rz.upload(tm)
    K = jnp.asarray([[1066.778, 0, 312.9869], [0, 1067.487, 241.3109],
                     [0, 0, 1]], jnp.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 0.6
    pose_j = jnp.asarray(pose)
    from iros20_6d_pose_tracking_tpu.tracking.tracker import TrackerConfig

    impl = "xla" if os.environ.get("BENCH_FORCE_CPU") else "pallas"
    cfg = TrackerConfig(resolution=res,
                        object_width_mm=tm.diameter * 1000 * 1.1,
                        render_impl=impl)
    bbox = roi_ops.compute_bbox(pose_j, K, cfg.object_width_mm,
                                (1000.0, 1000.0, 1000.0))
    window = rz.window_from_bbox(bbox)

    # plain single-chip render (the production impl on this backend)
    @jax.jit
    def plain(p):
        rgb, dep = rz.render(mesh, p, K, window, out_hw=(res, res),
                             impl=impl)
        return dep[0, 0] + rgb[0, 0, 0]

    np.asarray(plain(pose_j))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = plain(pose_j)
    np.asarray(r)
    out["plain_render_ms"] = round(
        (time.perf_counter() - t0) / reps * 1e3, 3)
    bench.log(f"plain render: {out['plain_render_ms']} ms")

    # 1-shard sharded render: same math through shard_map + collectives
    spm = L.sp_mesh(1)
    smesh = L.shard_mesh_faces(mesh, spm)
    srender = L.sharded_render(cfg, spm)

    @jax.jit
    def sp1(p):
        bbox = roi_ops.compute_bbox(p, K, cfg.object_width_mm,
                                    (1000.0, 1000.0, 1000.0))
        rgb, dep = srender(smesh.fverts, smesh.fcolors, smesh.fnormals,
                           smesh.fmask, p, K, bbox)
        return dep[0, 0] + rgb[0, 0, 0]

    with spm:
        np.asarray(sp1(pose_j))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = sp1(pose_j)
        np.asarray(r)
    out["sp1_render_ms"] = round(
        (time.perf_counter() - t0) / reps * 1e3, 3)
    out["sp1_overhead_pct"] = round(
        100 * (out["sp1_render_ms"] / out["plain_render_ms"] - 1), 1)
    bench.log(f"sp=(1,) sharded render: {out['sp1_render_ms']} ms "
              f"({out['sp1_overhead_pct']:+.1f}% vs plain) — the "
              f"shard_map/merge plumbing cost a real pod must amortize")
    probe_ms2, _ = bench.device_probe()
    out["probe_end_ms"] = probe_ms2
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "degradation_runs")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"sp_datapoint_{out['stamp']}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    bench.log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
