"""Generate a tiny synthetic YCB-style tree for driving the predict CLI
without any real dataset (the reference expects YCB_Video_Dataset
layouts, reference predict.py:460-472; none are reachable here).

Renders an icosphere video with the framework's own rasterizer and
writes the exact tree `apps/predict.py --mode ycbv` consumes:

  <root>/0048/color/%06d.png          uint8 RGB
  <root>/0048/depth_filled/%06d.png   uint16 mm
  <root>/0048/pose_gt/<class>/%06d.txt
  <root>/object.obj                   CAD model
  <root>/dataset_info.yml             camera/normalizers/resolution
  <root>/mean.npy, std.npy            normalization stats
  <root>/train_data/                  (dataset_info discovery dir)

Usage:
    python examples/make_ycb_fixture.py --root /tmp/ycbfix [--frames 8]
    python -m iros20_6d_pose_tracking_tpu.apps.predict --mode ycbv \
      --seq_id 48 --class_id 4 --ycb_dir /tmp/ycbfix \
      --train_data_path /tmp/ycbfix/train_data --mean_std_path /tmp/ycbfix \
      --model_path /tmp/ycbfix/object.obj --outdir /tmp/out/seq0048
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import yaml


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/ycbfix")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--class_id", type=int, default=4)
    p.add_argument("--seq_id", type=int, default=48)
    p.add_argument("--res", type=int, default=64,
                   help="network crop resolution written to dataset_info")
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from iros20_6d_pose_tracking_tpu.core import se3
    from iros20_6d_pose_tracking_tpu.render import mesh as M
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz

    K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]],
                 np.float32)
    img_w, img_h = 160, 120
    root = args.root
    seq = os.path.join(root, f"{args.seq_id:04d}")
    for d in ("color", "depth_filled", f"pose_gt/{args.class_id}"):
        os.makedirs(os.path.join(seq, d), exist_ok=True)

    tm = M.make_icosphere(subdiv=2, radius=0.05)
    with open(os.path.join(root, "object.obj"), "w") as f:
        for v in tm.verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for fc in tm.faces[: tm.num_faces]:
            f.write(f"f {fc[0] + 1} {fc[1] + 1} {fc[2] + 1}\n")

    mesh = rz.upload(tm)
    for i in range(args.frames):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.004 * i, -0.002 * i, 0.5 + 0.002 * i]
        pose[:3, :3] = np.asarray(
            se3.so3_exp(jnp.array([0.0, 0.03 * i, 0.0])))
        rgb, depth = rz.render(mesh, jnp.array(pose), jnp.array(K),
                               rz.full_frame_window(img_w, img_h),
                               out_hw=(img_h, img_w))
        Image.fromarray(np.asarray(rgb).astype(np.uint8)).save(
            os.path.join(seq, "color", f"{i:06d}.png"))
        Image.fromarray(np.asarray(depth).astype(np.uint16)).save(
            os.path.join(seq, "depth_filled", f"{i:06d}.png"))
        np.savetxt(os.path.join(seq, "pose_gt", str(args.class_id),
                                f"{i:06d}.txt"), pose)

    os.makedirs(os.path.join(root, "train_data"), exist_ok=True)
    info = {
        "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": 80.0,
                   "centerY": 60.0, "width": img_w, "height": img_h},
        "resolution": args.res, "boundingbox": 10,
        "max_translation": 0.02, "max_rotation": 15,
        "train_samples": 8, "val_samples": 4,
        "models": {0: {"model_path": os.path.join(root, "object.obj")}},
    }
    with open(os.path.join(root, "dataset_info.yml"), "w") as f:
        yaml.dump(info, f)
    np.save(os.path.join(root, "mean.npy"), np.zeros(8))
    np.save(os.path.join(root, "std.npy"), np.full(8, 100.0))
    print(f"fixture ready: {root} ({args.frames} frames, "
          f"class {args.class_id}, seq {args.seq_id:04d})")


if __name__ == "__main__":
    main()
