"""Synthetic data generation CLI.

Two modes mirroring the reference's two-stage pipeline
(reference blender_main.py + produce_train_pair_data.py):

  --mode dr        fully in-framework: domain-randomized scenes rendered
                   by the TPU rasterizer -> perturbation pairs -> the
                   reference's train/val folder layout (no Blender).
  --mode blender   consume an existing Blender ``generated_data/`` folder
                   (the reference's stage 1 output) and produce pairs —
                   parity with produce_train_pair_data.py completeBlender.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    import yaml

    from ..datagen import pair_producer as pp
    from ..render import mesh as mesh_mod
    from ..render import rasterizer as rz
    from ..core.camera import Camera

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mode", choices=["dr", "blender"], default="dr")
    parser.add_argument("--dataset_info", required=True)
    parser.add_argument("--out_root", required=True)
    parser.add_argument("--generated_dir", default=None,
                        help="Blender stage-1 output (--mode blender)")
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--train_samples", type=int, default=None)
    parser.add_argument("--val_samples", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    with open(args.dataset_info) as f:
        dataset_info = yaml.safe_load(f)
    model_path = args.model_path or dataset_info["models"][0]["model_path"]
    tm = mesh_mod.load_mesh(model_path)
    mesh = rz.upload(tm)

    if "object_width" not in dataset_info:
        width = mesh_mod.compute_obj_max_width(tm.verts)
        pad = dataset_info.get("boundingbox", 0)
        dataset_info["object_width"] = float(width * (1 + pad / 100.0))
        print("object_width =", dataset_info["object_width"])
        os.makedirs(args.out_root, exist_ok=True)
        with open(os.path.join(args.out_root, "dataset_info.yml"), "w") as f:
            yaml.dump(dataset_info, f)

    if args.mode == "blender":
        assert args.generated_dir, "--mode blender needs --generated_dir"
        train_dir, val_dir = pp.complete_blender(
            args.generated_dir, args.out_root, dataset_info, mesh=mesh,
            seed=args.seed,
        )
    else:
        cam = Camera.from_dict(dataset_info["camera"])
        cfg = pp.ProducerConfig(
            resolution=int(dataset_info["resolution"]),
            object_width_mm=float(dataset_info["object_width"]),
            max_translation=float(dataset_info["max_translation"]),
            max_rotation_deg=float(dataset_info["max_rotation"]),
            width=cam.width, height=cam.height,
        )
        blender_cfg = dataset_info.get("blender", {})
        xyz_range = (
            tuple(blender_cfg.get("range_x", (-0.2, 0.2))),
            tuple(blender_cfg.get("range_y", (-0.15, 0.15))),
            tuple(blender_cfg.get("range_z", (0.4, 0.9))),
        )
        train_dir, val_dir = pp.produce_dataset(
            mesh, cam.K, args.out_root, cfg,
            train_samples=args.train_samples or int(dataset_info["train_samples"]),
            val_samples=args.val_samples or int(dataset_info["val_samples"]),
            xyz_range=xyz_range, seed=args.seed,
        )
    print("train pairs:", train_dir)
    print("val pairs:", val_dir)


if __name__ == "__main__":
    main()
