"""datagen/blender_gen.py driven end-to-end under a fake bpy (bpy_stub).

The reference's Blender stage (blender_dataset_generator.py) is only
checkable by running Blender; here the generator script itself is
exercised without it: scene setup, textured room, rigid-body config,
per-frame randomization, render + compositor conversion, and the output
protocol — then datagen/pair_producer.complete_blender ingests the
generated set, closing the loop DR render -> training pairs.
"""
import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

from iros20_6d_pose_tracking_tpu.render import mesh as M

from bpy_stub import make_fake_bpy

CLASS_ID = 0
N_IMAGES = 4


def _write_obj(tm, path):
    with open(path, "w") as f:
        for v in tm.verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for fc in tm.faces[: tm.num_faces]:
            f.write(f"f {fc[0]+1} {fc[1]+1} {fc[2]+1}\n")


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    """Run blender_gen.main() under the fake bpy; return (dir, info)."""
    root = tmp_path_factory.mktemp("blender_dr")
    obj_path = str(root / "object.obj")
    _write_obj(M.make_icosphere(subdiv=2, radius=0.05), obj_path)

    tex_dir = root / "textures"
    tex_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
            tex_dir / f"tex{i}.png")

    info = {
        "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": 80.0,
                   "centerY": 60.0, "width": 160, "height": 120},
        "resolution": 64, "boundingbox": 10,
        "object_width": 110.0,
        "max_translation": 0.02, "max_rotation": 15,
        "train_samples": 3, "val_samples": 1,
        "models": {CLASS_ID: {"model_path": obj_path}},
        "blender": {
            "texture_folder": str(tex_dir),
            "max_lamp_num": 2,
            "env_light_range": [0.3, 2.0],
            "lamp_pos_range": [[-2, 2], [-2, 2], [-2, 0]],
            "lamp_brightness": [0.2, 1.0],
            # keep the object near the optical axis so the full circle
            # lands inside the 160x120 frame
            "range_x": [-0.04, 0.04],
            "range_y": [-0.03, 0.03],
            "range_z": [0.45, 0.75],
        },
    }
    info_path = root / "dataset_info.yml"
    with open(info_path, "w") as f:
        yaml.dump(info, f)

    out_dir = root / "generated_data"
    bpy, mathutils = make_fake_bpy()
    old_argv = sys.argv
    old_modules = {k: sys.modules.get(k) for k in ("bpy", "mathutils")}
    sys.modules["bpy"] = bpy
    sys.modules["mathutils"] = mathutils
    sys.argv = ["blender_gen.py", "--", "--dataset_info", str(info_path),
                "--out_dir", str(out_dir), "--count", str(N_IMAGES),
                "--seed", "0"]
    try:
        from iros20_6d_pose_tracking_tpu.datagen import blender_gen

        blender_gen.main()
    finally:
        sys.argv = old_argv
        for k, v in old_modules.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return str(out_dir), info


def test_output_protocol(generated):
    """%07d{rgb,depth,seg}.png + poses_in_world.npz, reference
    blender_dataset_generator.py:367-384 layout."""
    out_dir, _ = generated
    for i in range(N_IMAGES):
        rgb = np.array(Image.open(os.path.join(out_dir, f"{i:07d}rgb.png")))
        depth = np.array(
            Image.open(os.path.join(out_dir, f"{i:07d}depth.png")))
        seg = np.array(Image.open(os.path.join(out_dir, f"{i:07d}seg.png")))
        assert rgb.shape == (120, 160, 3)
        assert depth.shape == (120, 160) and depth.dtype == np.uint16
        assert seg.shape == (120, 160) and seg.dtype == np.uint8

        meta = np.load(os.path.join(out_dir, f"{i:07d}poses_in_world.npz"))
        assert set(meta.files) >= {"class_ids", "poses_in_world",
                                   "blendercam_in_world"}
        assert meta["class_ids"].tolist() == [CLASS_ID]
        assert meta["poses_in_world"].shape == (1, 4, 4)


def test_seg_class_id_convention(generated):
    """Seg pixels carry the class id itself (background 255): pass_index
    is class_id+1 inside Blender (IndexOB background is 0) and the
    conversion decodes the shift, so complete_blender's seg == class_id
    test works even for class 0."""
    out_dir, _ = generated
    seg = np.array(Image.open(os.path.join(out_dir, "0000000seg.png")))
    vals = set(np.unique(seg).tolist())
    assert vals == {CLASS_ID, 255}
    assert (seg == CLASS_ID).sum() >= 100  # visibly rendered


def test_depth_and_pose_consistent(generated):
    """Rendered depth at the object matches the npz pose's camera-frame
    depth (identity blender cam at origin: z_cv = -z_world)."""
    out_dir, _ = generated
    for i in range(N_IMAGES):
        depth = np.array(
            Image.open(os.path.join(out_dir, f"{i:07d}depth.png")))
        seg = np.array(Image.open(os.path.join(out_dir, f"{i:07d}seg.png")))
        meta = np.load(os.path.join(out_dir, f"{i:07d}poses_in_world.npz"))
        pose_w = meta["poses_in_world"][0]
        z_cv = -pose_w[2, 3] * 1000.0  # mm
        got = np.median(depth[seg == CLASS_ID])
        assert abs(got - z_cv) < 60.0, (got, z_cv)  # sphere ~50mm radius


def test_complete_blender_ingests(generated, tmp_path):
    """The generated set feeds pair_producer.complete_blender: pairs with
    the %07d{rgbA,rgbB,depthA,depthB,segB}.png + meta.npz layout, val
    split moved (reference produce_train_pair_data.py:145-227)."""
    out_dir, info = generated
    from iros20_6d_pose_tracking_tpu.datagen import pair_producer as pp

    train_dir, val_dir = pp.complete_blender(
        out_dir, str(tmp_path), info, class_id=CLASS_ID, seed=0)

    train_pairs = sorted(
        p for p in os.listdir(train_dir) if p.endswith("rgbA.png"))
    val_pairs = sorted(
        p for p in os.listdir(val_dir) if p.endswith("rgbA.png"))
    assert len(val_pairs) == 1  # val_samples=1 moved out of train
    assert len(train_pairs) >= 2  # >=3 visible frames minus the val move

    sample = train_pairs[0].replace("rgbA.png", "")
    for suffix in ("rgbA", "rgbB", "depthA", "depthB", "segB"):
        assert os.path.exists(
            os.path.join(train_dir, f"{sample}{suffix}.png")), suffix
    meta = np.load(os.path.join(train_dir, f"{sample}meta.npz"))
    A = meta["A_in_cam"]
    B = meta["B_in_cam"]
    assert np.isfinite(A).all() and np.isfinite(B).all()
    # B_in_cam = diag(1,-1,-1,1) @ inv(I) @ pose_w for the identity cam
    assert B[2, 3] > 0.3  # in front of the CV camera
