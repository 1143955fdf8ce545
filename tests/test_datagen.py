"""Datagen round-trip: produce pairs -> PairDataset reads them -> labels
valid -> a train step consumes them. Plus Blender-layout compatibility."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iros20_6d_pose_tracking_tpu.core import se3
from iros20_6d_pose_tracking_tpu.data.dataset import PairDataset
from iros20_6d_pose_tracking_tpu.datagen import pair_producer as pp
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz

RES = 48
K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]], np.float32)


def _cfg():
    return pp.ProducerConfig(
        resolution=RES, object_width_mm=110.0, max_translation=0.02,
        max_rotation_deg=15.0, width=320, height=240,
    )


@pytest.fixture(scope="module")
def mesh():
    return rz.upload(M.make_icosphere(subdiv=2, radius=0.05))


@pytest.mark.slow
def test_produce_and_read_roundtrip(tmp_path, mesh):
    train_dir, val_dir = pp.produce_dataset(
        mesh, K, str(tmp_path), _cfg(), train_samples=5, val_samples=2,
        xyz_range=((-0.05, 0.05), (-0.04, 0.04), (0.45, 0.6)),
    )
    ds = PairDataset(train_dir, resolution=RES)
    ds_val = PairDataset(val_dir, resolution=RES)
    assert len(ds) == 5 and len(ds_val) == 2

    rec = ds[0]
    assert rec.rgbA.shape == (RES, RES, 3)
    assert rec.depthB.dtype == np.float32
    assert rec.maskB.sum() > 0
    # Rendered A must actually contain the object.
    assert (rec.depthA > 100).sum() > 50
    # Labels from stored poses stay within the normalizer bounds
    # (the reference's train-mode assertion, datasets.py:152-154).
    t, r = se3.encode_delta(
        jnp.asarray(rec.A_in_cam), jnp.asarray(rec.B_in_cam),
        0.02, 15 * np.pi / 180,
    )
    assert np.abs(np.array(t)).max() <= 1.0 + 1e-4
    assert np.abs(np.array(r)).max() <= 1.0 + 1e-3

    # A batch feeds the trainer's preprocessing without error.
    from iros20_6d_pose_tracking_tpu.train import trainer as tr
    from iros20_6d_pose_tracking_tpu.data import augment as A_

    batch = next(ds.batches(4, shuffle=False))
    cfg = tr.TrainConfig(resolution=RES, batch_size=4,
                         aug=A_.AugmentConfig(blur_prob=0.0))
    bufA, bufB, tl, rl = tr.preprocess_batch(
        jax.random.PRNGKey(0), batch, jnp.zeros(8), jnp.full(8, 100.0),
        cfg, train=True,
    )
    assert bufA.shape == (4, RES, RES, 4)
    assert np.isfinite(np.array(bufA)).all()


def test_complete_blender_layout(tmp_path, mesh):
    """Synthetic Blender stage-1 output -> pairs via complete_blender."""
    from PIL import Image

    gen = tmp_path / "generated_data"
    gen.mkdir()
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    cam_in_world = np.eye(4)
    cam_in_world[:3, 3] = [0.1, 0.2, 1.5]
    rng = np.random.RandomState(0)
    for i in range(3):
        pose_cv = np.eye(4)
        pose_cv[:3, 3] = [0.01 * i, -0.01 * i, 0.5]
        rgb, depth = rz.render(mesh, jnp.asarray(pose_cv, jnp.float32),
                               jnp.array(K), rz.full_frame_window(320, 240),
                               out_hw=(240, 320))
        seg = (np.asarray(depth) > 0).astype(np.uint8) * 7  # class id 7
        Image.fromarray(np.asarray(rgb).astype(np.uint8)).save(
            gen / f"{i:07d}rgb.png")
        Image.fromarray(np.asarray(depth).astype(np.uint16)).save(
            gen / f"{i:07d}depth.png")
        Image.fromarray(seg).save(gen / f"{i:07d}seg.png")
        # Invert the frame conversion so complete_blender recovers pose_cv:
        # B_in_cam = flip . inv(cam_in_world) . pose_world
        pose_world = cam_in_world @ np.linalg.inv(flip) @ pose_cv
        np.savez(gen / f"{i:07d}poses_in_world.npz",
                 class_ids=np.array([7]),
                 poses_in_world=pose_world[None],
                 blendercam_in_world=cam_in_world)

    dataset_info = {
        "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": 160.0,
                   "centerY": 120.0, "width": 320, "height": 240},
        "resolution": RES, "object_width": 110.0,
        "max_translation": 0.02, "max_rotation": 15, "val_samples": 1,
    }
    train_dir, val_dir = pp.complete_blender(
        str(gen), str(tmp_path / "pairs"), dataset_info, mesh=mesh,
        class_id=7,
    )
    n_train = len(PairDataset(train_dir, resolution=RES))
    n_val = len(PairDataset(val_dir, resolution=RES))
    assert n_train + n_val >= 2 and n_val == 1
    # Stored B pose must match the original CV-frame pose.
    meta = np.load(os.path.join(
        train_dir, sorted(os.listdir(train_dir))[0].replace(
            "depthA.png", "meta.npz").replace("rgbA.png", "meta.npz")))
    # find any meta file robustly
    metas = [f for f in os.listdir(train_dir) if f.endswith("meta.npz")]
    meta = np.load(os.path.join(train_dir, metas[0]))
    assert abs(meta["B_in_cam"][2, 3] - 0.5) < 1e-5


def test_dr_scene_occluder_clips_seg(mesh):
    """A layer in front of the target must win the depth merge: its pixels
    drop out of the seg mask (the reference's IndexOB semantics give seg =
    visible target only, blender_dataset_generator.py:201-254)."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 0.6]
    key = jax.random.PRNGKey(0)
    _, _, seg_clear = pp.render_dr_scene(mesh, K, jnp.asarray(pose), key,
                                         width=320, height=240)
    # occluder: same mesh halfway to the camera, slightly offset.
    occ_pose = np.eye(4, dtype=np.float32)
    occ_pose[:3, 3] = [0.045, 0, 0.3]
    rgb, depth, seg_occ = pp.render_dr_scene(
        mesh, K, jnp.asarray(pose), key, width=320, height=240,
        extra_layers=[(mesh, jnp.asarray(occ_pose))],
    )
    n_clear = int(np.asarray(seg_clear).sum())
    n_occ = int(np.asarray(seg_occ).sum())
    assert 0 < n_occ < n_clear  # partially occluded, not wiped out
    # depth at occluded pixels comes from the closer layer.
    occ_px = (np.asarray(seg_clear) == 1) & (np.asarray(seg_occ) == 0)
    assert occ_px.any()
    d = np.asarray(depth)
    assert float(np.median(d[occ_px])) < 450.0  # occluder depth ~300 mm


def test_dr_scene_generator_textures_and_clutter(tmp_path, mesh):
    """DRSceneGenerator: texture-pool backgrounds are used verbatim where
    nothing renders; clutter stays reproducible under a seed."""
    from PIL import Image

    tex_dir = tmp_path / "textures"
    tex_dir.mkdir()
    flat = np.full((240, 320, 3), [7, 200, 90], np.uint8)
    Image.fromarray(flat).save(tex_dir / "flat.png")

    cfg = pp.DRSceneConfig(width=320, height=240, max_distractors=2,
                           occluder_prob=0.5, texture_dir=str(tex_dir))
    gen = pp.DRSceneGenerator(mesh, K, cfg, seed=3)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 0.6]
    rgb, depth, seg = gen.scene(pose, jax.random.PRNGKey(1))
    rgb, depth, seg = np.asarray(rgb), np.asarray(depth), np.asarray(seg)
    assert seg.sum() > 50
    # background pixels (nothing rendered anywhere) show the pool texture
    bg = depth >= 1200.0  # background depth range
    assert bg.any()
    np.testing.assert_array_equal(rgb[bg][0].astype(np.uint8), [7, 200, 90])
    # same seed -> same scene (reproducibility of host-side randomness)
    gen2 = pp.DRSceneGenerator(mesh, K, cfg, seed=3)
    rgb2, _, seg2 = gen2.scene(pose, jax.random.PRNGKey(1))
    np.testing.assert_allclose(rgb, np.asarray(rgb2), atol=1e-5)
    np.testing.assert_array_equal(seg, np.asarray(seg2))


def test_procedural_texture_families():
    rng = np.random.RandomState(0)
    seen = set()
    for _ in range(12):
        img = pp._procedural_texture(rng, 60, 80)
        assert img.shape == (60, 80, 3)
        assert img.min() >= 0 and img.max() <= 255
        seen.add(round(float(img.std()), 4))
    assert len(seen) > 4  # textures actually vary
