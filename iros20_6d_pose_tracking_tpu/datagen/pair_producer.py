"""Synthetic training-pair production (file-based, reference protocol).

Re-implements the reference's offline pair factory
(reference produce_train_pair_data.py:58-231) on the TPU rasterizer:
given source images of the object with known pose (domain-randomized
renders or real frames), perturb each pose by
``random_gaussian_magnitude(max_translation, max_rotation)`` to make the
prior A (reference :109-110), render A, crop both to A's ROI, and write
``%07d{rgbA,rgbB,depthA,depthB,segB}.png + %07dmeta.npz`` — the exact
layout TrackDataset/PairDataset read (reference datasets.py:70-93).

Also provides a fully self-contained DR source (``render_dr_scene``): the
object at random pose/lighting over a textured background — the in-framework
replacement for the Blender stage (reference blender_dataset_generator.py),
which remains supported as an optional external tool via
``completeBlender``-compatible inputs.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..ops import roi as roi_ops
from ..render import rasterizer as rz


@dataclass
class ProducerConfig:
    resolution: int = 176
    object_width_mm: float = 250.0
    max_translation: float = 0.02   # dataset_info.yml:12
    max_rotation_deg: float = 15.0  # dataset_info.yml:13
    min_visible_px: int = 100       # reference produce_train_pair_data.py:99,128
    width: int = 640
    height: int = 480


class PairProducer:
    """ProducerPurturb equivalent (reference produce_train_pair_data.py:58)."""

    def __init__(self, mesh: rz.MeshArrays, K: np.ndarray,
                 cfg: ProducerConfig, check_vis: bool = False):
        self.mesh = mesh
        self.K = jnp.asarray(K, jnp.float32)
        self.cfg = cfg
        self.check_vis = check_vis
        self.count = 0

    def generate(self, out_dir: str, B_in_cam: np.ndarray,
                 current_rgb: np.ndarray, current_depth_mm: np.ndarray,
                 num_sample: int, class_id: int = 0,
                 current_seg: np.ndarray | None = None,
                 key=None) -> int:
        """Write up to ``num_sample`` (A, B) pairs for one source image.

        Mirrors the reference's flow: sample B_in_A perturbation, reject
        off-image priors, render A in its ROI window, crop B from the real
        frame, visibility-check, save. Returns pairs written.
        """
        cfg = self.cfg
        os.makedirs(out_dir, exist_ok=True)
        key = key if key is not None else jax.random.PRNGKey(self.count)
        written = 0
        B = jnp.asarray(B_in_cam, jnp.float32)
        rgb = jnp.asarray(current_rgb, jnp.float32)
        depth = jnp.asarray(current_depth_mm, jnp.float32)
        seg = None if current_seg is None else jnp.asarray(current_seg)

        for i in range(num_sample):
            key, sub = jax.random.split(key)
            B_in_A = se3.random_gaussian_magnitude(
                sub, cfg.max_translation, cfg.max_rotation_deg
            )
            A = B @ se3.pose_inv(B_in_A)
            # Reject priors projecting outside the image
            # (reference produce_train_pair_data.py:112-116).
            t = np.asarray(A[:3, 3])
            u = t[0] * float(self.K[0, 0]) / t[2] + float(self.K[0, 2])
            v = t[1] * float(self.K[1, 1]) / t[2] + float(self.K[1, 2])
            if not (0 <= u < cfg.width and 0 <= v < cfg.height):
                continue

            bbox = roi_ops.compute_bbox(
                A, self.K, cfg.object_width_mm, (1000.0, 1000.0, 1000.0)
            )
            window = rz.window_from_bbox(bbox)
            res = (cfg.resolution, cfg.resolution)
            rgbA, depthA = rz.render(self.mesh, A, self.K, window, out_hw=res)
            if seg is not None:
                rgbB, depthB, segB = roi_ops.crop_bbox(rgb, depth, bbox, res,
                                                       seg)
                segB_np = (np.asarray(segB) == class_id).astype(np.uint8)
                if segB_np.sum() < cfg.min_visible_px:
                    continue
            else:
                rgbB, depthB = roi_ops.crop_bbox(rgb, depth, bbox, res)
                segB_np = (np.asarray(depthB) > 100).astype(np.uint8)
                if segB_np.sum() < cfg.min_visible_px:
                    continue

            self._save(out_dir, np.asarray(rgbA), np.asarray(depthA),
                       np.asarray(rgbB), np.asarray(depthB), segB_np,
                       np.asarray(A), np.asarray(B))
            written += 1
        return written

    def _save(self, out_dir, rgbA, depthA, rgbB, depthB, segB, A, B):
        from PIL import Image

        i = self.count
        Image.fromarray(rgbA.astype(np.uint8)).save(
            os.path.join(out_dir, f"{i:07d}rgbA.png"), optimize=True)
        Image.fromarray(rgbB.astype(np.uint8)).save(
            os.path.join(out_dir, f"{i:07d}rgbB.png"), optimize=True)
        _save_png16(os.path.join(out_dir, f"{i:07d}depthA.png"),
                    depthA.astype(np.uint16))
        _save_png16(os.path.join(out_dir, f"{i:07d}depthB.png"),
                    depthB.astype(np.uint16))
        Image.fromarray(segB).save(os.path.join(out_dir, f"{i:07d}segB.png"))
        np.savez(os.path.join(out_dir, f"{i:07d}meta.npz"),
                 A_in_cam=A, B_in_cam=B)
        self.count += 1


def _save_png16(path: str, img: np.ndarray):
    from PIL import Image

    Image.fromarray(img).save(path)  # uint16 -> I;16 PNG


def render_dr_scene(mesh: rz.MeshArrays, K, pose, key,
                    width: int = 640, height: int = 480,
                    background: np.ndarray | None = None):
    """One domain-randomized full-frame scene on device: object render
    composited over a random-texture background with randomized brightness —
    the in-framework stand-in for the Blender DR stage
    (reference blender_dataset_generator.py:265-389)."""
    k1, k2, k3 = jax.random.split(key, 3)
    rgb, depth = rz.render(mesh, pose, jnp.asarray(K, jnp.float32),
                           rz.full_frame_window(width, height),
                           out_hw=(height, width))
    hit = depth > 0
    if background is None:
        # Procedural multi-scale noise texture.
        base = jax.random.uniform(k1, (height // 8, width // 8, 3)) * 255.0
        background = jax.image.resize(base, (height, width, 3), "linear")
    bright = jax.random.uniform(k2, (), minval=0.4, maxval=1.4)
    rgb = jnp.clip(rgb * bright, 0, 255)
    out_rgb = jnp.where(hit[..., None], rgb, background)
    bg_depth = jax.random.uniform(k3, (), minval=1200.0, maxval=1999.0)
    out_depth = jnp.where(hit, depth, bg_depth)
    seg = hit.astype(jnp.uint8)
    return out_rgb, out_depth, seg


def produce_dataset(
    mesh: rz.MeshArrays,
    K: np.ndarray,
    out_root: str,
    cfg: ProducerConfig,
    train_samples: int,
    val_samples: int,
    xyz_range=((-0.2, 0.2), (-0.15, 0.15), (0.4, 0.9)),
    seed: int = 0,
):
    """End-to-end dataset factory: DR scenes -> perturbation pairs -> the
    reference's train/val folder split (reference
    produce_train_pair_data.py:145-227, one pair per DR image, last
    ``val_samples`` moved to validation)."""
    train_dir = os.path.join(out_root, "train_data_blender_DR")
    val_dir = os.path.join(out_root, "validation_data_blender_DR")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)

    producer = PairProducer(mesh, K, cfg)
    key = jax.random.PRNGKey(seed)
    total = train_samples + val_samples
    lo = np.array([r[0] for r in xyz_range])
    hi = np.array([r[1] for r in xyz_range])
    rng = np.random.RandomState(seed)

    made = 0
    while made < total:
        key, kp, kr, ks = jax.random.split(key, 4)
        w = np.asarray(se3.random_direction(kr)) * rng.uniform(0, np.pi)
        t = rng.uniform(lo, hi)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.asarray(se3.so3_exp(jnp.asarray(w, jnp.float32)))
        pose[:3, 3] = t
        rgb, depth, seg = render_dr_scene(mesh, K, jnp.asarray(pose), ks,
                                          cfg.width, cfg.height)
        out_dir = train_dir if made < train_samples else val_dir
        if made == train_samples:
            producer.count = 0  # val files restart at 0000000
        made += producer.generate(
            out_dir, pose, np.asarray(rgb), np.asarray(depth), 1,
            class_id=1, current_seg=np.asarray(seg), key=kp,
        )
    return train_dir, val_dir


def complete_blender(
    generated_dir: str,
    out_root: str,
    dataset_info: dict,
    mesh: rz.MeshArrays | None = None,
    class_id: int = 0,
    seed: int = 0,
):
    """Convert Blender DR renders into training pairs — protocol parity
    with reference produce_train_pair_data.py:145-227.

    Reads ``<generated_dir>/%07d{rgb,depth,seg}.png + poses_in_world.npz``
    (keys class_ids / poses_in_world / blendercam_in_world, reference
    blender_dataset_generator.py:367-384), converts poses from the Blender
    camera frame to the CV camera frame (cvcam_in_blendercam = diag(1,-1,-1)
    flip, reference :172-200), produces ONE perturbation pair per image,
    and moves the last ``val_samples`` pairs into the validation split.
    Blender itself stays an optional external stage; this framework's
    rasterizer renders the A branch.
    """
    import glob as _glob
    import shutil

    from PIL import Image
    from ..core.camera import Camera

    cam = Camera.from_dict(dataset_info["camera"])
    if mesh is None:
        from ..render import mesh as mesh_mod

        mesh = rz.upload(mesh_mod.load_mesh(
            dataset_info["models"][0]["model_path"]))
    cfg = ProducerConfig(
        resolution=int(dataset_info["resolution"]),
        object_width_mm=float(dataset_info["object_width"]),
        max_translation=float(dataset_info["max_translation"]),
        max_rotation_deg=float(dataset_info["max_rotation"]),
        width=cam.width,
        height=cam.height,
    )
    train_dir = os.path.join(out_root, "train_data_blender_DR")
    val_dir = os.path.join(out_root, "validation_data_blender_DR")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)

    # Blender cam -> CV cam: y/z flip (reference :172-175).
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    producer = PairProducer(mesh, cam.K, cfg)
    key = jax.random.PRNGKey(seed)

    rgb_files = sorted(_glob.glob(os.path.join(generated_dir, "*rgb.png")))
    assert rgb_files, generated_dir
    for i, rgb_file in enumerate(rgb_files):
        if i % 100 == 0:
            print(f"pair data {i}/{len(rgb_files)}", flush=True)
        meta = np.load(rgb_file.replace("rgb.png", "poses_in_world.npz"))
        pos = np.where(meta["class_ids"] == class_id)[0]
        pose_w = meta["poses_in_world"][pos].reshape(4, 4)
        B_in_cam = flip @ np.linalg.inv(meta["blendercam_in_world"]) @ pose_w

        seg = np.array(Image.open(rgb_file.replace("rgb", "seg")))
        if seg.ndim == 3:
            seg = seg[..., 0]
        if (seg == class_id).sum() < cfg.min_visible_px:
            continue
        rgb = np.array(Image.open(rgb_file))[..., :3]
        depth = np.array(Image.open(rgb_file.replace("rgb", "depth")))
        key, sub = jax.random.split(key)
        producer.generate(train_dir, B_in_cam, rgb, depth.astype(np.float32),
                          num_sample=1, class_id=class_id, current_seg=seg,
                          key=sub)

    # Move the tail into validation (reference :214-226).
    num_val = int(dataset_info.get("val_samples", 0))
    pairs = sorted(_glob.glob(os.path.join(train_dir, "*rgbA.png")))
    pairs.reverse()
    for j in range(min(num_val, len(pairs))):
        src = pairs[j]
        for suffix in ("rgbA", "rgbB", "depthA", "depthB", "segB"):
            shutil.move(src.replace("rgbA", suffix),
                        os.path.join(val_dir, f"{j:07d}{suffix}.png"))
        shutil.move(src.replace("rgbA.png", "meta.npz"),
                    os.path.join(val_dir, f"{j:07d}meta.npz"))
    return train_dir, val_dir
