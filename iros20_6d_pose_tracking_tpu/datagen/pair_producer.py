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
                    background: np.ndarray | None = None,
                    extra_layers=()):
    """One domain-randomized full-frame scene on device: the target object
    (plus optional distractor/occluder layers, depth-merged like a shared
    z-buffer) composited over a textured background with randomized
    photometry — the in-framework stand-in for the Blender DR stage
    (reference blender_dataset_generator.py:265-389).

    ``extra_layers`` is a sequence of (MeshArrays, pose) rendered into the
    same camera; pixels are resolved by nearest depth, so layers in front
    of the target OCCLUDE it (the seg mask reports only visible target
    pixels, like the reference's IndexOB compositor output,
    reference blender_dataset_generator.py:201-254).

    Returns (rgb (H,W,3) f32, depth_mm (H,W) f32, seg (H,W) uint8 where
    1 = visible target).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    Kj = jnp.asarray(K, jnp.float32)
    window = rz.full_frame_window(width, height)
    layers = [(mesh, pose)] + list(extra_layers)
    rgbs, depths = [], []
    for m, p in layers:
        r, d = rz.render(m, jnp.asarray(p, jnp.float32), Kj, window,
                         out_hw=(height, width))
        rgbs.append(r)
        depths.append(d)
    d = jnp.stack([jnp.where(di > 0, di, jnp.inf) for di in depths])
    winner = jnp.argmin(d, axis=0)
    zmin = jnp.min(d, axis=0)
    hit = jnp.isfinite(zmin)
    rgb = jnp.take_along_axis(jnp.stack(rgbs), winner[None, ..., None],
                              axis=0)[0]

    if background is None:
        # Procedural multi-scale noise texture.
        base = jax.random.uniform(k1, (height // 8, width // 8, 3)) * 255.0
        background = jax.image.resize(base, (height, width, 3), "linear")
    # Photometric DR: per-channel gain + global brightness (the stand-in
    # for the reference's randomized lamps, blender_dataset_generator.py:122-145;
    # the rasterizer's directional term itself is a fixed headlight).
    gain = jax.random.uniform(k2, (3,), minval=0.75, maxval=1.25)
    bright = jax.random.uniform(jax.random.fold_in(k2, 1), (),
                                minval=0.4, maxval=1.4)
    rgb = jnp.clip(rgb * gain * bright, 0, 255)
    out_rgb = jnp.where(hit[..., None], rgb, background)
    bg_depth = jax.random.uniform(k3, (), minval=1200.0, maxval=1999.0)
    out_depth = jnp.where(hit, zmin, bg_depth)
    seg = (hit & (winner == 0)).astype(jnp.uint8)
    return out_rgb, out_depth, seg


def load_texture_pool(folder: str, hw: tuple[int, int] = (480, 640),
                      max_textures: int = 64) -> np.ndarray | None:
    """Load a pool of background textures from an image folder (the
    reference samples DTD/ETH texture files onto its background planes,
    reference blender_dataset_generator.py:175-192,296-304; dataset_info
    'texture_folders'). Returns (N, H, W, 3) uint8 or None when empty."""
    import glob as _glob

    from PIL import Image

    files = sorted(
        f for f in _glob.glob(os.path.join(folder, "**", "*"), recursive=True)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )[:max_textures]
    if not files:
        return None
    H, W = hw
    out = []
    for f in files:
        try:
            img = Image.open(f).convert("RGB").resize((W, H))
            out.append(np.asarray(img, np.uint8))
        except Exception:
            continue
    return np.stack(out) if out else None


def _procedural_texture(rng: np.random.RandomState, height: int,
                        width: int) -> np.ndarray:
    """A random texture from one of four families (multi-octave noise,
    checker, stripes, gradient+noise) — richer stand-ins for the
    reference's texture files when no pool is provided."""
    fam = rng.randint(4)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    c0 = rng.uniform(0, 255, 3).astype(np.float32)
    c1 = rng.uniform(0, 255, 3).astype(np.float32)
    if fam == 0:  # multi-octave noise
        img = np.zeros((height, width, 3), np.float32)
        for scale in (8, 32, 128):
            small = rng.uniform(0, 1, (max(height // scale, 1),
                                       max(width // scale, 1), 3))
            img += np.asarray(jax.image.resize(
                jnp.asarray(small, jnp.float32), (height, width, 3),
                "linear"))
        img = img / 3.0 * 255.0
    elif fam == 1:  # checker
        period = rng.randint(16, 96)
        mask = ((yy // period + xx // period) % 2)[..., None]
        img = mask * c0 + (1 - mask) * c1
    elif fam == 2:  # stripes at a random angle
        theta = rng.uniform(0, np.pi)
        period = rng.uniform(12, 80)
        phase = np.sin((xx * np.cos(theta) + yy * np.sin(theta))
                       * (2 * np.pi / period))
        mask = (phase > 0)[..., None]
        img = mask * c0 + (1 - mask) * c1
    else:  # smooth two-color gradient + noise
        t = (xx / width * rng.uniform(-1, 1)
             + yy / height * rng.uniform(-1, 1) + 1) / 2
        img = t[..., None] * c0 + (1 - t[..., None]) * c1
        img += rng.uniform(-20, 20, (height, width, 1))
    return np.clip(img, 0, 255).astype(np.float32)


@dataclass
class DRSceneConfig:
    """Scene-level domain randomization (parity targets in
    reference blender_dataset_generator.py: textures :175-192, distractor
    clutter/gravity drop :306-363, lighting :75-145)."""

    width: int = 640
    height: int = 480
    max_distractors: int = 2
    occluder_prob: float = 0.3
    texture_dir: str | None = None


class DRSceneGenerator:
    """Randomized full-frame scene factory around ``render_dr_scene``.

    Host-side randomness (numpy) picks layout/textures; the device renders
    and composites. Distractors are random color-jittered primitives at
    poses near the target's depth; occluders sit on the camera->target ray
    so they clip the object partially (the producer's visibility check
    rejects over-occluded samples, reference produce_train_pair_data.py:128).
    """

    def __init__(self, mesh: rz.MeshArrays, K, cfg: DRSceneConfig,
                 seed: int = 0):
        from ..render import mesh as mesh_mod

        self.mesh = mesh
        self.K = np.asarray(K, np.float32)
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self._pool = None
        if cfg.texture_dir:
            self._pool = load_texture_pool(cfg.texture_dir,
                                           (cfg.height, cfg.width))
        prims = []
        for i in range(6):
            if i % 2 == 0:
                tm = mesh_mod.make_cube(self.rng.uniform(0.03, 0.09))
            else:
                tm = mesh_mod.make_icosphere(
                    subdiv=2, radius=self.rng.uniform(0.02, 0.05))
            colors = np.clip(
                tm.colors * self.rng.uniform(0.3, 1.0, 3), 0, 1
            ).astype(np.float32)
            prims.append(rz.upload(mesh_mod.TriMesh(
                verts=tm.verts, faces=tm.faces, colors=colors,
                normals=tm.normals, num_faces=tm.num_faces)))
        self._prims = prims

    def _random_pose(self, t):
        from ..core import se3 as _se3

        w = self.rng.randn(3)
        n = np.linalg.norm(w) + 1e-9
        w = w / n * self.rng.uniform(0, np.pi)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.asarray(_se3.so3_exp(jnp.asarray(w, jnp.float32)))
        pose[:3, 3] = t
        return pose

    def scene(self, pose: np.ndarray, key):
        """(rgb, depth_mm, seg) for the target at ``pose`` in a cluttered
        randomized scene."""
        cfg = self.cfg
        rng = self.rng
        t_obj = np.asarray(pose)[:3, 3]
        layers = []
        for _ in range(rng.randint(0, cfg.max_distractors + 1)):
            off = rng.uniform(-0.18, 0.18, 3) * np.array([1, 1, 0.6])
            t = t_obj + off
            if t[2] < 0.25:
                continue
            layers.append((self._prims[rng.randint(len(self._prims))],
                           self._random_pose(t)))
        if rng.rand() < cfg.occluder_prob:
            s = rng.uniform(0.45, 0.75)  # between camera and target
            perp = rng.uniform(-1.0, 1.0, 2)
            perp = perp / (np.linalg.norm(perp) + 1e-9)
            # offset so the occluder clips the object edge, not its center
            r_off = rng.uniform(0.01, 0.04)
            t = t_obj * s + np.array([perp[0] * r_off, perp[1] * r_off, 0.0])
            layers.append((self._prims[rng.randint(len(self._prims))],
                           self._random_pose(t)))
        background = None
        if self._pool is not None:
            background = jnp.asarray(
                self._pool[rng.randint(len(self._pool))], jnp.float32)
        else:
            background = jnp.asarray(
                _procedural_texture(rng, cfg.height, cfg.width))
        return render_dr_scene(self.mesh, self.K, jnp.asarray(pose), key,
                               cfg.width, cfg.height, background=background,
                               extra_layers=layers)


def produce_dataset(
    mesh: rz.MeshArrays,
    K: np.ndarray,
    out_root: str,
    cfg: ProducerConfig,
    train_samples: int,
    val_samples: int,
    xyz_range=((-0.2, 0.2), (-0.15, 0.15), (0.4, 0.9)),
    seed: int = 0,
    scene_cfg: DRSceneConfig | None = None,
):
    """End-to-end dataset factory: DR scenes -> perturbation pairs -> the
    reference's train/val folder split (reference
    produce_train_pair_data.py:145-227, one pair per DR image, last
    ``val_samples`` moved to validation). ``scene_cfg`` controls scene
    richness (texture pool, distractor clutter, occluders)."""
    train_dir = os.path.join(out_root, "train_data_blender_DR")
    val_dir = os.path.join(out_root, "validation_data_blender_DR")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)

    producer = PairProducer(mesh, K, cfg)
    scene_cfg = scene_cfg or DRSceneConfig(width=cfg.width,
                                           height=cfg.height)
    scenes = DRSceneGenerator(mesh, K, scene_cfg, seed=seed)
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
        rgb, depth, seg = scenes.scene(pose, ks)
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
