"""Training-pair data sources.

Two interchangeable sources feed the trainer:

  1. :class:`PairDataset` — reads the reference's on-disk pair layout
     ``%07d{rgbA,rgbB,depthA,depthB,segB}.png + %07dmeta.npz`` with keys
     ``A_in_cam``/``B_in_cam`` (reference datasets.py:70-93,
     produce_train_pair_data.py:132-139). Decoding uses the native C++
     loader (native/dataload.py) when built, else PIL.

  2. :class:`SyntheticPairs` — TPU-native replacement for the offline
     Blender+pyrender pair factory: samples poses and renders BOTH
     branches on device with the rasterizer. No disk, no workers — the
     "input pipeline" is part of the jitted train step.

Label encoding happens on device in the trainer via
``core.se3.encode_delta`` (reference datasets.py:141-150 semantics).
"""
from __future__ import annotations

import functools
import glob
import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..ops import roi as roi_ops
from ..render import rasterizer as rz


@dataclass
class PairRecord:
    rgbA: np.ndarray
    depthA: np.ndarray
    rgbB: np.ndarray
    depthB: np.ndarray
    maskB: np.ndarray
    A_in_cam: np.ndarray
    B_in_cam: np.ndarray


class PairDataset:
    """File-backed (A, B) pair reader, reference layout.

    Pairs are discovered by globbing ``*rgbA.png`` and substituting
    suffixes (reference datasets.py:70,86-93). Images are resized to
    ``resolution`` with nearest interpolation when needed
    (reference datasets.py:95-101).
    """

    def __init__(self, root: str, resolution: int = 176):
        self.root = root
        self.resolution = resolution
        self.rgbA_files = sorted(glob.glob(os.path.join(root, "*rgbA.png")))
        self._native = None
        try:
            from ..native.dataload import NativeLoader

            self._native = NativeLoader()
        except Exception:
            self._native = None

    def __len__(self):
        return len(self.rgbA_files)

    def _imread(self, path, gray=False):
        if self._native is not None:
            arr = self._native.read_png(path)
            if arr is not None:
                if gray and arr.ndim == 3:
                    arr = arr[..., 0]
                return arr
        from PIL import Image

        img = np.array(Image.open(path))
        if gray and img.ndim == 3:
            img = img[..., 0]
        return img

    def _resize(self, img):
        r = self.resolution
        if img.shape[0] == r and img.shape[1] == r:
            return img
        h, w = img.shape[:2]
        rr = (np.arange(r) * h) // r
        cc = (np.arange(r) * w) // r
        return img[rr[:, None], cc[None, :]]

    def __getitem__(self, i: int) -> PairRecord:
        fA = self.rgbA_files[i]
        rgbA = self._imread(fA)[..., :3]
        rgbB = self._imread(fA.replace("rgbA", "rgbB"))[..., :3]
        depthA = self._imread(fA.replace("rgbA", "depthA"), gray=True)
        depthB = self._imread(fA.replace("rgbA", "depthB"), gray=True)
        seg_path = fA.replace("rgbA", "segB")
        if os.path.exists(seg_path):
            maskB = self._imread(seg_path, gray=True)
        else:
            maskB = (depthB > 100).astype(np.uint8)  # reference datasets.py:104
        meta = np.load(fA.replace("rgbA.png", "meta.npz"))
        rec = PairRecord(
            rgbA=self._resize(rgbA).astype(np.float32),
            depthA=self._resize(depthA).astype(np.float32),
            rgbB=self._resize(rgbB).astype(np.float32),
            depthB=self._resize(depthB).astype(np.float32),
            maskB=self._resize(maskB).astype(np.uint8),
            A_in_cam=meta["A_in_cam"].astype(np.float32),
            B_in_cam=meta["B_in_cam"].astype(np.float32),
        )
        assert rec.maskB.sum() > 0, f"empty mask at index {i}"
        return rec

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_last: bool = True, n_threads: int = 16,
                pad_to_batch: bool = False):
        """Yield stacked numpy batches (N, ...) dicts.

        With the native loader built, each batch's 5N PNGs decode on the
        C++ thread pool in one call per stream (the in-process successor
        of the reference's 20 DataLoader worker processes,
        reference config.yml:20); otherwise falls back to per-record
        reads.

        ``pad_to_batch`` (validation): pad a final partial batch up to
        ``batch_size`` by wrapping around and add an ``n_valid`` count so
        the jitted eval step keeps ONE compiled shape across epochs while
        losses stay exact (trainer.eval_step masks the padding).
        """
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        end = len(self) - (len(self) % batch_size if drop_last else 0)
        for s in range(0, end, batch_size):
            idx = order[s : s + batch_size]
            if len(idx) == 0:
                continue
            n_valid = len(idx)
            if pad_to_batch and n_valid < batch_size:
                extra = order[np.arange(batch_size - n_valid) % len(order)]
                idx = np.concatenate([idx, extra])
            batch = self._native_batch(idx, n_threads)
            if batch is None:
                recs = [self[int(i)] for i in idx]
                batch = {
                    "rgbA": np.stack([r.rgbA for r in recs]),
                    "depthA": np.stack([r.depthA for r in recs]),
                    "rgbB": np.stack([r.rgbB for r in recs]),
                    "depthB": np.stack([r.depthB for r in recs]),
                    "maskB": np.stack([r.maskB for r in recs]),
                    "A_in_cam": np.stack([r.A_in_cam for r in recs]),
                    "B_in_cam": np.stack([r.B_in_cam for r in recs]),
                }
            if pad_to_batch:
                batch["n_valid"] = n_valid
            yield batch

    def _native_batch(self, idx, n_threads: int):
        """Whole-batch decode on the C++ pool. Returns None when the
        native loader is unavailable or shapes force the slow path."""
        if self._native is None:
            return None
        fAs = [self.rgbA_files[int(i)] for i in idx]
        try:
            meta0 = self._native.info(fAs[0])
            if meta0 is None or meta0[0] != self.resolution \
                    or meta0[1] != self.resolution:
                return None  # needs resize: per-record path handles it
            rgbA = self._native.read_png_batch(fAs, np.uint8, n_threads)
            rgbB = self._native.read_png_batch(
                [f.replace("rgbA", "rgbB") for f in fAs], np.uint8, n_threads)
            depthA = self._native.read_png_batch(
                [f.replace("rgbA", "depthA") for f in fAs], np.uint16,
                n_threads)
            depthB = self._native.read_png_batch(
                [f.replace("rgbA", "depthB") for f in fAs], np.uint16,
                n_threads)
            seg_files = [f.replace("rgbA", "segB") for f in fAs]
            if all(os.path.exists(f) for f in seg_files):
                maskB = self._native.read_png_batch(seg_files, np.uint8,
                                                    n_threads)
                if maskB.ndim == 4:
                    maskB = maskB[..., 0]
            else:
                maskB = (depthB > 100).astype(np.uint8)
        except (IOError, AssertionError):
            return None
        metas = [np.load(f.replace("rgbA.png", "meta.npz")) for f in fAs]
        return {
            "rgbA": rgbA[..., :3].astype(np.float32),
            "depthA": depthA.astype(np.float32),
            "rgbB": rgbB[..., :3].astype(np.float32),
            "depthB": depthB.astype(np.float32),
            "maskB": maskB.astype(np.uint8),
            "A_in_cam": np.stack([m["A_in_cam"] for m in metas]).astype(
                np.float32),
            "B_in_cam": np.stack([m["B_in_cam"] for m in metas]).astype(
                np.float32),
        }


@dataclass(frozen=True)
class DRComposite:
    """On-device domain randomization composited into the observed (B)
    branch inside the jitted pair sampler.

    The reference's robustness to real scenes comes from the B crop being
    cut out of a cluttered Blender DR render — textured background at
    VALID sensor depth, clutter, partial occluders
    (blender_dataset_generator.py:175-192, produce_train_pair_data.py:118-128).
    A network trained on clean renders only ever sees background depth
    pinned to "invalid" and fails on real frames where background depth
    is a real surface. This config z-composites (background, object,
    occluder blob) layers on device — the TPU-native counterpart of that
    offline DR stage, with zero disk IO.
    """

    bg_prob: float = 0.9
    bg_depth_range: tuple = (850.0, 1900.0)
    occluder_prob: float = 0.5
    # an occluder that would hide more than this fraction of the object's
    # pixels is dropped (reference producer rejects over-occluded samples,
    # produce_train_pair_data.py:128; BlackCover keeps >=50% visible,
    # data_augmentation.py:217-267)
    max_occluded_frac: float = 0.5


class SyntheticPairs:
    """On-device (A, B) pair generator — the TPU-native input pipeline.

    Samples the observed pose B uniformly in the configured view ranges
    (reference dataset_info.yml blender ranges), perturbs it by
    ``random_gaussian_magnitude(max_trans, max_rot)`` to get the prior A
    (reference produce_train_pair_data.py:109-110), and renders both
    branches in the A-pose ROI window. Everything stays on device.

    With ``dr=DRComposite(...)`` the B branch is additionally composited
    into a randomized scene (valid-depth background + occluder blobs) —
    see :class:`DRComposite`.
    """

    def __init__(
        self,
        mesh: rz.MeshArrays,
        K,
        resolution: int = 176,
        object_width_mm: float = 250.0,
        max_trans: float = 0.02,
        max_rot_deg: float = 15.0,
        xyz_range=((-0.1, 0.1), (-0.1, 0.1), (0.4, 0.9)),
        dr: DRComposite | None = None,
        render_impl: str | None = None,
    ):
        self.mesh = mesh
        self.K = jnp.asarray(K, jnp.float32)
        self.resolution = resolution
        self.object_width_mm = object_width_mm
        self.max_trans = max_trans
        self.max_rot_deg = max_rot_deg
        self.xyz_range = xyz_range
        self.dr = dr
        # Measured (TPU v5e, batch 200 x 176^2, 10-iter steady state):
        # the XLA sweep wins the BATCHED sampler 2.25x (195 vs 439
        # ms/iter incl. train step) — at batch the (P, Fb) temporaries
        # fuse/pipeline well, while the Pallas kernel's 200 x 61-program
        # grid pays fixed per-program overhead with no latency to hide.
        # (Batch-1 tracking is the opposite: pallas 5x — docs/KERNEL.md.)
        self.render_impl = render_impl or "xla"

    def sample_batch(self, key, batch_size: int):
        return _synth_batch(
            self.mesh,
            self.K,
            key,
            batch_size,
            self.resolution,
            self.object_width_mm,
            self.max_trans,
            self.max_rot_deg,
            tuple(map(tuple, self.xyz_range)),
            self.dr,
            self.render_impl,
        )

    def fused_train_step(self, model, tx, cfg, state, kdata, kaug, mean,
                         std):
        """Sampler + train step as ONE jitted program
        (train/trainer.py::train_step_synth): the rendered pair batch
        never round-trips HBM between two dispatches. Identical RNG
        streams and numerics to ``sample_batch(kdata)`` followed by
        ``train_step(..., kaug, ...)``."""
        from ..train.trainer import train_step_synth

        return train_step_synth(
            model, tx, cfg, state, kdata, kaug, self.mesh, self.K,
            self.object_width_mm, mean, std,
            batch_size=cfg.batch_size, resolution=self.resolution,
            max_trans=self.max_trans, max_rot_deg=self.max_rot_deg,
            xyz_range=tuple(map(tuple, self.xyz_range)), dr=self.dr,
            impl=self.render_impl)


def _smooth_noise(key, res, channels, coarse=6, fine=24):
    """Two-octave smooth noise in [0, 1): coarse blobs + fine detail,
    bilinearly upsampled — a jit-friendly stand-in for DR textures."""
    k1, k2 = jax.random.split(key)
    lo = jax.random.uniform(k1, (coarse, coarse, channels))
    hi = jax.random.uniform(k2, (fine, fine, channels))
    shape = (res, res, channels)
    img = (jax.image.resize(lo, shape, "bilinear") * 0.75
           + jax.image.resize(hi, shape, "bilinear") * 0.25)
    return img


def _dr_composite_one(key, rgbB, depthB, dr: "DRComposite"):
    """z-composite (background, object, occluder) into the B branch.

    Object pixels keep their exact rendered values unless an occluder
    wins the z-test; ``maskB`` becomes true object VISIBILITY (reference
    segB semantics, produce_train_pair_data.py:118-128).
    """
    res = depthB.shape[0]
    kbg, kbp, kbd, kocc, kop, koc = jax.random.split(key, 6)
    obj = depthB > 100.0

    # --- background: textured RGB + tilted-plane depth (valid range) ----
    # The depth floor is derived from the OBJECT's mean depth (+ margin):
    # background pixels never z-fight the object, so the composite cannot
    # produce a background plane nearer than the object it fails to
    # occlude (physically impossible orderings confuse depth features).
    lo, hi = dr.bg_depth_range
    bg_rgb = _smooth_noise(kbg, res, 3) * 255.0
    n_obj = obj.sum()
    obj_mean_d = jnp.where(n_obj > 0,
                           (depthB * obj).sum() / (n_obj + 1e-9), 600.0)
    lo = jnp.maximum(lo, obj_mean_d + 120.0)
    hi = jnp.maximum(hi, lo + 100.0)
    base = jax.random.uniform(kbd, (), minval=lo, maxval=hi)
    gx, gy = jax.random.uniform(jax.random.fold_in(kbd, 1), (2,),
                                minval=-1.5, maxval=1.5)
    yy, xx = jnp.mgrid[0:res, 0:res]
    bg_depth = base + gx * (xx - res / 2) + gy * (yy - res / 2) \
        + _smooth_noise(jax.random.fold_in(kbd, 2), res, 1)[..., 0] * 40.0
    bg_depth = jnp.clip(bg_depth, lo, 2500.0)
    use_bg = jax.random.bernoulli(kbp, dr.bg_prob)
    out_rgb = jnp.where((~obj[..., None]) & use_bg, bg_rgb, rgbB)
    out_depth = jnp.where((~obj) & use_bg, bg_depth, depthB)

    # --- occluder: colored ellipse blob in front of the object ----------
    valid = obj.sum()
    mean_d = jnp.where(valid > 0, (depthB * obj).sum() / (valid + 1e-9),
                       600.0)
    cx, cy = jax.random.uniform(kop, (2,), minval=0.2 * res,
                                maxval=0.8 * res)
    rx, ry = jax.random.uniform(jax.random.fold_in(kop, 1), (2,),
                                minval=0.10 * res, maxval=0.30 * res)
    ell = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1.0
    occ_depth = mean_d * jax.random.uniform(
        jax.random.fold_in(kocc, 1), (), minval=0.5, maxval=0.85)
    occ_rgb = (jax.random.uniform(koc, (3,)) * 235.0 + 10.0
               + (_smooth_noise(jax.random.fold_in(koc, 1), res, 3) - 0.5)
               * 40.0)
    hidden = (ell & obj).sum() / (valid + 1e-9)
    use_occ = (jax.random.bernoulli(kocc, dr.occluder_prob)
               & (hidden <= dr.max_occluded_frac))
    # depth <= 100 means "no reading" — infinitely far for the z-test
    far = jnp.where(out_depth > 100.0, out_depth, jnp.inf)
    occ_wins = ell & (occ_depth < far) & use_occ
    out_rgb = jnp.where(occ_wins[..., None], jnp.clip(occ_rgb, 0, 255),
                        out_rgb)
    out_depth = jnp.where(occ_wins, occ_depth, out_depth)
    maskB = obj & ~occ_wins
    return out_rgb, out_depth, maskB


@functools.partial(
    jax.jit,
    static_argnames=("batch_size", "resolution", "object_width_mm",
                     "max_trans", "max_rot_deg", "xyz_range", "dr",
                     "impl"),
)
def _synth_batch(mesh, K, key, batch_size, resolution, object_width_mm,
                 max_trans, max_rot_deg, xyz_range, dr=None, impl="xla"):
    return _synth_batch_impl(mesh, K, key, batch_size, resolution,
                             object_width_mm, max_trans, max_rot_deg,
                             xyz_range, dr, impl)


def _synth_batch_impl(mesh, K, key, batch_size, resolution,
                      object_width_mm, max_trans, max_rot_deg, xyz_range,
                      dr=None, impl="xla"):
    """Un-jitted sampler body. ``object_width_mm`` may be a TRACED scalar
    here (compute_bbox supports it) — the object-ensemble sampler vmaps
    this over per-object (mesh, key, width) so one program renders
    training pairs for every object at once."""
    kr, kt, kp = jax.random.split(key, 3)
    # Random observed pose B.
    w = se3.random_direction(kr, (batch_size,)) * jax.random.uniform(
        jax.random.fold_in(kr, 1), (batch_size, 1), minval=0.0, maxval=np.pi
    )
    R_B = se3.so3_exp(w)
    lo = jnp.array([r[0] for r in xyz_range])
    hi = jnp.array([r[1] for r in xyz_range])
    t_B = jax.random.uniform(kt, (batch_size, 3)) * (hi - lo) + lo
    B_in_cam = se3.make_pose(R_B, t_B)
    # Prior pose A = B . inv(perturbation) (produce_train_pair_data.py:109-110).
    B_in_A = se3.random_gaussian_magnitude(kp, max_trans, max_rot_deg,
                                           (batch_size,))
    A_in_cam = B_in_cam @ se3.pose_inv(B_in_A)

    res = (resolution, resolution)

    def render_pair(pa, pb):
        bbox = roi_ops.compute_bbox(pa, K, object_width_mm, (1000.0, 1000.0, 1000.0))
        window = rz.window_from_bbox(bbox)
        rgbA, depthA = rz.render(mesh, pa, K, window, out_hw=res,
                                 impl=impl)
        rgbB, depthB = rz.render(mesh, pb, K, window, out_hw=res,
                                 impl=impl)
        return rgbA, depthA, rgbB, depthB

    rgbA, depthA, rgbB, depthB = jax.vmap(render_pair)(A_in_cam, B_in_cam)
    if dr is not None:
        kdr = jax.random.split(jax.random.fold_in(key, 3), batch_size)
        rgbB, depthB, maskB = jax.vmap(
            lambda k, r, d: _dr_composite_one(k, r, d, dr)
        )(kdr, rgbB, depthB)
    else:
        maskB = depthB > 100.0
    return {
        "rgbA": rgbA,
        "depthA": depthA,
        "rgbB": rgbB,
        "depthB": depthB,
        "maskB": maskB,
        "A_in_cam": A_in_cam,
        "B_in_cam": B_in_cam,
    }


@functools.partial(
    jax.jit,
    static_argnames=("batch_size", "resolution", "max_trans",
                     "max_rot_deg", "xyz_range", "dr", "impl"),
)
def ensemble_synth_batch(ens_mesh, K, keys, widths_mm, batch_size,
                         resolution, max_trans, max_rot_deg, xyz_range,
                         dr=None, impl="xla"):
    """Per-object synthetic pair batches in ONE program (stacked
    MeshArrays from parallel/spmd.stack_meshes, per-object keys and
    TRACED ROI widths). Returns a raw-batch dict with leading
    (O, batch, ...) axes — the input the ensemble train step
    (parallel/spmd.ensemble_train_step) consumes. Feeds the suite's
    --ensemble mode, which trains all objects simultaneously (SURVEY.md
    section 2: per-object models are independent — the natural
    parallelism).

    TPU memory design: objects iterate under ``lax.map`` (NOT vmap — a
    vmapped batch-200 rasterizer multiplies pass-1 temporaries by O and
    blows HBM: measured 17.4 G at O=4), and images cross to the train
    step quantized uint8 RGB / uint16 mm depth — exactly the fidelity of
    the reference's PNG pair files (produce_train_pair_data.py writes
    8/16-bit PNGs), at a quarter of the float32 residency."""

    def one(args):
        m, k, w = args
        raw = _synth_batch_impl(m, K, k, batch_size, resolution, w,
                                max_trans, max_rot_deg, xyz_range, dr,
                                impl)
        return {
            "rgbA": jnp.clip(jnp.round(raw["rgbA"]), 0, 255).astype(
                jnp.uint8),
            "depthA": jnp.clip(jnp.round(raw["depthA"]), 0, 65535).astype(
                jnp.uint16),
            "rgbB": jnp.clip(jnp.round(raw["rgbB"]), 0, 255).astype(
                jnp.uint8),
            "depthB": jnp.clip(jnp.round(raw["depthB"]), 0, 65535).astype(
                jnp.uint16),
            "maskB": raw["maskB"],
            "A_in_cam": raw["A_in_cam"],
            "B_in_cam": raw["B_in_cam"],
        }

    return jax.lax.map(one, (ens_mesh, keys, widths_mm))
