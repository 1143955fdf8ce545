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


class SyntheticPairs:
    """On-device (A, B) pair generator — the TPU-native input pipeline.

    Samples the observed pose B uniformly in the configured view ranges
    (reference dataset_info.yml blender ranges), perturbs it by
    ``random_gaussian_magnitude(max_trans, max_rot)`` to get the prior A
    (reference produce_train_pair_data.py:109-110), and renders both
    branches in the A-pose ROI window. Everything stays on device.
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
    ):
        self.mesh = mesh
        self.K = jnp.asarray(K, jnp.float32)
        self.resolution = resolution
        self.object_width_mm = object_width_mm
        self.max_trans = max_trans
        self.max_rot_deg = max_rot_deg
        self.xyz_range = xyz_range

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
        )


@functools.partial(
    jax.jit,
    static_argnames=("batch_size", "resolution", "object_width_mm",
                     "max_trans", "max_rot_deg", "xyz_range"),
)
def _synth_batch(mesh, K, key, batch_size, resolution, object_width_mm,
                 max_trans, max_rot_deg, xyz_range):
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
        rgbA, depthA = rz.render(mesh, pa, K, window, out_hw=res)
        rgbB, depthB = rz.render(mesh, pb, K, window, out_hw=res)
        return rgbA, depthA, rgbB, depthB

    rgbA, depthA, rgbB, depthB = jax.vmap(render_pair)(A_in_cam, B_in_cam)
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
