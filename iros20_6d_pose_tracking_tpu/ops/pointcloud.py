"""Point-cloud ops (reference Utils.py:147-168 and friends), JAX-native.

``rgbd_to_pointcloud`` unprojects RGB-D into camera-frame points
(reference Utils.py:147-158); dataset discovery helpers mirror
``findClassContainedVideosYcb`` (reference Utils.py:108-123).
"""
from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
import numpy as np


def rgbd_to_pointcloud(K, depth_m: jax.Array, rgb: jax.Array | None = None,
                       z_range=(0.1, 2.0)):
    """Unproject a depth map (metres) into an (H*W, 3) cloud with a
    validity mask; colors gathered if rgb given. Static shapes (masked,
    not compacted) so it jits — callers filter with the mask.
    """
    H, W = depth_m.shape
    us = jnp.arange(W, dtype=jnp.float32)[None, :]
    vs = jnp.arange(H, dtype=jnp.float32)[:, None]
    z = depth_m.astype(jnp.float32)
    mask = (z > z_range[0]) & (z < z_range[1])
    x = (us - K[0, 2]) * z / K[0, 0]
    y = (vs - K[1, 2]) * z / K[1, 1]
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    if rgb is not None:
        return pts, rgb.reshape(-1, rgb.shape[-1]), mask.reshape(-1)
    return pts, None, mask.reshape(-1)


def find_class_contained_videos_ycb(data_organized_dir: str, class_id: int,
                                    testset: bool = True) -> list[int]:
    """Sequence ids whose pose_gt contains the class (reference
    Utils.py:108-123; test set = videos 48..59)."""
    out = []
    for entry in sorted(os.listdir(data_organized_dir)):
        if not re.fullmatch(r"\d{4}", entry):
            continue
        vid = int(entry)
        if testset and (vid < 48 or vid > 59):
            continue
        gt_dir = os.path.join(data_organized_dir, entry, "pose_gt")
        if not os.path.isdir(gt_dir):
            continue
        try:
            ids = [int(x) for x in os.listdir(gt_dir)]
        except ValueError:
            continue
        if class_id in ids:
            out.append(vid)
    return out
