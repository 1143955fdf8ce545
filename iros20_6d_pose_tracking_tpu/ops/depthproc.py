"""Depth-channel preprocessing: pose-z offset normalization and hole filling.

Parity targets:
  - ``offset_depth``: reference data_augmentation.py:124-144 ``OffsetDepth``
    — subtract pose z (m -> mm) from valid depth, pin invalid
    (<=100mm or >=2000mm) to 2000.
  - ``fill_depth``: reference Utils.py:455-514 — inversion + masked dilation
    + closing + hole fill + median + bilateral smoothing, the ROS node's
    depth repair (reference predict_ros.py:38-41).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import image as I

DEPTH_INVALID_MM = 2000.0
DEPTH_MIN_MM = 100.0

_CROSS_KERNEL_5 = np.array(
    [
        [0, 0, 1, 0, 0],
        [0, 1, 1, 1, 0],
        [1, 1, 1, 1, 1],
        [0, 1, 1, 1, 0],
        [0, 0, 1, 0, 0],
    ],
    dtype=np.uint8,
)


def offset_depth(depth_mm: jax.Array, pose: jax.Array) -> jax.Array:
    """Subtract the object's camera-frame z from depth; pin invalid to 2000.

    ``depth_mm`` is float depth in millimetres; ``pose`` is the 4x4 prior
    (A) pose. Handles the reference's GL-pose special case (z<0 adds
    instead of subtracts, reference data_augmentation.py:137-140).
    """
    depth = depth_mm.astype(jnp.float32)
    invalid = (depth <= DEPTH_MIN_MM) | (depth >= DEPTH_INVALID_MM)
    z = pose[..., 2, 3] * 1000.0
    shifted = depth - jnp.abs(z)
    return jnp.where(invalid, DEPTH_INVALID_MM, shifted)


def fill_depth(
    depth_m: jax.Array,
    max_depth: float = 2.0,
    extrapolate: bool = False,
    blur_type: str = "bilateral",
) -> jax.Array:
    """Morphological depth hole filling; parity with reference Utils.py:455-514.

    ``depth_m`` is (H, W) float metres. Fully jittable.
    """
    depth = depth_m.astype(jnp.float32)
    valid = depth > 0.1
    depth = jnp.where(valid, max_depth - depth, depth)
    depth = I.dilate(depth, _CROSS_KERNEL_5)
    depth = I.morph_close(depth, np.ones((5, 5), np.uint8))

    empty = depth < 0.1
    dilated = I.dilate(depth, np.ones((7, 7), np.uint8))
    depth = jnp.where(empty, dilated, depth)

    if extrapolate:
        # Extend the highest valid pixel of each column to the image top.
        H = depth.shape[0]
        is_valid = depth > 0.1
        top_row = jnp.argmax(is_valid, axis=0)  # first valid row per column
        top_val = jnp.take_along_axis(depth, top_row[None, :], axis=0)[0]
        rows = jnp.arange(H)[:, None]
        above = rows < top_row[None, :]
        depth = jnp.where(above, top_val[None, :], depth)
        empty = depth < 0.1
        dilated = I.dilate(depth, np.ones((31, 31), np.uint8))
        depth = jnp.where(empty, dilated, depth)

    depth = I.median_blur(depth, 5)

    if blur_type == "bilateral":
        depth = I.bilateral_filter(depth, 5, 1.5, 2.0)
    elif blur_type == "gaussian":
        valid = depth > 0.1
        blurred = I.gaussian_blur(depth, 5, 0.0)
        depth = jnp.where(valid, blurred, depth)

    valid = depth > 0.1
    return jnp.where(valid, max_depth - depth, depth)
