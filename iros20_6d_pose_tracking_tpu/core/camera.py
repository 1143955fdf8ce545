"""Pinhole camera model and projection helpers.

Reference parity: ``cam_K_from_dict`` (reference Utils.py:444-447),
``project_points`` (reference predict.py:81-86).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Camera:
    """Pinhole intrinsics. fx/fy/cx/cy in pixels; width/height in pixels."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )

    @staticmethod
    def from_dict(cam_cfg: dict) -> "Camera":
        """Build from the reference dataset_info 'camera' dict
        (reference Utils.py:444-447 + dataset_info.yml:1-7)."""
        return Camera(
            fx=float(cam_cfg["focalX"]),
            fy=float(cam_cfg["focalY"]),
            cx=float(cam_cfg["centerX"]),
            cy=float(cam_cfg["centerY"]),
            width=int(cam_cfg.get("width", 640)),
            height=int(cam_cfg.get("height", 480)),
        )


def cam_K_from_dict(cam_cfg: dict) -> np.ndarray:
    """3x3 K from a dataset_info camera dict (reference Utils.py:444-447)."""
    return Camera.from_dict(cam_cfg).K


def project_points(points: jax.Array, K: jax.Array) -> jax.Array:
    """Project (..., 3) camera-frame points to rounded int (u, v) pixels.

    Parity with reference predict.py:81-86 (round-to-nearest, int32).
    """
    us = points[..., 0] * K[0, 0] / points[..., 2] + K[0, 2]
    vs = points[..., 1] * K[1, 1] / points[..., 2] + K[1, 2]
    uv = jnp.stack([us, vs], axis=-1)
    return jnp.round(uv).astype(jnp.int32)


def project_points_f(points: jax.Array, K: jax.Array) -> jax.Array:
    """Float (u, v) projection (no rounding), for rasterization."""
    us = points[..., 0] * K[0, 0] / points[..., 2] + K[0, 2]
    vs = points[..., 1] * K[1, 1] / points[..., 2] + K[1, 2]
    return jnp.stack([us, vs], axis=-1)
