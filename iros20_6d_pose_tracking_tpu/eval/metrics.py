"""Pose-error metrics: ADD, ADD-S (ADI), VOCap AUC.

Parity targets:
  - ADD: mean L2 between correspondingly-transformed model points
    (reference Utils.py:72-82).
  - ADD-S / ADI: mean nearest-neighbour distance from gt-transformed to
    pred-transformed points (reference Utils.py:84-98; the reference uses
    a cKDTree with 10 threads — on TPU a brute-force pairwise-min over a
    few thousand points is a single fused matmul-shaped op, SURVEY.md
    "native components" table).
  - VOCap: area under the error-recall curve with a 0.1 m cutoff,
    x10 scaling (reference eval_ycb.py:45-64), computed exactly in numpy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST


def transform_points(pose: jax.Array, points: jax.Array) -> jax.Array:
    """(..., 4, 4) x (N, 3) -> (..., N, 3)."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return jnp.einsum("...ij,nj->...ni", R, points, precision=_PREC) + t[..., None, :]


@jax.jit
def add_err(pred: jax.Array, gt: jax.Array, points: jax.Array) -> jax.Array:
    """ADD error (reference Utils.py:72-82). Supports batched poses."""
    p = transform_points(pred, points)
    g = transform_points(gt, points)
    return jnp.linalg.norm(p - g, axis=-1).mean(axis=-1)


@jax.jit
def adi_err(pred: jax.Array, gt: jax.Array, points: jax.Array) -> jax.Array:
    """ADD-S error (reference Utils.py:84-98): for each gt point, distance
    to the NEAREST pred point; mean over gt points. Brute-force pairwise
    via the |a-b|^2 = |a|^2 + |b|^2 - 2ab expansion (MXU-friendly)."""
    p = transform_points(pred, points)  # (..., N, 3)
    g = transform_points(gt, points)
    p2 = jnp.sum(p * p, axis=-1)
    g2 = jnp.sum(g * g, axis=-1)
    cross = jnp.einsum("...nd,...md->...nm", g, p, precision=_PREC)
    d2 = g2[..., :, None] + p2[..., None, :] - 2.0 * cross
    nn = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
    return nn.mean(axis=-1)


def batch_errors(preds: np.ndarray, gts: np.ndarray, points: np.ndarray,
                 chunk: int = 256):
    """ADD + ADI for (T, 4, 4) pose arrays, chunked to bound memory."""
    adds, adis = [], []
    pts = jnp.asarray(points, jnp.float32)
    for s in range(0, len(preds), chunk):
        pr = jnp.asarray(preds[s : s + chunk], jnp.float32)
        gt = jnp.asarray(gts[s : s + chunk], jnp.float32)
        adds.append(np.asarray(add_err(pr, gt, pts)))
        adis.append(np.asarray(adi_err(pr, gt, pts)))
    return np.concatenate(adds), np.concatenate(adis)


def vocap(errors, max_val: float = 0.1) -> float:
    """VOCap AUC (reference eval_ycb.py:45-64), exact reimplementation:
    sort errors, precision_i = i/n, truncate at ``max_val``, rectangle-sum
    the running-max precision over recall gaps, scale by 1/max_val."""
    rec = np.sort(np.asarray(errors, dtype=np.float64))
    n = len(rec)
    if n == 0:
        return 0.0
    prec = np.arange(1, n + 1) / float(n)
    keep = rec < max_val
    rec = rec[keep]
    prec = prec[keep]
    mrec = np.concatenate([[0.0], rec, [max_val]])
    mpre = np.concatenate([[0.0], prec, [prec[-1] if len(prec) else 0.0]])
    for i in range(1, len(mpre)):
        mpre[i] = max(mpre[i], mpre[i - 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
    ap = np.sum((mrec[idx] - mrec[idx - 1]) * mpre[idx]) * (1.0 / max_val)
    return float(ap)


def load_points_xyz(path: str) -> np.ndarray:
    """Read a YCB ``points.xyz`` model file (reference eval_ycb.py:72-80)."""
    return np.loadtxt(path, dtype=np.float64).reshape(-1, 3)
