"""Multi-hypothesis tracking and track-health scoring.

The reference scaffolds a ``samples`` parameter but only ever evaluates
hypothesis 0 (reference predict.py:229-231,293-296). Here the feature is
real and TPU-shaped:

  - ``track_step_multi``: vmap the fused track step over N perturbed
    pose hypotheses in one compiled program (the CNN runs as one batch-N
    forward), then select the winner by geometric agreement between the
    re-rendered estimate and the observed depth.
  - ``depth_agreement``: the selection metric — fraction of rendered
    pixels whose depth matches the observed crop within a tolerance.
    Doubles as a per-frame TRACK-HEALTH score: the reference has no
    failure detection beyond manual re-initialization
    (reference predict.py:539-541, SURVEY.md section 5); thresholding
    this score gives an automatic drift signal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import se3
from ..ops import roi as roi_ops
from ..render import rasterizer as rz
from . import tracker as trk


def depth_agreement(
    mesh: rz.MeshArrays,
    pose: jax.Array,
    K: jax.Array,
    frame_depth_mm: jax.Array,
    cfg: trk.TrackerConfig,
    tol_mm: float = 20.0,
    frame_offset_vu: jax.Array | None = None,
    score_res: int | None = None,
):
    """Render-vs-observed depth consistency in the pose's ROI.

    Returns a score in [0, 1]: over pixels where the render says the
    object is, the fraction whose observed depth lies within ``tol_mm``.
    Occluded-object pixels (observed closer than rendered) are excluded
    from the denominator so partial occlusion doesn't read as drift.
    ``frame_offset_vu``: (row, col) of the frame's origin in full-image
    coordinates when only a sub-window was uploaded (tracking/stream.py).
    ``score_res``: ROI resolution for the scoring render/crop (default
    ``cfg.resolution``). The score is a pixel FRACTION, so half
    resolution changes it only at silhouette edges while cutting the
    per-hypothesis scoring render cost ~4x — the batched multi-
    hypothesis path uses this (track_step_multi).
    """
    r = int(score_res or cfg.resolution)
    res = (r, r)
    bbox = roi_ops.compute_bbox(pose, K, cfg.object_width_mm,
                                (1000.0, 1000.0, 1000.0))
    window = rz.window_from_bbox(bbox)
    bbox_local = bbox if frame_offset_vu is None else (
        bbox - frame_offset_vu[None, :].astype(jnp.int32))
    _, depth_r = rz.render(mesh, pose, K, window, out_hw=res,
                           near=cfg.near, far=cfg.far, impl=cfg.render_impl,
                           cull_backfaces=cfg.cull_backfaces,
                           fuse_pass2=cfg.fuse_pass2)
    depth_o = roi_ops.crop_resize_nearest(
        frame_depth_mm,
        jnp.min(bbox_local[:, 0]), jnp.min(bbox_local[:, 1]),
        jnp.max(bbox_local[:, 0]) - jnp.min(bbox_local[:, 0]),
        jnp.max(bbox_local[:, 1]) - jnp.min(bbox_local[:, 1]),
        res,
    )
    rendered = depth_r > 0
    observed = depth_o > 100.0
    sil = rendered & observed  # silhouette pixels with a valid observation
    occluded = sil & (depth_o < depth_r - tol_mm)
    denom_mask = sil & ~occluded
    # Soft agreement: 1 at zero depth error, linearly down to 0 at tol_mm.
    # A binary <=tol match would score every pose within the tolerance
    # identically (a 17 mm-wrong pose would tie a perfect one), which
    # breaks hypothesis selection; the soft score stays discriminative.
    w = jnp.clip(1.0 - jnp.abs(depth_r - depth_o) / tol_mm, 0.0, 1.0)
    # Occluded pixels are excused from the denominator, but only up to
    # 75% of the silhouette: if "occlusion" explains nearly everything,
    # the pose is simply wrong (e.g. too far -> observation uniformly
    # nearer), and the score must collapse rather than divide 3/3.
    denom = jnp.maximum(
        jnp.sum(denom_mask.astype(jnp.float32)),
        0.25 * jnp.sum(sil.astype(jnp.float32)),
    )
    score = jnp.sum(jnp.where(denom_mask, w, 0.0)) / jnp.maximum(denom, 1.0)
    # No overlap at all -> zero confidence.
    any_overlap = jnp.sum(sil.astype(jnp.float32)) > 16.0
    return jnp.where(any_overlap, score, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("model", "cfg", "samples"))
def track_step_multi(
    model,
    cfg: trk.TrackerConfig,
    variables,
    mesh: rz.MeshArrays,
    K: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    prev_pose: jax.Array,
    frame_rgb: jax.Array,
    frame_depth_mm: jax.Array,
    key: jax.Array,
    samples: int = 4,
    perturb_trans: float = 0.01,
    perturb_rot_deg: float = 5.0,
    frame_offset_vu: jax.Array | None = None,
):
    """Multi-hypothesis update: hypothesis 0 is the previous pose, the
    rest are se(3) perturbations of it; all N run through the fused step
    (batched CNN), and the depth-agreement winner is returned.

    Returns (pose, score, aux) where score is the winner's health.
    """
    if samples > 1:
        perturb = se3.random_gaussian_magnitude(
            key, perturb_trans, perturb_rot_deg, (samples - 1,)
        )
        poses_rest = prev_pose[None] @ perturb
        hypo = jnp.concatenate([prev_pose[None], poses_rest], axis=0)
    else:
        hypo = prev_pose[None]

    def one(p):
        new_pose, _ = trk.track_step(
            model, cfg, variables, mesh, K, mean, std, p, frame_rgb,
            frame_depth_mm, frame_offset_vu=frame_offset_vu,
        )
        # Score at half resolution, floored at 88 px: the scoring render
        # is ~4x cheaper and the pixel-fraction metric only shifts at
        # silhouette edges. ROIs already <= 88 px keep full resolution
        # (at tiny sizes the edge share would dominate the score).
        score = depth_agreement(
            mesh, new_pose, K, frame_depth_mm, cfg,
            frame_offset_vu=frame_offset_vu,
            score_res=min(cfg.resolution, max(88, cfg.resolution // 2)))
        return new_pose, score

    new_poses, scores = jax.vmap(one)(hypo)
    best = jnp.argmax(scores)
    return new_poses[best], scores[best], {"scores": scores,
                                           "poses": new_poses}


@functools.partial(jax.jit, static_argnames=("model", "cfg", "samples"))
def track_video_multi(
    model,
    cfg: trk.TrackerConfig,
    variables,
    mesh: rz.MeshArrays,
    K: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    init_pose: jax.Array,
    frames_rgb: jax.Array,
    frames_depth_mm: jax.Array,
    key: jax.Array,
    samples: int = 4,
):
    """Whole-video multi-hypothesis tracking under ``lax.scan``: every
    frame refines N perturbed hypotheses in one batched program (the CNN
    runs batch-N — finally feeding the MXU at inference) and carries the
    depth-agreement winner. Returns (poses (T,4,4), health scores (T,))
    — the productized version of the reference's ``samples`` scaffold
    (reference predict.py:229-231)."""

    def step(carry, frame):
        pose, k = carry
        k, sub = jax.random.split(k)
        rgb, depth = frame
        new_pose, score, _ = track_step_multi(
            model, cfg, variables, mesh, K, mean, std, pose, rgb, depth,
            sub, samples=samples,
        )
        return (new_pose, k), (new_pose, score)

    (_, _), (poses, scores) = trk.frame_scan(
        step, (init_pose, key), (frames_rgb, frames_depth_mm)
    )
    return poses, scores


class ReinitPolicy:
    """Automatic drift handling: when health drops below ``threshold``
    for ``patience`` consecutive frames, report tracking lost so the
    caller can re-initialize (the reference's only recovery is manual
    --reinit_frames, predict.py:539-541)."""

    def __init__(self, threshold: float = 0.3, patience: int = 3):
        self.threshold = threshold
        self.patience = patience
        self.bad_streak = 0

    def update(self, score: float) -> bool:
        """Returns True when tracking should be re-initialized."""
        if score < self.threshold:
            self.bad_streak += 1
        else:
            self.bad_streak = 0
        return self.bad_streak >= self.patience


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def track_video_with_health(
    model,
    cfg: trk.TrackerConfig,
    variables,
    mesh: rz.MeshArrays,
    K: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    init_pose: jax.Array,
    frames_rgb: jax.Array,
    frames_depth_mm: jax.Array,
):
    """track_video plus a per-frame depth-agreement health score —
    production telemetry for automatic drift detection (apply
    :class:`ReinitPolicy` to the scores host-side)."""

    def step(pose, frame):
        rgb, depth = frame
        new_pose, _ = trk.track_step(
            model, cfg, variables, mesh, K, mean, std, pose, rgb, depth
        )
        score = depth_agreement(mesh, new_pose, K, depth, cfg)
        return new_pose, (new_pose, score)

    _, (poses, scores) = trk.frame_scan(
        step, init_pose, (frames_rgb, frames_depth_mm)
    )
    return poses, scores
