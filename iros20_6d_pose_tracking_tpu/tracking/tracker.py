"""The fused render->crop->normalize->CNN->compose tracking step.

This is the framework's flagship path: the reference's per-frame pipeline
(reference predict.py:217-296 ``Tracker.on_track``) crosses the host/GPU
boundary several times per frame (GL render + readback, cv2 crop, CUDA
forward, numpy pose update). Here the ENTIRE step is one jitted XLA
program; video tracking runs the step under ``jax.lax.scan`` with the pose
as carried state (the temporal recurrence is inherently sequential —
SURVEY.md section 5 "long-context" note).

Preprocessing parity:
  - ROI: square ``object_width`` mm bbox at the projected previous pose
    (reference Utils.py:302-316, predict.py:232).
  - B branch: nearest crop-resize of the observed RGB-D
    (reference Utils.py:320-359).
  - A branch: ROI-windowed render of the CAD model at the previous pose
    (reference predict.py:193-215).
  - OffsetDepth: subtract pose z (mm), invalid->2000
    (reference data_augmentation.py:124-144).
  - NormalizeChannels with the 8-channel training mean/std
    (reference data_augmentation.py:148-164).
  - Pose decode: tanh outputs x normalizers, Rodrigues compose
    (reference datasets.py:159-175).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..models import tracknet
from ..ops import roi as roi_ops
from ..ops import depthproc
from ..render import rasterizer as rz
from ..render.mesh import TriMesh


@dataclass(frozen=True)
class TrackerConfig:
    """Static configuration of the tracking step (hashable for jit)."""

    resolution: int = 176
    trans_normalizer: float = 0.03          # reference predict.py:128 default
    rot_normalizer: float = 5 * np.pi / 180
    object_width_mm: float = 250.0          # diameter*1000*(1+bbox%) predict.py:136-142
    near: float = rz.NEAR_M
    far: float = rz.FAR_M
    dtype: Any = jnp.float32                # bf16 on TPU for the CNN
    render_impl: str = "xla"                # 'pallas' on TPU hardware
    cull_backfaces: bool = False            # True for closed CAD meshes:
                                            # ~halves pass-1 raster work
    fuse_pass2: bool = False                # pallas impl only: one-hot MXU
                                            # gather kernel for pass 2
                                            # (bit-exact vs jnp.take)


def default_render_impl() -> str:
    """Auto renderer selection — delegates to rasterizer.default_impl()
    (the single source of truth; Tracker, the synthetic samplers, and
    eval/synthetic_benchmark all use it)."""
    return rz.default_impl()


def pack_channels(rgb, depth):
    """RGB (H,W,3) + depth (H,W) -> (H,W,4) float32 (reference
    data_augmentation.py:175-196 ToTensor, NHWC instead of CHW)."""
    return jnp.concatenate([rgb, depth[..., None]], axis=-1).astype(jnp.float32)


def normalize_pair(rgbA, depthA, rgbB, depthB, poseA, mean, std):
    """OffsetDepth + NormalizeChannels + pack, both branches.

    mean/std are the 8-channel training statistics (A rgbd, B rgbd) —
    reference train.py:106-125 / data_augmentation.py:148-164.
    """
    dA = depthproc.offset_depth(depthA, poseA)
    dB = depthproc.offset_depth(depthB, poseA)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    bufA = pack_channels(rgbA, dA)
    bufB = pack_channels(rgbB, dB)
    bufA = (bufA - mean[:4]) / std[:4]
    bufB = (bufB - mean[4:]) / std[4:]
    return bufA, bufB


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def track_step(
    model: tracknet.Se3TrackNet,
    cfg: TrackerConfig,
    variables,
    mesh: rz.MeshArrays,
    K: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    prev_pose: jax.Array,
    frame_rgb: jax.Array,
    frame_depth_mm: jax.Array,
    object_width_mm: jax.Array | None = None,
    frame_offset_vu: jax.Array | None = None,
):
    """One tracking update. All device-side; returns the new 4x4 pose.

    Args:
      prev_pose: (4, 4) previous object-in-camera estimate.
      frame_rgb: (H, W, 3) current frame; uint8 or float32 in [0, 255].
        Transfer frames as uint8 — the cast to float32 happens on device
        AFTER the ROI gather, so the host->device copy is 4x smaller
        (the reference uploads float32 CUDA tensors, predict.py:267).
      frame_depth_mm: (H, W) current depth in millimetres (uint16 or
        float32).
      object_width_mm: optional traced override of the config's ROI width
        (used by the multi-object ensemble path, where the width differs
        per vmapped object and therefore cannot be static).
      frame_offset_vu: optional (2,) int32 (row, col) position of
        ``frame_rgb``'s origin inside the full camera image. Used by the
        windowed streaming path (tracking/stream.py) which uploads only a
        sub-window around the object: the ROI is computed in full-image
        coordinates and shifted into window coordinates here.

    Returns:
      new_pose (4, 4), plus a dict of intermediates for debugging/viz.
    """
    res = (cfg.resolution, cfg.resolution)
    width = cfg.object_width_mm if object_width_mm is None else object_width_mm
    bbox = roi_ops.compute_bbox(
        prev_pose, K, width, (1000.0, 1000.0, 1000.0)
    )
    bbox_local = bbox if frame_offset_vu is None else (
        bbox - frame_offset_vu[None, :].astype(jnp.int32)
    )
    # Observed branch (B): crop + nearest-resize the real frame. The
    # gather runs in the transfer dtype; only the (res, res) crop is cast.
    rgbB, depthB = roi_ops.crop_bbox(frame_rgb, frame_depth_mm, bbox_local,
                                     res)
    rgbB = rgbB.astype(jnp.float32)
    depthB = depthB.astype(jnp.float32)
    # Rendered branch (A): rasterize the CAD model straight into the window.
    window = rz.window_from_bbox(bbox)
    rgbA, depthA = rz.render(
        mesh, prev_pose, K, window, out_hw=res, near=cfg.near, far=cfg.far,
        impl=cfg.render_impl, cull_backfaces=cfg.cull_backfaces,
        fuse_pass2=cfg.fuse_pass2,
    )
    bufA, bufB = normalize_pair(rgbA, depthA, rgbB, depthB, prev_pose, mean, std)
    out = model.apply(variables, bufA[None], bufB[None], train=False)
    new_pose = se3.decode_delta(
        prev_pose,
        out["trans"][0],
        out["rot"][0],
        cfg.trans_normalizer,
        cfg.rot_normalizer,
    )
    aux = {"rgbA": rgbA, "depthA": depthA, "rgbB": rgbB, "depthB": depthB,
           "trans": out["trans"][0], "rot": out["rot"][0]}
    return new_pose, aux


def frame_scan(step, init_carry, xs):
    """``lax.scan`` over the leading (time) axis, emitted as a NESTED
    scan — an outer scan of T singleton inner scans. The transform is
    exactly equivalent to a flat scan (same carries/outputs, pinned by
    tests/test_tracker.py::test_frame_scan_matches_flat_scan; the full
    tracking program measured bit-identical on TPU, float-ulp close on
    CPU where fusion differs); the reshapes are singleton-axis views,
    so no data moves.

    Why: on a SHARED TPU (the multi-tenant tunnel this was built
    against), one contended window measured the flagship 100-frame
    tracking scan at **85 Hz flat vs 750 Hz nested in the same
    minutes**, with the nested form matching the quiet-hour flat rate
    (724-760 Hz), i.e. neutral when the device is idle — so the nested
    emission is kept. It is NOT a general contention shield: the r4
    record hour collapsed the nested scan too (727.9 -> 95.5 Hz) while
    per-frame dispatch of the same step was untouched. Degradation has
    multiple modes and no static emission wins them all — runtime mode
    selection does (tracking/dispatch.py::AdaptiveVideoTracker). See
    docs/KERNEL.md "Dispatch-length sensitivity (r5)".
    """
    xs1 = jax.tree.map(lambda x: x[:, None], xs)

    def outer(carry, x1):
        return jax.lax.scan(step, carry, x1)

    carry, ys = jax.lax.scan(outer, init_carry, xs1)
    return carry, jax.tree.map(
        lambda y: y.reshape((y.shape[0],) + y.shape[2:]), ys)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def track_video(
    model: tracknet.Se3TrackNet,
    cfg: TrackerConfig,
    variables,
    mesh: rz.MeshArrays,
    K: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    init_pose: jax.Array,
    frames_rgb: jax.Array,       # (T, H, W, 3) uint8 or float32
    frames_depth_mm: jax.Array,  # (T, H, W) uint16 or float32 (mm)
    object_width_mm: jax.Array | None = None,
):
    """Track a preloaded video with ``lax.scan`` (one compile, zero host
    round-trips). Returns (T, 4, 4) per-frame poses — the output protocol
    the eval drivers save as txt (reference predict.py:564). Keep the
    frames uint8/uint16 so both the H2D transfer and the HBM residency are
    minimal; casts happen per-ROI inside the step. The scan is emitted
    nested (:func:`frame_scan`) for shared-device contention immunity."""

    def step(pose, frame):
        rgb, depth = frame
        new_pose, _ = track_step(
            model, cfg, variables, mesh, K, mean, std, pose, rgb, depth,
            object_width_mm,
        )
        return new_pose, new_pose

    _, poses = frame_scan(step, init_pose, (frames_rgb, frames_depth_mm))
    return poses


@functools.partial(jax.jit, static_argnames=("cfg",))
def roi_views(
    cfg: TrackerConfig,
    mesh: rz.MeshArrays,
    K: jax.Array,
    pose: jax.Array,
    frame_rgb: jax.Array,
    frame_depth_mm: jax.Array,
):
    """The (rendered A, cropped B) ROI pair at a pose — the side-by-side
    canvas the reference shows live every frame (reference
    predict.py:284-291). Viz-only: no CNN, no normalization."""
    res = (cfg.resolution, cfg.resolution)
    bbox = roi_ops.compute_bbox(pose, K, cfg.object_width_mm,
                                (1000.0, 1000.0, 1000.0))
    rgbB, depthB = roi_ops.crop_bbox(frame_rgb, frame_depth_mm, bbox, res)
    rgbA, depthA = rz.render(
        mesh, pose, K, rz.window_from_bbox(bbox), out_hw=res,
        near=cfg.near, far=cfg.far, impl=cfg.render_impl,
        cull_backfaces=cfg.cull_backfaces,
    )
    return rgbA, depthA, rgbB.astype(jnp.float32), depthB.astype(jnp.float32)


class Tracker:
    """Host-facing tracker with the reference's API shape
    (reference predict.py:127-296).

    Construction mirrors ``Tracker(dataset_info, images_mean, images_std,
    ckpt_dir, model_path, trans_normalizer, rot_normalizer)``; per-frame
    usage mirrors ``on_track(prev_pose, rgb, depth, ...) -> 4x4 pose``.
    """

    def __init__(
        self,
        dataset_info: dict,
        images_mean: np.ndarray,
        images_std: np.ndarray,
        ckpt_dir: str | None = None,
        model_path: str | None = None,
        trans_normalizer: float = 0.03,
        rot_normalizer: float = 5 * np.pi / 180,
        mesh: TriMesh | None = None,
        variables=None,
        dtype=jnp.float32,
        max_faces: int | None = None,
        render_impl: str | None = None,
        cull_backfaces: bool | None = None,
        persistent_cache: bool = True,
    ):
        from ..render import mesh as mesh_mod

        if persistent_cache:
            # Deployment warm start: later processes replay this process's
            # XLA executables instead of paying the multi-second first-call
            # compile (utils/cache.py; opt out with persistent_cache=False
            # or JAX_NO_PERSISTENT_CACHE=1).
            from ..utils.cache import enable_persistent_cache

            enable_persistent_cache()

        self.dataset_info = dataset_info
        res = int(dataset_info["resolution"])
        cam = dataset_info["camera"]
        self.K = jnp.array(
            [
                [cam["focalX"], 0, cam["centerX"]],
                [0, cam["focalY"], cam["centerY"]],
                [0, 0, 1],
            ],
            jnp.float32,
        )

        if mesh is None:
            if model_path is None:
                raise ValueError("need model_path or a prebuilt mesh")
            mesh = mesh_mod.load_mesh(model_path)
        if max_faces is not None and mesh.num_faces > max_faces:
            # Rasterization cost is linear in face count; production CAD
            # scans usually carry far more triangles than a 176x176 ROI
            # resolves. Width/ADD points still come from the FULL mesh.
            if mesh.texture is not None and mesh.face_uvs is not None:
                # UV-preserving decimation: per-corner UVs ride the
                # surviving faces through vertex clustering (seams need
                # no special casing), so the decimated mesh keeps full
                # perspective-correct texture sampling instead of a
                # lossy vertex-color bake (render/mesh.py::decimate).
                v, f, c, fuv = mesh_mod.decimate(
                    mesh.verts, mesh.faces[: mesh.num_faces], None,
                    max_faces, face_uvs=mesh.face_uvs[: mesh.num_faces],
                )
                render_mesh = mesh_mod.build_trimesh(
                    v, f, c, face_uvs=fuv, texture=mesh.texture)
            else:
                v, f, c = mesh_mod.decimate(
                    mesh.verts, mesh.faces[: mesh.num_faces], mesh.colors,
                    max_faces,
                )
                render_mesh = mesh_mod.build_trimesh(v, f, c)
        else:
            render_mesh = mesh
        self.trimesh = mesh
        self.mesh = rz.upload(render_mesh)

        # object width: cloud diameter (voxel-downsampled 5mm) + bbox% pad,
        # reference predict.py:131-142.
        if "object_width" in dataset_info:
            object_width = float(dataset_info["object_width"])
        else:
            cloud = mesh_mod.voxel_down_sample(mesh.verts, 0.005)
            self.object_cloud = cloud
            max_width = mesh_mod.compute_obj_max_width(cloud)
            pad = dataset_info.get("boundingbox", 0.0)
            object_width = max_width * (1.0 + pad / 100.0)
        self.object_width = object_width

        if render_impl is None:
            render_impl = default_render_impl()
        # Watertight meshes with OUTWARD shading normals get backface
        # culling for free (output-identical, ~1.4x faster pass 1 —
        # rasterizer.py cull). Inward-normal exports must not auto-cull:
        # the normal-oriented mask would keep the far surface.
        if cull_backfaces is None:
            real_faces = render_mesh.faces[: render_mesh.num_faces]
            cull_backfaces = mesh_mod.is_closed(
                render_mesh.verts, real_faces
            ) and mesh_mod.is_outward_oriented(
                render_mesh.verts, real_faces, render_mesh.normals)
        self.cfg = TrackerConfig(
            resolution=res,
            trans_normalizer=float(trans_normalizer),
            rot_normalizer=float(rot_normalizer),
            object_width_mm=float(object_width),
            dtype=dtype,
            render_impl=render_impl,
            cull_backfaces=bool(cull_backfaces),
        )
        self.model = tracknet.Se3TrackNet(image_size=res, dtype=dtype)

        if variables is not None:
            self.variables = variables
        elif ckpt_dir is not None:
            self.variables = _load_any_checkpoint(ckpt_dir)
        else:
            self.variables = tracknet.init_variables(
                self.model, jax.random.PRNGKey(0)
            )

        self.mean = jnp.asarray(images_mean, jnp.float32)
        self.std = jnp.asarray(images_std, jnp.float32)
        self.frame_cnt = 0
        self.errs: list = []
        self.prev_rgb = None
        self.prev_depth = None

    @classmethod
    def from_parts(cls, model, cfg: TrackerConfig, variables, mesh, K,
                   mean, std):
        """Assemble a Tracker from prebuilt pieces (benchmarks, tests,
        programmatic pipelines that never touch dataset_info/files).
        Keeps every __init__-established invariant in one place instead
        of callers hand-setting attributes via ``__new__``."""
        t = cls.__new__(cls)
        t.dataset_info = None
        t.model = model
        t.cfg = cfg
        t.variables = variables
        t.mesh = mesh
        t.trimesh = None
        t.K = jnp.asarray(K, jnp.float32)
        t.object_width = cfg.object_width_mm
        t.mean = jnp.asarray(mean, jnp.float32)
        t.std = jnp.asarray(std, jnp.float32)
        t.frame_cnt = 0
        t.errs = []
        t.prev_rgb = None
        t.prev_depth = None
        return t

    def on_track(
        self,
        prev_pose: np.ndarray,
        current_rgb: np.ndarray,
        current_depth,
        gt_A_in_cam=None,
        gt_B_in_cam=None,
        debug: bool = False,
        samples: int = 1,
    ) -> np.ndarray:
        """One tracking update; depth in metres (float) or millimetres
        (uint16), auto-detected like the reference's mm convention.

        ``samples > 1`` runs real multi-hypothesis tracking (the reference
        scaffolds this parameter but evaluates only hypothesis 0,
        reference predict.py:229-231): N perturbed priors are refined in
        one batched program and the depth-agreement winner is kept; the
        winner's health score lands in ``self.last_score``.
        """
        depth = np.asarray(current_depth)
        if np.issubdtype(depth.dtype, np.floating) and depth.size and \
                float(depth.max()) < 100.0:
            depth = (depth * 1000.0).astype(np.float32)  # metres -> mm
        if samples > 1:
            from . import hypotheses as hy

            new_pose, score, aux = hy.track_step_multi(
                self.model, self.cfg, self.variables, self.mesh, self.K,
                self.mean, self.std,
                jnp.asarray(prev_pose, jnp.float32),
                jnp.asarray(current_rgb),   # uint8 stays uint8 over the
                jnp.asarray(depth),         # wire, same as samples=1
                jax.random.PRNGKey(self.frame_cnt),
                samples=samples,
            )
            self.last_score = float(score)
        else:
            new_pose, aux = track_step(
                self.model,
                self.cfg,
                self.variables,
                self.mesh,
                self.K,
                self.mean,
                self.std,
                jnp.asarray(prev_pose, jnp.float32),
                jnp.asarray(current_rgb),  # uint8 stays uint8 over the wire
                jnp.asarray(depth),
            )
        self.prev_rgb = current_rgb
        self.prev_depth = depth
        self.frame_cnt += 1
        if debug:
            self.last_aux = jax.tree.map(np.asarray, aux)
        return np.asarray(new_pose)

    def track_video(self, init_pose, frames_rgb, frames_depth_mm):
        """Whole-video scan (preloaded frames). Returns (T, 4, 4) numpy.
        Frames keep their dtype across the host boundary — pass uint8 RGB
        and uint16 depth for 6x less transfer than float32."""
        poses = track_video(
            self.model,
            self.cfg,
            self.variables,
            self.mesh,
            self.K,
            self.mean,
            self.std,
            jnp.asarray(init_pose, jnp.float32),
            jnp.asarray(frames_rgb),
            jnp.asarray(frames_depth_mm),
        )
        return np.asarray(poses)

    def track_video_adaptive(self, init_pose, rgb_source, depth_source,
                             n_frames: int | None = None,
                             chunk_size: int = 100,
                             candidates=(100, 10, 1), samples: int = 1,
                             dispatcher=None):
        """Bounded-memory whole-video tracking with RUNTIME selection of
        the dispatch granularity (tracking/dispatch.py): the fused scan
        is the fastest mode on a healthy device but collapses ~7x under
        shared-device contention, where per-frame dispatch of the same
        step is barely touched — so the product probes candidate
        granularities on the video's first frames (real work, poses
        kept) and runs the rest in whichever is fastest THIS hour,
        re-probing if the rate collapses mid-video.

        Returns (poses (T,4,4), telemetry dict). Pass a prebuilt
        ``dispatcher`` (AdaptiveVideoTracker) to reuse its compiled
        programs and probe state across videos.
        """
        from .dispatch import AdaptiveVideoTracker

        d = dispatcher or AdaptiveVideoTracker(
            self, candidates=candidates, samples=samples)
        poses, scores = d.track(init_pose, rgb_source, depth_source,
                                n_frames=n_frames, chunk_size=chunk_size)
        tel = d.telemetry()
        if scores is not None:
            tel["scores"] = scores
        return poses, tel

    def track_video_chunked(self, init_pose, rgb_source, depth_source,
                            chunk_size: int = 64, n_frames: int | None = None):
        """Bounded-memory whole-video tracking: stream the video through
        the fused ``lax.scan`` in fixed-size chunks, carrying the pose on
        device between chunks.

        The reference streams frame-by-frame from disk (reference
        predict.py:529-534); the round-1 scan path instead preloaded the
        whole sequence (7+ GB for a real 2000-frame YCB video at float32 —
        past v5e HBM). Chunking keeps HBM residency at
        ``chunk_size x (uint8 RGB + uint16 depth)`` (~100 MB at 64 frames)
        while preserving scan-level throughput: the next chunk's host load
        (background thread) and H2D transfer overlap the current chunk's
        compute, and only (chunk, 4, 4) poses come back per chunk.

        Args:
          rgb_source / depth_source: (T, H, W[, 3]) arrays, or callables
            ``f(start, stop) -> np.ndarray`` (e.g. lazy PNG decoders).
          n_frames: required when the sources are callables.

        Returns (T, 4, 4) float32 poses; bitwise-identical to a single
        whole-video scan (tests/test_tracker.py).
        """
        import concurrent.futures as cf

        if n_frames is None:
            assert not callable(rgb_source), "n_frames required with callables"
            n_frames = len(rgb_source)
        if n_frames == 0:
            return np.zeros((0, 4, 4), np.float32)
        get_rgb = rgb_source if callable(rgb_source) else \
            (lambda a, b: rgb_source[a:b])
        get_depth = depth_source if callable(depth_source) else \
            (lambda a, b: depth_source[a:b])

        def load(a, b):
            rgb = np.ascontiguousarray(get_rgb(a, b))
            dep = np.ascontiguousarray(get_depth(a, b))
            pad = chunk_size - (b - a)
            if pad:  # repeat the last frame so every chunk compiles once
                rgb = np.concatenate([rgb, np.repeat(rgb[-1:], pad, 0)])
                dep = np.concatenate([dep, np.repeat(dep[-1:], pad, 0)])
            return rgb, dep

        pose_dev = jnp.asarray(init_pose, jnp.float32)
        out = []
        starts = list(range(0, n_frames, chunk_size))
        with cf.ThreadPoolExecutor(1) as ex:
            fut = ex.submit(load, starts[0],
                            min(starts[0] + chunk_size, n_frames))
            for i, a in enumerate(starts):
                b = min(a + chunk_size, n_frames)
                rgb_np, dep_np = fut.result()
                if i + 1 < len(starts):
                    a2 = starts[i + 1]
                    fut = ex.submit(load, a2, min(a2 + chunk_size, n_frames))
                poses = track_video(
                    self.model, self.cfg, self.variables, self.mesh,
                    self.K, self.mean, self.std, pose_dev,
                    jax.device_put(rgb_np), jax.device_put(dep_np),
                )
                pose_dev = poses[b - a - 1]
                out.append(np.asarray(poses[: b - a]))
        return np.concatenate(out, axis=0)


def _load_any_checkpoint(path: str):
    """Load Flax-native (train/checkpoint.py) or reference .pth.tar."""
    if path.endswith((".pth", ".tar")) or ".pth." in path:
        from ..models.torch_import import load_reference_checkpoint

        return load_reference_checkpoint(path)
    from ..train.checkpoint import load_checkpoint

    state = load_checkpoint(path)
    return {"params": state["params"], "batch_stats": state["batch_stats"]}
