"""Domain-shifted sensor model for the accuracy harness.

The synthetic accuracy suite's weakness (VERDICT r2 "Missing #1") is
renderer identity: the observed test video and the tracker's A branch come
from the same rasterizer with the same lighting constants, so the
render-vs-reality mismatch that makes the reference's real-data numbers
hard (reference eval_ycb.py:67-119 scores against real RGB-D keyframes) is
absent. This module breaks that identity on every axis a real camera
would:

  - **Lighting shift**: the observed video renders with DIFFERENT
    ambient/diffuse/light-position constants than the fixed ones the
    tracker's A branch uses (render/rasterizer.py AMBIENT/DIFFUSE/
    LIGHT_CAM) — the appearance gap between a CAD render and a lit scene.
  - **Photometric drift**: per-frame exposure and white-balance gains
    (slow sinusoids — auto-exposure/AWB hunting), gamma, RGB noise.
  - **Motion blur**: directional blur along the object's projected
    screen velocity.
  - **Depth sensor model**: quantization (structured-light disparity
    steps), edge dropout (occlusion shadows at depth discontinuities),
    low-frequency multiplicative warp (calibration bias), per-pixel
    noise, random dropout.
  - **Noisy initialization**: PoseCNN-grade init error
    (reference predict.py:89-123 uses PoseCNN results as init, which are
    centimetres/degrees off).

``long_horizon_eval`` adds the 500-frame closed-loop protocol: track with
per-frame depth-agreement health, re-initialize from a (noisy) external
pose whenever ReinitPolicy fires — the automated analog of the
reference's manual --reinit_frames (reference predict.py:539-541).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..data.dataset import _smooth_noise
from ..render import rasterizer as rz
from ..tracking import hypotheses as hy
from ..tracking import tracker as trk
from . import metrics as ME


@dataclass(frozen=True)
class SensorModel:
    """Static (hashable) description of the observation domain shift."""

    # lighting constants of the OBSERVED render (A branch keeps the
    # rasterizer defaults: ambient 0.65 / diffuse 0.4 / light (0,-.1,-.9)).
    # Chosen DARKER overall (max factor ~0.93 vs ~1.0) with a displaced
    # light: a same-brightness shift would mostly clip away at the
    # rasterizer's [0,1] shade clamp.
    ambient: float = 0.45
    diffuse: float = 0.48
    light_cam: tuple = (0.35, -0.45, -0.35)
    # photometric pipeline
    exposure_amp: float = 0.18     # peak exposure gain drift (x1±amp)
    wb_amp: float = 0.08           # peak per-channel white-balance drift
    gamma: float = 1.15
    rgb_noise_std: float = 3.0     # 0..255 scale
    motion_blur_px: float = 2.5    # max blur extent along screen velocity
    # depth sensor
    depth_quant_mm: float = 4.0
    edge_grad_mm: float = 30.0     # discontinuity threshold for dropout
    edge_dropout_prob: float = 0.7
    depth_warp_amp: float = 0.012  # low-frequency multiplicative warp
    depth_noise_mm: float = 2.0
    dropout_prob: float = 0.02
    # initialization error (PoseCNN grade)
    init_trans_m: float = 0.015
    init_rot_deg: float = 8.0
    # constant per-channel white-balance gain (texture-hostile shifts:
    # a strong fixed color cast attacks the UV-texture appearance cue
    # specifically — geometry/depth are untouched)
    wb_const: tuple = (1.0, 1.0, 1.0)

    def lighting(self):
        return jnp.asarray(
            [self.ambient, self.diffuse, *self.light_cam], jnp.float32)

    def scaled(self, s: float) -> "SensorModel":
        """The same shift at severity ``s`` (x0 = matched domain, x1 =
        this operating point, x2/x4 = progressively hostile). Every
        deviation-from-nominal scales together: lighting constants move
        s of the way from the rasterizer defaults (ambient 0.65 /
        diffuse 0.4 / light (0,-.1,-.9), render/rasterizer.py) to this
        model's values and beyond; additive amplitudes/noises scale
        linearly; probabilities saturate at 1; gamma scales in log space
        (gamma**s). Used by the severity-sweep evaluation to find where
        tracking degradation begins (a single mild operating point is
        not a robustness margin)."""
        import dataclasses

        def lerp(default, v):
            return default + s * (v - default)

        return dataclasses.replace(
            self,
            ambient=lerp(0.65, self.ambient),
            diffuse=lerp(0.4, self.diffuse),
            light_cam=tuple(
                lerp(d, v) for d, v in zip((0.0, -0.1, -0.9),
                                           self.light_cam)),
            exposure_amp=s * self.exposure_amp,
            wb_amp=s * self.wb_amp,
            gamma=float(self.gamma ** s),
            rgb_noise_std=s * self.rgb_noise_std,
            motion_blur_px=s * self.motion_blur_px,
            depth_quant_mm=max(s * self.depth_quant_mm, 1e-6),
            edge_dropout_prob=min(s * self.edge_dropout_prob, 1.0),
            depth_warp_amp=s * self.depth_warp_amp,
            depth_noise_mm=s * self.depth_noise_mm,
            dropout_prob=min(s * self.dropout_prob, 1.0),
            init_trans_m=s * self.init_trans_m,
            init_rot_deg=s * self.init_rot_deg,
            wb_const=tuple(lerp(1.0, v) for v in self.wb_const),
        )


def texture_hostile(base: SensorModel = SensorModel()) -> SensorModel:
    """A shift that attacks the appearance cue the UV-texture path relies
    on: a strong warm color cast (fixed white-balance error) plus doubled
    AWB hunting. Depth and geometry stay at the base operating point."""
    import dataclasses

    return dataclasses.replace(
        base, wb_const=(1.25, 1.0, 0.72), wb_amp=2.0 * base.wb_amp)


def _shift3(img, dy, dx):
    """Zero-padding integer shift (no wraparound ghosts)."""
    out = jnp.roll(img, (dy, dx), axis=(0, 1))
    H, W = img.shape[:2]
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    ok = ((yy - dy >= 0) & (yy - dy < H) & (xx - dx >= 0) & (xx - dx < W))
    return jnp.where(ok[..., None] if img.ndim == 3 else ok, out, 0.0)


@functools.partial(jax.jit, static_argnames=("sensor",))
def apply_sensor_model(key, rgb, depth_mm, vel_uv, frame_idx,
                       sensor: SensorModel):
    """One frame through the camera model. rgb (H,W,3) 0..255 f32,
    depth_mm (H,W) f32, vel_uv (2,) projected object velocity px/frame."""
    H, W = depth_mm.shape
    knoise, kdnoise, kdrop, kedge, kwarp = jax.random.split(key, 5)

    # --- motion blur along the screen velocity (5 integer-shift taps) ---
    speed = jnp.linalg.norm(vel_uv)
    ext = jnp.minimum(speed, sensor.motion_blur_px)
    direc = vel_uv / jnp.maximum(speed, 1e-6)
    taps = jnp.array([-1.0, -0.5, 0.0, 0.5, 1.0])
    offs = jnp.round(taps[:, None] * ext * direc[None, :]).astype(jnp.int32)

    def tap(c, o):
        return c + _shift3(rgb, o[1], o[0]), None

    acc, _ = jax.lax.scan(tap, jnp.zeros_like(rgb), offs)
    rgb = acc / 5.0

    # --- exposure / white balance drift + gamma + noise ---
    ph = frame_idx.astype(jnp.float32)
    exposure = 1.0 + sensor.exposure_amp * jnp.sin(2 * jnp.pi * ph / 97.0)
    wb = jnp.asarray(sensor.wb_const) + sensor.wb_amp * jnp.sin(
        2 * jnp.pi * ph / jnp.array([61.0, 83.0, 47.0])
        + jnp.array([0.0, 2.1, 4.2]))
    rgb = rgb * exposure * wb[None, None, :]
    rgb = 255.0 * jnp.power(jnp.clip(rgb / 255.0, 0.0, 1.0),
                            sensor.gamma)
    rgb = rgb + jax.random.normal(knoise, rgb.shape) * sensor.rgb_noise_std
    rgb = jnp.clip(rgb, 0.0, 255.0)

    # --- depth sensor ---
    valid = depth_mm > 0
    # low-frequency multiplicative warp (calibration bias)
    warp = 1.0 + (jax.image.resize(
        jax.random.uniform(kwarp, (4, 4)), (H, W), "bilinear") - 0.5) \
        * 2.0 * sensor.depth_warp_amp
    d = depth_mm * warp
    d = d + jax.random.normal(kdnoise, d.shape) * sensor.depth_noise_mm
    d = jnp.round(d / sensor.depth_quant_mm) * sensor.depth_quant_mm
    # edge dropout: depth discontinuities shadow the IR projector
    dmax = d
    dmin = jnp.where(valid, d, jnp.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            r = jnp.roll(d, (dy, dx), (0, 1))
            rv = jnp.roll(valid, (dy, dx), (0, 1))
            dmax = jnp.maximum(dmax, jnp.where(rv, r, 0.0))
            dmin = jnp.minimum(dmin, jnp.where(rv, r, jnp.inf))
    edge = (dmax - jnp.where(jnp.isfinite(dmin), dmin, dmax)) \
        > sensor.edge_grad_mm
    drop = edge & jax.random.bernoulli(kedge, sensor.edge_dropout_prob,
                                       d.shape)
    drop = drop | jax.random.bernoulli(kdrop, sensor.dropout_prob, d.shape)
    d = jnp.where(valid & ~drop, d, 0.0)
    return rgb, d


def screen_velocities(gt: np.ndarray, K: np.ndarray) -> np.ndarray:
    """(T, 2) per-frame projected object-center velocity in pixels."""
    t = gt[:, :3, 3]
    z = np.maximum(t[:, 2], 1e-6)
    u = t[:, 0] * K[0, 0] / z + K[0, 2]
    v = t[:, 1] * K[1, 1] / z + K[1, 2]
    uv = np.stack([u, v], -1)
    vel = np.zeros_like(uv)
    vel[1:] = uv[1:] - uv[:-1]
    return vel.astype(np.float32)


def shift_video(frames_rgb, frames_depth, gt, K,
                sensor: SensorModel = SensorModel(), seed: int = 0):
    """Apply the sensor model to a whole rendered video (vmapped)."""
    T = frames_rgb.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), T)
    vel = jnp.asarray(screen_velocities(np.asarray(gt), np.asarray(K)))
    idx = jnp.arange(T)
    rgb, depth = jax.vmap(
        lambda k, r, d, v, i: apply_sensor_model(k, r, d, v, i, sensor)
    )(keys, frames_rgb.astype(jnp.float32), frames_depth, vel, idx)
    return rgb, depth


def noisy_init_pose(key, pose, sensor: SensorModel = SensorModel()):
    """PoseCNN-grade perturbed initialization: EXACT requested
    translation/rotation magnitude in a uniform random direction (exact,
    not sampled-up-to, so every evaluation pays the full init error)."""
    k1, k2 = jax.random.split(key)
    dt = se3.random_direction(k1, ()) * sensor.init_trans_m
    w = se3.random_direction(k2, ()) * np.deg2rad(sensor.init_rot_deg)
    d = se3.make_pose(se3.so3_exp(w), dt)
    return jnp.asarray(pose, jnp.float32) @ d


def live_recovery_eval(obj, gt, frames_rgb, frames_depth, K, *,
                       samples: int = 4, threshold: float = 0.3,
                       patience: int = 2, refetch_every: int = 8,
                       seed: int = 33,
                       reinit_sensor: SensorModel = SensorModel(),
                       fail_at: int = 50, fail_len: int = 15,
                       pace_hz: float | None = 30.0) -> dict:
    """Forced-occlusion recovery through the LIVE path: StreamTracker
    with the background-thread ReinitPolicy + on_track_lost callback —
    the exact machinery ``predict --track_mode stream --auto_reinit``
    and the ROS node deploy (VERDICT r4 #4: the offline protocol's
    per-frame detection latency does not represent the live design,
    whose policy sees ONE health sample per background fetch, so
    latency is quantized by ``patience x refetch_every`` plus the fetch
    round-trip).

    A ``fail_len``-frame blackout burst starts at tracked frame
    ``fail_at``. The external detector (the callback) is blind during
    the burst (returns None); at the first clear-frame fire it returns
    a PoseCNN-grade noisy gt pose, which the stream applies at its next
    push. ``pace_hz`` paces pushes like a camera (default 30 fps) so
    the fetch-thread round-trip spans a realistic number of frames —
    None disables pacing (unit tests).

    Returns detection/application telemetry + ADD/ADD-S AUC over all
    frames and post-recovery.
    """
    import time as _time

    from ..render import mesh as M
    from ..tracking.stream import StreamTracker
    from ..tracking.tracker import Tracker

    T = len(gt) - 1
    fail_end = min(fail_at + fail_len, T)
    rgb = np.array(np.asarray(frames_rgb), copy=True)
    dep = np.array(np.asarray(frames_depth), copy=True)
    rgb[1 + fail_at: 1 + fail_end] = 0
    dep[1 + fail_at: 1 + fail_end] = 0
    if rgb.dtype != np.uint8:
        rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    if dep.dtype != np.uint16:
        dep = np.clip(np.round(dep), 0, 65535).astype(np.uint16)

    tr = Tracker.from_parts(obj.model, obj.tcfg, obj.variables, obj.mesh,
                            np.asarray(K), obj.mean, obj.std)
    key = jax.random.PRNGKey(seed)
    fires: list = []          # (fire_frame_idx, score, detected?)
    applied: list = []        # push frame_idx where a reinit landed

    def on_lost(idx, score):
        if fail_at <= idx < fail_end:
            fires.append((int(idx), float(score), False))
            return None       # detector can't see an occluded object
        fires.append((int(idx), float(score), True))
        g = min(int(idx) + 1, T)
        return np.asarray(noisy_init_pose(
            jax.random.fold_in(key, int(idx)), gt[g], reinit_sensor),
            np.float32)

    policy = hy.ReinitPolicy(threshold=threshold, patience=patience)
    s = StreamTracker(tr, window=True, samples=samples,
                      refetch_every=refetch_every,
                      reinit_policy=policy, on_track_lost=on_lost)
    orig_set = s.set_pose

    def set_pose(p):
        applied.append(int(s._frame_idx))
        orig_set(p)

    s.set_pose = set_pose
    init = noisy_init_pose(jax.random.fold_in(key, 10**6), gt[0],
                           reinit_sensor)
    s.begin(np.asarray(init), image_hw=rgb.shape[1:3])
    period = 1.0 / pace_hz if pace_hz else 0.0
    t_next = _time.perf_counter()
    for i in range(T):
        if period:
            t_next += period
            dt = t_next - _time.perf_counter()
            if dt > 0:
                _time.sleep(dt)
        s.push(rgb[1 + i], dep[1 + i])
        # per-frame blocking pose read — the deployed live-consumer
        # pattern (the ROS node broadcasts TF from current_pose() every
        # frame, apps/predict_ros.py). Without a consumer the host push
        # loop outruns the device arbitrarily far and the background
        # fetch thread — hence the ReinitPolicy — stops sampling: the
        # recovery loop is only closed when someone reads the poses.
        _ = s.current_pose()
    if s._fetcher is not None:
        s._fetcher.shutdown(wait=True)

    poses = s.poses()
    all_poses = np.concatenate([np.asarray(gt[:1]), poses], 0)
    cloud = M.voxel_down_sample(obj.tm.verts, 0.005)
    add, adi = ME.batch_errors(all_poses, np.asarray(gt), cloud)
    det = [f for f, _, _ in fires if f >= fail_at]
    rec = [a for a in applied if a >= fail_end]
    out = {
        "frames": int(T),
        "fail_at": int(fail_at),
        "fail_len": int(fail_end - fail_at),
        "samples": int(samples),
        "patience": int(patience),
        "refetch_every": int(refetch_every),
        "pace_hz": pace_hz,
        "fires": [f for f, _, _ in fires],
        "track_lost_events": int(s.track_lost_events),
        # frames from onset to the first policy fire at/after onset —
        # inherently quantized by patience x refetch_every + the fetch
        # round-trip, which is the cost the live design pays
        "detection_latency": (int(det[0]) - fail_at + 1) if det else None,
        "reinit_applied_at": [int(a) for a in applied],
        "recovered_at": int(rec[0]) if rec else None,
        "add_auc": float(ME.vocap(add) * 100),
        "adi_auc": float(ME.vocap(adi) * 100),
    }
    if rec:
        out["post_recovery_add_auc"] = float(
            ME.vocap(add[rec[0] + 1:]) * 100)
        out["post_recovery_adi_auc"] = float(
            ME.vocap(adi[rec[0] + 1:]) * 100)
    return out


def long_horizon_eval(obj, gt, frames_rgb, frames_depth, K, *,
                      chunk: int = 50, threshold: float = 0.3,
                      patience: int = 3, seed: int = 33,
                      reinit_sensor: SensorModel = SensorModel(),
                      fail_at: int | None = None,
                      fail_len: int = 15) -> dict:
    """Closed-loop long-horizon tracking: scan in fixed chunks with the
    per-frame depth-agreement health score; whenever ReinitPolicy fires,
    re-initialize from a noisy external pose (PoseCNN-grade gt
    perturbation) at that frame and continue. One compiled shape (chunks
    padded by repeating the last frame).

    ``fail_at``: tracked-frame index of a FORCED tracking failure — a
    ``fail_len``-frame full-occlusion burst (RGB and depth blacked out:
    an occluder filling the view / sensor blackout). The depth-agreement
    health collapses, ReinitPolicy fires, and recovery is quantified:
    ``detection_latency`` (frames from failure onset to the policy
    firing), ``recovered_at`` (first external re-detection — the
    detector is blind during the burst too, so re-detection waits for
    the first clear frame), and ``post_recovery_add_auc`` (AUC over the
    frames from re-detection to the end). This is the automated analog
    of the reference's manual --reinit_frames recovery
    (reference predict.py:539-541).

    ``obj``: a synthetic_benchmark.BenchObject. Returns ADD/ADD-S AUC over
    ALL frames (drift, the lost-during-occlusion hold, and recovery all
    count, reference eval_ycb.py:45-64 protocol) plus reinit telemetry.
    """
    T = len(gt) - 1  # tracked frames (gt[0] is the init frame)
    fail_end = -1
    if fail_at is not None:
        fail_end = min(fail_at + fail_len, T)
        frames_rgb = jnp.asarray(frames_rgb)
        frames_depth = jnp.asarray(frames_depth)
        z_rgb = jnp.zeros_like(frames_rgb[1 + fail_at : 1 + fail_end])
        z_dep = jnp.zeros_like(frames_depth[1 + fail_at : 1 + fail_end])
        frames_rgb = frames_rgb.at[1 + fail_at : 1 + fail_end].set(z_rgb)
        frames_depth = frames_depth.at[1 + fail_at : 1 + fail_end].set(
            z_dep)
    Kj = jnp.asarray(K)
    key = jax.random.PRNGKey(seed)
    poses_out = np.zeros((T, 4, 4), np.float32)
    policy = hy.ReinitPolicy(threshold=threshold, patience=patience)
    reinits = []
    fires = []
    cur_pose = noisy_init_pose(jax.random.fold_in(key, 10**6), gt[0],
                               reinit_sensor)
    start = 0  # index into tracked frames: frame i is gt[i+1]
    while start < T:
        stop = min(start + chunk, T)
        rgb = frames_rgb[1 + start : 1 + stop]
        dep = frames_depth[1 + start : 1 + stop]
        pad = chunk - (stop - start)
        if pad:
            rgb = jnp.concatenate([rgb, jnp.repeat(rgb[-1:], pad, 0)])
            dep = jnp.concatenate([dep, jnp.repeat(dep[-1:], pad, 0)])
        poses, scores = hy.track_video_with_health(
            obj.model, obj.tcfg, obj.variables, obj.mesh, Kj,
            obj.mean, obj.std, cur_pose, rgb, dep)
        scores = np.asarray(scores)[: stop - start]
        trig = None
        for j in range(stop - start):
            if policy.update(float(scores[j])):
                trig = j
                break
        take = (stop - start) if trig is None else (trig + 1)
        poses_out[start : start + take] = np.asarray(poses)[:take]
        if trig is None:
            cur_pose = poses[stop - start - 1]
            start = stop
        else:
            fires.append(start + trig)
            start = start + take
            if fail_at is not None and fail_at <= start < fail_end:
                # Re-detection would land INSIDE the occlusion burst:
                # the external detector can't see a fully occluded
                # object either, so hold the last estimate through the
                # burst (scored honestly) and re-detect at the first
                # clear frame. A fire BEFORE the burst must NOT take
                # this branch — the scene is still clear at ``start``,
                # so re-detection is immediate, exactly as in the
                # unforced path (ADVICE r4: the old ``start <
                # fail_end`` condition swallowed clear pre-burst
                # frames after an organic fire and faked latency 0).
                poses_out[start:fail_end] = np.asarray(poses)[take - 1]
                start = fail_end
            # external re-detection at the NEXT frame (noisy gt)
            if start < T:
                cur_pose = noisy_init_pose(
                    jax.random.fold_in(key, start), gt[start],
                    reinit_sensor)
                reinits.append(start)
            policy.bad_streak = 0
    from ..render import mesh as M

    cloud = M.voxel_down_sample(obj.tm.verts, 0.005)
    all_poses = np.concatenate([np.asarray(gt[:1]), poses_out], 0)
    add, adi = ME.batch_errors(all_poses, np.asarray(gt), cloud)
    out = {
        "frames": int(T),
        "reinit_count": len(reinits),
        "reinit_frames": reinits,
        "add_auc": float(ME.vocap(add) * 100),
        "adi_auc": float(ME.vocap(adi) * 100),
        "add_mean_mm": float(add.mean() * 1000),
    }
    if fail_at is not None:
        recov = [r for r in reinits if r >= fail_end]
        out["fail_at"] = int(fail_at)
        out["fail_len"] = int(fail_end - fail_at)
        # Detection latency = frames from failure onset to the policy
        # fire that TRIGGERED the recovery reinit (the last fire at or
        # before the recovery frame), counting ONLY fires at/after
        # onset — a pre-burst organic fire re-detects immediately on a
        # clear frame (branch above) and says nothing about how fast
        # the burst itself was detected. If recovery somehow rode a
        # pre-burst fire (no at/after-onset fire preceded it), latency
        # is None and ``pre_burst_trigger`` flags it explicitly
        # (ADVICE r4: the old max(0, ...) clamp turned that case into
        # a fake latency-0 measurement).
        burst_fires = [f for f in fires if f >= fail_at]
        trigger = ([f for f in burst_fires if recov and f <= recov[0]]
                   or [None])
        out["detection_latency"] = (
            int(trigger[-1]) - int(fail_at) + 1
            if recov and trigger[-1] is not None else None)
        out["pre_burst_trigger"] = bool(recov) and trigger[-1] is None
        out["recovered_at"] = int(recov[0]) if recov else None
        if recov:
            # errors are indexed over gt (frame 0 = init): tracked frame
            # r is error row r+1
            out["post_recovery_add_auc"] = float(
                ME.vocap(add[recov[0] + 1 :]) * 100)
            out["post_recovery_adi_auc"] = float(
                ME.vocap(adi[recov[0] + 1 :]) * 100)
    return out
