"""Pipelined per-frame ("live") tracking — the deployment hot path.

The reference's flagship loop is per-frame ``Tracker.on_track`` at 90.9 Hz
(reference predict.py:217-296, README.md:6); its ROS node runs the same
call under a 60 Hz spin (reference predict_ros.py:112-119). A naive JAX
port of that loop is transfer-bound: uploading a full 640x480 float32
RGB-D frame and synchronously fetching the pose every call serializes
H2D transfer, compute, and D2H latency.

``StreamTracker`` restructures the loop TPU-first:

  1. **Device-resident pose carry** — the 4x4 estimate never leaves the
     device between frames; ``push`` only *dispatches* work (JAX dispatch
     is asynchronous) and the consumer fetches poses when it needs them.
  2. **uint8/uint16 transfer** — frames cross the host boundary in their
     camera dtypes; the float cast happens on device after the ROI gather
     (tracker.track_step).
  3. **Windowed upload** (`window=True`) — only a square sub-window
     around the object's last known position is uploaded, not the full
     frame. The window center comes from a *lagged* pose snapshot fetched
     on a background thread so the push path never blocks on the device;
     a velocity-adaptive pad absorbs the residual error of the
     constant-velocity center prediction over the snapshot staleness
     (refetch_every + fetch round-trip). The pad — not a fixed 1.45x
     multiplier — is what sizes the upload: on the measured axon tunnel
     the H2D transfer is the live-loop bound (~50-110 MB/s; 320px packed
     window = 8.3 ms vs 256px = 4.6 ms), so every pad pixel costs Hz.
     Window sides are quantized to multiples of 32 px with hysteresis so
     only a handful of XLA programs ever compile; each program closes
     over the weights, so a call passes just (pose, packed frame,
     offset). RGB and the two depth bytes are packed into ONE
     (side, side, 5) uint8 buffer — two strided copies straight from the
     frame slices, no intermediate contiguous copies — so each frame
     costs a single H2D transfer plus one dispatch.
  5. **Containment monitoring** — windowing is only exact while the true
     ROI stays inside the uploaded window. Every background pose fetch
     re-checks the ROI of the *fetched* (true) pose against the window
     rect that was actually used at that frame; a violation increments
     ``containment_violations``, permanently widens the pad, and forces
     an immediate recenter. Consumers read ``stats()`` for health.
  4. **Exactness** — the ROI is still computed from the TRUE device-side
     pose in full-image coordinates (track_step's ``frame_offset_vu``);
     the windowed path is bit-identical to full-frame tracking whenever
     the ROI lies inside the window (tests/test_stream.py asserts this).

Consumers: bench.py host-loop mode, apps/predict.py --track_mode stream,
apps/predict_ros.py.
"""
from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from . import tracker as trk


def pack_window_into(buf: np.ndarray, rgb_u8: np.ndarray,
                     depth_u16: np.ndarray) -> np.ndarray:
    """Pack (S,S,3) uint8 + (S,S) uint16 views into a preallocated
    contiguous (S,S,5) uint8 buffer: two strided copies straight from the
    frame slices, no intermediate ``ascontiguousarray``/``concatenate``
    copies (halves the per-push host memcpy on a 1-core host)."""
    buf[..., :3] = rgb_u8
    buf[..., 3:5].view("<u2")[..., 0] = depth_u16
    return buf


def pack_window(rgb_u8: np.ndarray, depth_u16: np.ndarray) -> np.ndarray:
    """(S,S,3) uint8 + (S,S) uint16 -> one contiguous (S,S,5) uint8."""
    s = rgb_u8.shape[:2]
    return pack_window_into(np.empty(s + (5,), np.uint8), rgb_u8, depth_u16)


class StreamTracker:
    """Per-frame pipelined tracking around an existing ``Tracker``.

    Usage::

        st = StreamTracker(tracker)          # or window=False for full frames
        st.begin(init_pose)
        for rgb_u8, depth_u16 in camera:     # HxWx3 uint8, HxW uint16 (mm)
            st.push(rgb_u8, depth_u16)
        poses = st.poses()                   # (T, 4, 4) float32, blocks

    ``current_pose()`` blocks on the latest estimate (for consumers that
    need per-frame output, e.g. the ROS TF broadcast); throughput-oriented
    consumers should let the pipeline run free and fetch at the end.
    """

    def __init__(self, tracker, window: bool = True,
                 margin: float | None = None,
                 refetch_every: int = 8, pose_lag: int | None = None,
                 keep_history: bool = True, samples: int = 1,
                 base_pad_px: float = 24.0,
                 reinit_policy=None, on_track_lost=None):
        self.t = tracker
        # Closed-loop failure handling for LIVE consumers (the eval-side
        # analog is domain_shift.long_horizon_eval): ``reinit_policy``
        # (a hypotheses.ReinitPolicy) is fed the depth-agreement health
        # score on the BACKGROUND fetch thread — the push path never
        # blocks — so the policy sees one sample per center refetch,
        # not per frame: patience counts snapshots, and detection
        # latency is ~patience * refetch_every frames. When it fires,
        # ``on_track_lost(frame_idx, score)`` runs on the fetch thread
        # (keep it cheap); if it returns a 4x4 pose (an external
        # re-detection), the next push() applies it via set_pose().
        # Requires samples > 1 (the health score comes from the
        # multi-hypothesis step).
        if reinit_policy is not None and samples < 2:
            raise ValueError("reinit_policy needs samples >= 2 "
                             "(health score comes from the "
                             "multi-hypothesis step)")
        self.reinit_policy = reinit_policy
        self.on_track_lost = on_track_lost
        self.track_lost_events = 0
        self._pending_reinit = None       # (gen, 4x4 pose) from callback
        self.window = window
        # margin=None (default): velocity-adaptive pad sizing (see module
        # docstring). A float pins the legacy multiplicative sizing
        # (window side = ROI side * margin, 64px quanta).
        self.margin = margin
        self.base_pad_px = float(base_pad_px)
        self._pad_boost = 0.0        # widened on containment violations
        self._rect_hist = {}         # frame_idx -> (top, left, side) used
        self.containment_violations = 0
        self.refetches = 0
        # samples > 1: every push refines N pose hypotheses in one
        # batched program and carries the depth-agreement winner
        # (tracking/hypotheses.track_step_multi); per-frame health scores
        # land in .scores(). The batched CNN makes the extra hypotheses
        # nearly latency-free on the MXU.
        self.samples = int(samples)
        self._scores: list = []
        # How often (frames) to refresh the host's window-center estimate.
        # The refresh is a D2H pose fetch done on a BACKGROUND thread, so
        # the push path never blocks; staleness is bounded by
        # refetch_every + the fetch round-trip (a few frames). The window
        # margin must absorb that many frames of object motion.
        self.refetch_every = max(1, refetch_every)
        # keep_history=False for unbounded live runs (e.g. the ROS node):
        # per-frame device poses are not retained, only the latest.
        self.keep_history = keep_history
        del pose_lag  # kept for API compat; superseded by the fetch thread
        self._K_np = np.asarray(tracker.K)
        self._pose_dev = None
        self._poses: list = []
        self._center_vu = None            # host estimate of the ROI center (v, u)
        self._side_px = None
        self._hw = None
        self._frame_idx = 0
        self._center_frame = 0            # frame the center estimate came from
        self._offset_cache = {}           # (top, left) -> device int32 pair
        self._step_cache = {}             # window side -> jitted closure step
        self._fetcher = None              # lazy 1-thread executor
        self._fetch_busy = False
        self._pending_center = None       # (gen, frame_idx, (center_vu, side))
        self._cur_bucket = None           # hysteresis state of _bucket
        self._center_hist: deque = deque(maxlen=2)  # (idx, vu) fetched centers
        self._gen = 0                     # bumped by begin()/set_pose(): an
                                          # in-flight fetch from a previous
                                          # generation must not recenter
                                          # the post-reinit window

    # -- host-side ROI geometry (numpy mirror of ops/roi.compute_bbox) --
    def _host_bbox(self, pose: np.ndarray):
        K = self._K_np
        obj = pose[:3, 3] * 1000.0
        z = max(float(obj[2]), 1e-3)
        u = float(obj[0]) * K[0, 0] / z + K[0, 2]
        v = float(obj[1]) * K[1, 1] / z + K[1, 2]
        # the ROI is object_width*fx wide and object_width*fy tall
        # (compute_bbox projects with both focals); the square window must
        # cover the LARGER extent or anisotropic intrinsics silently eat
        # the margin.
        side = self.t.cfg.object_width_mm * max(K[0, 0], K[1, 1]) / z
        return (v, u), side

    def _vel_px(self) -> float:
        """Window-center speed (px/frame) from the last two snapshots."""
        if len(self._center_hist) == 2:
            (i0, c0), (i1, c1) = self._center_hist
            if i1 > i0:
                return float(np.linalg.norm(c1 - c0) / (i1 - i0))
        return 0.0

    def _bucket(self, side_px: float) -> int:
        """Quantized window size with hysteresis: grow as soon as the ROI
        needs it, shrink only when two quanta smaller — every size change
        is a fresh XLA program, so size flapping would stall the stream
        on recompiles.

        Sizing: the constant-velocity center prediction cancels the
        first-order staleness error, so the pad only has to absorb the
        base uncertainty (rounding + prediction residual) plus a
        velocity-proportional term for the unpredicted half of the
        staleness horizon; containment violations observed by the fetch
        thread widen it permanently (_pad_boost)."""
        if self.margin is not None:
            want = int(np.ceil(side_px * self.margin / 64.0)) * 64
        else:
            horizon = self.refetch_every + 6  # +fetch round-trip frames
            pad = (self.base_pad_px + self._pad_boost
                   + 0.5 * self._vel_px() * horizon)
            want = int(np.ceil((side_px + 2.0 * pad) / 32.0)) * 32
        H, W = self._hw
        want = int(min(max(want, 128), min(H, W)))
        cur = self._cur_bucket
        if cur is None or want > cur or want <= cur - 64:
            self._cur_bucket = want
        return self._cur_bucket

    def begin(self, init_pose: np.ndarray, image_hw: tuple[int, int] | None = None):
        self._pose_dev = jax.device_put(
            jnp.asarray(np.asarray(init_pose), jnp.float32))
        self._poses = [self._pose_dev]
        self._scores = []
        self._gen += 1          # poison in-flight pre-begin fetches
        self._pending_center = None
        self._pending_reinit = None
        self._frame_idx = 0
        self._center_frame = 0
        self._hw = image_hw
        self._center_vu, side = self._host_bbox(np.asarray(init_pose))
        self._side_px = side
        self._center_hist.clear()
        self._rect_hist = {}
        return self

    def _get_step(self, side_key):
        """Closure-jitted step for one window size: model weights, mesh,
        and camera constants are closed over (lifted once into the
        executable), so each call passes only (pose, frame, offset) —
        per-call pytree flattening and arg transfers drop to near zero,
        which matters at tunnel dispatch rates."""
        fn = self._step_cache.get(side_key)
        if fn is None:
            t = self.t
            model, cfg = t.model, t.cfg
            variables, mesh = t.variables, t.mesh
            K, mean, std = t.K, t.mean, t.std
            samples = self.samples

            def multi(pose, rgb, depth, idx, offset=None):
                from . import hypotheses as hy

                new_pose, score, _ = hy.track_step_multi(
                    model, cfg, variables, mesh, K, mean, std,
                    pose, rgb, depth, jax.random.PRNGKey(idx),
                    samples=samples, frame_offset_vu=offset,
                )
                return new_pose, score

            if side_key == "full":
                if samples > 1:
                    @jax.jit
                    def fn(pose, rgb, depth, idx):
                        return multi(pose, rgb, depth, idx)
                else:
                    @jax.jit
                    def fn(pose, rgb, depth):
                        new_pose, _ = trk.track_step(
                            model, cfg, variables, mesh, K, mean, std,
                            pose, rgb, depth,
                        )
                        return new_pose
            else:
                def unpack(packed):
                    rgb = packed[..., :3]
                    depth = (packed[..., 3].astype(jnp.int32)
                             + packed[..., 4].astype(jnp.int32) * 256
                             ).astype(jnp.float32)
                    return rgb, depth

                if samples > 1:
                    @jax.jit
                    def fn(pose, packed, offset, idx):
                        rgb, depth = unpack(packed)
                        return multi(pose, rgb, depth, idx, offset)
                else:
                    @jax.jit
                    def fn(pose, packed, offset):
                        rgb, depth = unpack(packed)
                        new_pose, _ = trk.track_step(
                            model, cfg, variables, mesh, K, mean, std,
                            pose, rgb, depth, frame_offset_vu=offset,
                        )
                        return new_pose
            self._step_cache[side_key] = fn
        return fn

    def _update_center(self):
        """Consume the latest background pose snapshot (if any) and, every
        ``refetch_every`` frames, hand the current device pose to the
        fetch thread. The push path never blocks on the device."""
        pending = self._pending_center
        if pending is not None:
            self._pending_center = None
            gen, idx, (vu, side) = pending
            if gen == self._gen and idx >= self._center_frame:
                self._center_vu, self._side_px = vu, side
                self._center_frame = idx
                self._center_hist.append((idx, np.asarray(vu, np.float64)))
        if (self._frame_idx - self._center_frame >= self.refetch_every
                and not self._fetch_busy):
            if self._fetcher is None:
                import concurrent.futures as cf

                self._fetcher = cf.ThreadPoolExecutor(
                    1, thread_name_prefix="stream-pose-fetch")
            self._fetch_busy = True
            self.refetches += 1
            dev, idx, gen = self._pose_dev, self._frame_idx, self._gen
            # the rect a step at `idx` will consume is the one push() is
            # about to record; idx-1's rect is the newest already recorded
            rect = self._rect_hist.get(idx - 1)

            score_dev = self._scores[-1] if self._scores else None

            def work():
                try:
                    vu_side = self._host_bbox(np.asarray(dev))
                    if rect is not None and self._roi_escaped(
                            vu_side[0], vu_side[1], rect):
                        # the true ROI left the uploaded window: frames
                        # since `rect` may have tracked clamped input.
                        # Count it, widen the pad for every future
                        # window, and let the fresh center recenter us.
                        self.containment_violations += 1
                        self._pad_boost += 16.0
                    self._pending_center = (gen, idx, vu_side)
                    if self.reinit_policy is not None and score_dev is not None:
                        sc = float(np.asarray(score_dev))
                        if self.reinit_policy.update(sc):
                            self.reinit_policy.bad_streak = 0
                            self.track_lost_events += 1
                            new = None
                            if self.on_track_lost is not None:
                                new = self.on_track_lost(idx, sc)
                            if new is not None:
                                self._pending_reinit = (
                                    gen, np.asarray(new, np.float32))
                finally:
                    self._fetch_busy = False

            self._fetcher.submit(work)

    def _roi_escaped(self, vu, side: float, rect) -> bool:
        """True if the (image-clipped) ROI square of a true pose sticks
        out of the window rect actually uploaded. Pixels outside the
        image are zero in BOTH the full-frame and windowed paths
        (ops/roi.crop_bbox zero-masks them), so only the in-image part
        of the ROI must be covered. 1px tolerance for rounding."""
        H, W = self._hw
        top, left, wside = rect
        v0 = max(vu[0] - side / 2, 0.0)
        v1 = min(vu[0] + side / 2, float(H))
        u0 = max(vu[1] - side / 2, 0.0)
        u1 = min(vu[1] + side / 2, float(W))
        tol = 1.0
        return (v0 < top - tol or u0 < left - tol
                or v1 > top + wside + tol or u1 > left + wside + tol)

    def stats(self) -> dict:
        """Live-loop health/telemetry counters (cumulative)."""
        return {
            "containment_violations": self.containment_violations,
            "pad_boost_px": self._pad_boost,
            "refetches": self.refetches,
            "bucket": self._cur_bucket,
            "compiled_programs": len(self._step_cache),
            "track_lost_events": self.track_lost_events,
        }

    def _predicted_center(self):
        """Constant-velocity extrapolation of the window center: fetched
        snapshots lag by up to refetch_every + round-trip frames, but
        object/camera motion is smooth at frame rate, so extrapolating
        through the last two snapshots cancels most of the staleness error
        (the margin only has to absorb the acceleration residual)."""
        if len(self._center_hist) == 2:
            (i0, c0), (i1, c1) = self._center_hist
            if i1 > i0:
                vel = (c1 - c0) / (i1 - i0)
                # cap the extrapolation horizon: a bad velocity estimate
                # must not throw the window across the image.
                ahead = min(self._frame_idx - i1, 3 * self.refetch_every)
                pred = c1 + vel * ahead
                return float(pred[0]), float(pred[1])
        return self._center_vu

    def _offset_dev(self, top: int, left: int):
        key = (top, left)
        dev = self._offset_cache.get(key)
        if dev is None:
            if len(self._offset_cache) > 256:
                self._offset_cache.clear()
            dev = jax.device_put(np.asarray([top, left], np.int32))
            self._offset_cache[key] = dev
        return dev

    def push(self, rgb_u8: np.ndarray, depth_u16: np.ndarray) -> None:
        """Dispatch one tracking update. Never blocks on the device."""
        if self._hw is None:
            self._hw = rgb_u8.shape[:2]
        pending = self._pending_reinit
        if pending is not None:
            self._pending_reinit = None
            rgen, rpose = pending
            if rgen == self._gen:  # not already superseded by set_pose()
                self.set_pose(rpose)
        multi = self.samples > 1
        idx = (np.int32(self._frame_idx),) if multi else ()
        if not self.window:
            out = self._get_step("full")(
                self._pose_dev, np.ascontiguousarray(rgb_u8),
                np.ascontiguousarray(depth_u16), *idx,
            )
        else:
            self._update_center()
            H, W = self._hw
            side = self._bucket(self._side_px)
            cv, cu = self._predicted_center()
            top = int(np.clip(round(cv - side / 2), 0, max(H - side, 0)))
            left = int(np.clip(round(cu - side / 2), 0, max(W - side, 0)))
            # fresh buffer per push: JAX may alias (CPU backend) or
            # defer-transfer a numpy arg, so a reused staging buffer
            # would corrupt the in-flight frame; the malloc is trivial
            # next to the two strided copies.
            packed = pack_window(
                rgb_u8[top:top + side, left:left + side],
                depth_u16[top:top + side, left:left + side],
            )
            self._rect_hist[self._frame_idx] = (top, left, side)
            if len(self._rect_hist) > 300:
                cut = self._frame_idx - 256
                self._rect_hist = {k: v for k, v in self._rect_hist.items()
                                   if k >= cut}
            out = self._get_step(side)(
                self._pose_dev, packed, self._offset_dev(top, left), *idx,
            )
        if multi:
            new_pose, score = out
            if self.keep_history:
                self._scores.append(score)
            else:
                self._scores = [score]
        else:
            new_pose = out
        self._pose_dev = new_pose
        if self.keep_history:
            self._poses.append(new_pose)
        self._frame_idx += 1

    def set_pose(self, pose: np.ndarray) -> None:
        """Re-initialize mid-stream (reference predict.py:539-541
        --reinit_frames semantics) without breaking the pipeline."""
        self._pose_dev = jax.device_put(
            jnp.asarray(np.asarray(pose), jnp.float32))
        self._center_vu, self._side_px = self._host_bbox(np.asarray(pose))
        self._center_frame = self._frame_idx
        self._gen += 1          # poison in-flight pre-reinit fetches
        self._pending_center = None
        self._center_hist.clear()
        self._rect_hist = {}

    def current_pose(self) -> np.ndarray:
        """Latest estimate (blocks until its computation completes)."""
        return np.asarray(self._pose_dev)

    def poses(self, include_init: bool = False) -> np.ndarray:
        """All poses so far as (T, 4, 4) float32. Blocks."""
        out = self._poses if include_init else self._poses[1:]
        if not out:
            return np.zeros((0, 4, 4), np.float32)
        return np.stack([np.asarray(p) for p in out])

    def scores(self) -> np.ndarray:
        """Per-frame depth-agreement health (samples > 1 only): feed
        these to hypotheses.ReinitPolicy for automatic drift handling.
        Blocks. With keep_history=False only the latest is retained."""
        if not self._scores:
            return np.zeros((0,), np.float32)
        return np.asarray([float(np.asarray(s)) for s in self._scores],
                          np.float32)
