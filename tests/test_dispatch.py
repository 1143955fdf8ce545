"""Adaptive dispatch-granularity selection (tracking/dispatch.py).

The dispatcher exists because the fused scan collapses ~7x under
shared-device contention while per-frame dispatch of the same step does
not (BENCH_r04 + benchmarks/bench_runs). These tests pin the part that
must never regress: every dispatch granularity computes the SAME poses,
so probing/switching modes mid-video cannot change tracking output.
"""
import numpy as np
import jax
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.models import tracknet
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
from iros20_6d_pose_tracking_tpu.tracking import tracker as trk
from iros20_6d_pose_tracking_tpu.tracking.dispatch import (
    AdaptiveVideoTracker)

RES = 64
K = np.array([[300.0, 0, 32.0], [0, 300.0, 32.0], [0, 0, 1.0]], np.float32)


def _tracker():
    model = tracknet.Se3TrackNet(image_size=RES)
    variables = tracknet.init_variables(model, jax.random.PRNGKey(0))
    mesh = rz.upload(M.make_icosphere(subdiv=2, radius=0.05))
    cfg = trk.TrackerConfig(resolution=RES, object_width_mm=110.0)
    return trk.Tracker.from_parts(
        model, cfg, variables, mesh, K, np.zeros(8), np.ones(8) * 100.0)


def _video(t, T=20):
    """T distinct frames: the object rendered along a small drift, so
    per-frame poses genuinely evolve and chunk boundaries matter."""
    rgbs, deps = [], []
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    for i in range(T):
        p = pose.copy()
        p[0, 3] += 0.0004 * i
        rgb, dep = rz.render(
            t.mesh, jnp.asarray(p), jnp.asarray(K),
            rz.full_frame_window(RES, RES), out_hw=(RES, RES))
        rgbs.append(np.asarray(
            jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)))
        deps.append(np.asarray(jnp.round(dep).astype(jnp.uint16)))
    return np.stack(rgbs), np.stack(deps), pose


def test_adaptive_matches_plain_scan():
    """Adaptive tracking (probe segments in every candidate mode, then
    steady state) returns the same per-frame poses as one whole-video
    scan: mode is a pure execution choice."""
    t = _tracker()
    rgbs, deps, pose0 = _video(t, T=20)
    ref = trk.track_video(
        t.model, t.cfg, t.variables, t.mesh, jnp.asarray(K), t.mean,
        t.std, jnp.asarray(pose0), jnp.asarray(rgbs), jnp.asarray(deps))
    d = AdaptiveVideoTracker(t, candidates=(8, 4, 1), probe_frames=4)
    poses, scores = d.track(pose0, rgbs, deps, chunk_size=8)
    assert poses.shape == (20, 4, 4)
    assert scores is None
    # all candidates probed, winner picked, decision recorded
    assert set(d.probe_ms_per_frame) == {8, 4, 1}
    assert d.mode == min(d.probe_ms_per_frame,
                         key=d.probe_ms_per_frame.get)
    assert len(d.segments) >= 3
    # same step, different dispatch granularity -> same trajectory
    # (ulp-level differences only, from XLA fusion across scan builds)
    np.testing.assert_allclose(poses, np.asarray(ref), atol=1e-5)


def test_adaptive_via_tracker_api():
    t = _tracker()
    rgbs, deps, pose0 = _video(t, T=12)
    poses, tel = t.track_video_adaptive(
        pose0, rgbs, deps, chunk_size=4, candidates=(4, 1))
    assert poses.shape == (12, 4, 4)
    assert set(tel["probe_ms_per_frame"]) == {4, 1}
    assert tel["mode"] in (4, 1)
    ref = trk.track_video(
        t.model, t.cfg, t.variables, t.mesh, jnp.asarray(K), t.mean,
        t.std, jnp.asarray(pose0), jnp.asarray(rgbs), jnp.asarray(deps))
    np.testing.assert_allclose(poses, np.asarray(ref), atol=1e-5)


def test_adaptive_survives_constant_reprobing():
    """reprobe_factor below 1 forces a re-probe after nearly every
    steady segment — mode churn at maximum rate. Poses must still come
    out identical to the plain scan (switching modes mid-video is
    output-neutral) and the churn must be visible in telemetry."""
    t = _tracker()
    rgbs, deps, pose0 = _video(t, T=24)
    d = AdaptiveVideoTracker(t, candidates=(8, 1), probe_frames=4,
                             reprobe_factor=0.5)
    poses, _ = d.track(pose0, rgbs, deps, chunk_size=8)
    ref = trk.track_video(
        t.model, t.cfg, t.variables, t.mesh, jnp.asarray(K), t.mean,
        t.std, jnp.asarray(pose0), jnp.asarray(rgbs), jnp.asarray(deps))
    np.testing.assert_allclose(poses, np.asarray(ref), atol=1e-5)
    assert d.reprobes >= 1


def test_adaptive_multi_hypothesis():
    """samples > 1 through the dispatcher: health scores for every
    frame, finite poses, probe table complete. (MH poses are only
    statistically equivalent across modes — RNG streams differ — so no
    cross-mode pose comparison here.)"""
    t = _tracker()
    rgbs, deps, pose0 = _video(t, T=8)
    d = AdaptiveVideoTracker(t, candidates=(4, 1), probe_frames=4,
                             samples=2)
    poses, scores = d.track(pose0, rgbs, deps, chunk_size=4)
    assert poses.shape == (8, 4, 4)
    assert scores.shape == (8,)
    assert np.isfinite(poses).all()
    assert np.isfinite(scores).all()
    assert set(d.probe_ms_per_frame) == {4, 1}


def test_adaptive_short_video_and_tail():
    """Video shorter than one chunk + a tail that isn't a multiple of
    any candidate: padding/trim must keep exactly T poses."""
    t = _tracker()
    rgbs, deps, pose0 = _video(t, T=5)
    d = AdaptiveVideoTracker(t, candidates=(4, 1), probe_frames=4)
    poses, _ = d.track(pose0, rgbs, deps, chunk_size=8)
    assert poses.shape == (5, 4, 4)
    ref = trk.track_video(
        t.model, t.cfg, t.variables, t.mesh, jnp.asarray(K), t.mean,
        t.std, jnp.asarray(pose0), jnp.asarray(rgbs), jnp.asarray(deps))
    np.testing.assert_allclose(poses, np.asarray(ref), atol=1e-5)


def test_adaptive_stream_candidate_parity():
    """Candidate 0 = the windowed StreamTracker path. With the window
    covering the whole (tiny) image the stream step is bit-identical to
    full-frame tracking, so forcing the dispatcher through a stream
    steady phase must reproduce the plain scan trajectory."""
    t = _tracker()
    rgbs, deps, pose0 = _video(t, T=32)
    d = AdaptiveVideoTracker(t, candidates=(4, 0), probe_frames=4)
    poses, _ = d.track(pose0, rgbs, deps, chunk_size=8)
    assert poses.shape == (32, 4, 4)
    assert set(d.probe_ms_per_frame) == {4, 0}
    assert d.mode in (4, 0)
    ref = trk.track_video(
        t.model, t.cfg, t.variables, t.mesh, jnp.asarray(K), t.mean,
        t.std, jnp.asarray(pose0), jnp.asarray(rgbs), jnp.asarray(deps))
    np.testing.assert_allclose(poses, np.asarray(ref), atol=1e-5)


def test_adaptive_resident_fast_path():
    """Device-resident jax-array sources: whole video as one chunk,
    zero host chunking, candidates may exceed any chunk_size arg."""
    t = _tracker()
    rgbs, deps, pose0 = _video(t, T=16)
    d = AdaptiveVideoTracker(t, candidates=(8, 1), probe_frames=4)
    poses, _ = d.track(pose0, jnp.asarray(rgbs), jnp.asarray(deps))
    assert poses.shape == (16, 4, 4)
    ref = trk.track_video(
        t.model, t.cfg, t.variables, t.mesh, jnp.asarray(K), t.mean,
        t.std, jnp.asarray(pose0), jnp.asarray(rgbs), jnp.asarray(deps))
    np.testing.assert_allclose(poses, np.asarray(ref), atol=1e-5)
