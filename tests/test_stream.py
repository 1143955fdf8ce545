"""Streaming (pipelined per-frame) and chunked-scan tracking tests.

Covers the round-2 deployment path: uint8/uint16 transfer equivalence,
the packed-window StreamTracker vs full-frame tracking, chunked
bounded-memory video tracking vs the whole-video scan, and mid-stream
re-initialization.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.models import tracknet
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
from iros20_6d_pose_tracking_tpu.tracking import stream as st
from iros20_6d_pose_tracking_tpu.tracking import tracker as trk

H, W = 192, 256
RES = 64
K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1.0]], np.float32)
DATASET_INFO = {
    "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": W / 2,
               "centerY": H / 2, "width": W, "height": H},
    "resolution": RES,
    "boundingbox": 10,
}


def _tracker(head_scale=0.05, seed=0):
    """Tracker over a small sphere; head weights scaled down so the pose
    drifts a few px/frame (real movement, but window-safe)."""
    t = trk.Tracker(DATASET_INFO, np.zeros(8), np.ones(8) * 100.0,
                    mesh=M.make_icosphere(subdiv=2, radius=0.05))
    params = jax.tree.map(lambda x: x, t.variables["params"])
    for head in ("trans_out", "rot_out"):
        params[head]["kernel"] = params[head]["kernel"] * head_scale
        params[head]["bias"] = params[head]["bias"] * 0.0
    t.variables = {"params": params, "batch_stats": t.variables["batch_stats"]}
    return t


def _video(t, pose, n):
    rgb, depth = rz.render(
        t.mesh, jnp.asarray(pose, jnp.float32), jnp.array(K),
        rz.full_frame_window(W, H), out_hw=(H, W),
    )
    rgb_u8 = np.asarray(rgb).astype(np.uint8)
    depth_u16 = np.asarray(depth).astype(np.uint16)
    return (np.stack([rgb_u8] * n), np.stack([depth_u16] * n))


def test_uint8_step_matches_float32():
    """Casting after the ROI gather == casting before it (nearest crop
    touches no arithmetic), so uint8 transfer is lossless."""
    t = _tracker()
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.02, -0.01, 0.5]
    rgbs, depths = _video(t, pose, 1)
    a, _ = trk.track_step(t.model, t.cfg, t.variables, t.mesh, t.K, t.mean,
                          t.std, jnp.array(pose), jnp.array(rgbs[0]),
                          jnp.array(depths[0]))
    b, _ = trk.track_step(t.model, t.cfg, t.variables, t.mesh, t.K, t.mean,
                          t.std, jnp.array(pose),
                          jnp.array(rgbs[0].astype(np.float32)),
                          jnp.array(depths[0].astype(np.float32)))
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)


def test_pack_window_roundtrip():
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (32, 32, 3), np.uint8)
    depth = rng.randint(0, 4000, (32, 32)).astype(np.uint16)
    packed = st.pack_window(rgb, depth)
    assert packed.shape == (32, 32, 5) and packed.dtype == np.uint8
    np.testing.assert_array_equal(packed[..., :3], rgb)
    rec = packed[..., 3].astype(np.int32) + packed[..., 4].astype(np.int32) * 256
    np.testing.assert_array_equal(rec, depth)


@pytest.mark.slow
def test_stream_window_matches_full_frame():
    """Windowed-packed streaming == full-frame tracking while the ROI
    stays inside the window (the offset math must be exact)."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    n = 6
    t1 = _tracker()
    rgbs, depths = _video(t1, pose, n)

    ref = [pose]
    for i in range(n):
        ref.append(t1.on_track(ref[-1], rgbs[i], depths[i]))
    ref = np.stack(ref[1:])

    t2 = _tracker()
    s = st.StreamTracker(t2, window=True, pose_lag=2)
    s.begin(pose, image_hw=(H, W))
    for i in range(n):
        s.push(rgbs[i], depths[i])
    got = s.poses()
    assert got.shape == (n, 4, 4)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # The window really was a sub-frame (not a degenerate full upload).
    assert s._bucket(s._side_px) < min(H, W)


@pytest.mark.slow
def test_stream_full_frame_mode():
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    t = _tracker()
    rgbs, depths = _video(t, pose, 3)
    s = st.StreamTracker(t, window=False)
    s.begin(pose)
    for i in range(3):
        s.push(rgbs[i], depths[i])
    assert s.poses().shape == (3, 4, 4)
    assert np.isfinite(s.current_pose()).all()


def test_stream_reinit_poisons_inflight_snapshot():
    """A background pose fetch submitted BEFORE begin()/set_pose() must
    not recenter the window after re-initialization (generation guard)."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    t = _tracker()
    rgbs, depths = _video(t, pose, 1)
    s = st.StreamTracker(t, window=True, refetch_every=1)
    s.begin(pose, image_hw=(H, W))
    old_gen = s._gen
    s.begin(pose, image_hw=(H, W))
    # a pre-reinit fetch lands late: stale generation, bogus center
    s._pending_center = (old_gen, 999, ((0.0, 0.0), 50.0))
    s.push(rgbs[0], depths[0])
    assert s._center_frame == 0          # stale snapshot rejected
    assert s._center_vu != (0.0, 0.0)
    # a CURRENT-generation snapshot is accepted
    s._pending_center = (s._gen, 1, ((5.0, 6.0), 60.0))
    s.push(rgbs[0], depths[0])
    assert s._center_frame == 1 and s._center_vu == (5.0, 6.0)


def test_stream_no_history_mode():
    """keep_history=False (unbounded live runs) retains no per-frame
    device poses but still tracks."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    t = _tracker()
    rgbs, depths = _video(t, pose, 2)
    s = st.StreamTracker(t, window=True, keep_history=False)
    s.begin(pose, image_hw=(H, W))
    for i in range(2):
        s.push(rgbs[i], depths[i])
    assert len(s._poses) == 1  # just the init
    assert s.poses().shape == (0, 4, 4)
    assert np.isfinite(s.current_pose()).all()


@pytest.mark.slow
def test_stream_set_pose_reinit():
    """set_pose mid-stream == restarting from that pose (reference
    predict.py:539-541 --reinit_frames)."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    t = _tracker()
    rgbs, depths = _video(t, pose, 4)

    s = st.StreamTracker(t, window=True)
    s.begin(pose, image_hw=(H, W))
    s.push(rgbs[0], depths[0])
    reinit = np.eye(4, dtype=np.float32)
    reinit[:3, 3] = [0.01, 0.0, 0.52]
    s.set_pose(reinit)
    s.push(rgbs[1], depths[1])
    after = s.poses()[-1]

    s2 = st.StreamTracker(t, window=True)
    s2.begin(reinit, image_hw=(H, W))
    s2.push(rgbs[1], depths[1])
    np.testing.assert_allclose(after, s2.poses()[-1], atol=1e-6)


@pytest.mark.slow
def test_chunked_matches_whole_scan():
    """Chunked streaming scan (padded last chunk) == one whole-video scan."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    t = _tracker()
    n = 8
    rgbs, depths = _video(t, pose, n)

    whole = t.track_video(pose, rgbs, depths)
    chunked = t.track_video_chunked(pose, rgbs, depths, chunk_size=3)
    assert chunked.shape == (n, 4, 4)
    np.testing.assert_allclose(chunked, whole, atol=1e-6)


@pytest.mark.slow
def test_chunked_callable_sources():
    """Lazy per-chunk decode path (file-backed videos)."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    t = _tracker()
    n = 5
    rgbs, depths = _video(t, pose, n)
    calls = []

    def rgb_src(a, b):
        calls.append((a, b))
        return rgbs[a:b]

    chunked = t.track_video_chunked(pose, rgb_src,
                                    lambda a, b: depths[a:b],
                                    chunk_size=2, n_frames=n)
    whole = t.track_video(pose, rgbs, depths)
    np.testing.assert_allclose(chunked, whole, atol=1e-6)
    assert calls == [(0, 2), (2, 4), (4, 5)]


def test_stream_multi_hypothesis_scores():
    """StreamTracker(samples=4): windowed pushes refine 4 hypotheses per
    frame and surface per-frame health scores in [0, 1]; the winner
    trajectory stays near the (static-scene) init like the single path."""
    t = _tracker(head_scale=0.0)
    pose0 = np.eye(4, dtype=np.float32)
    pose0[2, 3] = 0.5
    rgb, depth = _video(t, pose0, 5)
    s = st.StreamTracker(t, window=True, samples=4)
    s.begin(pose0, image_hw=(H, W))
    for i in range(5):
        s.push(rgb[i], depth[i])
    poses = s.poses()
    scores = s.scores()
    assert poses.shape == (5, 4, 4) and np.isfinite(poses).all()
    assert scores.shape == (5,)
    assert (scores >= 0).all() and (scores <= 1).all()
    # static scene + zero heads: the perturbed hypotheses must not beat
    # the true-pose hypothesis by much — trajectory stays close to init
    assert np.linalg.norm(poses[-1][:3, 3] - pose0[:3, 3]) < 0.02
    # a second begin() resets score history
    s.begin(pose0, image_hw=(H, W))
    assert s.scores().shape == (0,)


def test_adaptive_bucket_and_pack_buffer():
    """Velocity-adaptive window sizing: static scenes get the small
    32px-quantized bucket; center motion and containment violations widen
    it; the staging pack buffer is reused per size."""
    t = _tracker()
    s = st.StreamTracker(t, window=True)
    s.begin(np.eye(4, dtype=np.float32) @ np.diag([1, 1, 1, 1]).astype(np.float32),
            image_hw=(H, W))
    s._hw = (480, 640)
    s._cur_bucket = None
    side0 = s._bucket(196.0)           # static: pad = base_pad only
    assert side0 % 32 == 0
    assert side0 <= 288                # far below the legacy 320 bucket
    # velocity widens the pad
    s._center_hist.clear()
    s._center_hist.append((0, np.array([100.0, 100.0])))
    s._center_hist.append((8, np.array([100.0, 180.0])))  # 10 px/frame
    s._cur_bucket = None
    side_v = s._bucket(196.0)
    assert side_v > side0
    # a containment violation permanently widens every future window
    s._center_hist.clear()
    s._pad_boost = 48.0
    s._cur_bucket = None
    assert s._bucket(196.0) > side0
    # legacy multiplicative sizing still available
    s2 = st.StreamTracker(t, window=True, margin=1.45)
    s2._hw = (480, 640)
    assert s2._bucket(196.0) == 320


def test_containment_violation_detected():
    """_roi_escaped flags a true ROI outside the uploaded rect, and the
    image-clipped part of the ROI does not false-positive at borders."""
    t = _tracker()
    s = st.StreamTracker(t, window=True)
    s._hw = (480, 640)
    rect = (100, 100, 256)             # top, left, side
    assert not s._roi_escaped((228.0, 228.0), 200.0, rect)   # centered
    assert s._roi_escaped((228.0, 330.0), 200.0, rect)       # off right
    assert s._roi_escaped((90.0, 228.0), 200.0, rect)        # off top
    # ROI hanging off the IMAGE is fine if its in-image part is covered
    rect_edge = (0, 0, 256)
    assert not s._roi_escaped((10.0, 10.0), 200.0, rect_edge)


@pytest.mark.slow
def test_stream_stats_and_violation_path():
    """End-to-end: a deliberately absurd teleport of the device pose is
    caught by the background containment check, counted, and widens the
    pad."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    t = _tracker()
    rgbs, depths = _video(t, pose, 1)
    s = st.StreamTracker(t, window=True, refetch_every=1)
    s.begin(pose, image_hw=(H, W))
    s.push(rgbs[0], depths[0])
    # teleport the tracked pose far from the window used at frame 0
    tele = np.eye(4, dtype=np.float32)
    tele[:3, 3] = [0.2, 0.15, 0.5]
    s._pose_dev = jax.device_put(jnp.asarray(tele))
    for _ in range(4):
        s.push(rgbs[0], depths[0])
    s._fetcher.shutdown(wait=True) if s._fetcher else None
    stats = s.stats()
    assert stats["refetches"] >= 1
    assert stats["containment_violations"] >= 1
    assert stats["pad_boost_px"] >= 16.0


def test_track_video_multi_scan_runs():
    """Whole-video multi-hypothesis scan: finite poses + health scores."""
    from iros20_6d_pose_tracking_tpu.tracking import hypotheses as hy

    t = _tracker(head_scale=0.0)
    pose0 = np.eye(4, dtype=np.float32)
    pose0[2, 3] = 0.5
    rgb, depth = _video(t, pose0, 4)
    poses, scores = hy.track_video_multi(
        t.model, t.cfg, t.variables, t.mesh, t.K, t.mean, t.std,
        jnp.asarray(pose0), jnp.asarray(rgb), jnp.asarray(depth),
        jax.random.PRNGKey(0), samples=3)
    assert poses.shape == (4, 4, 4) and np.isfinite(np.asarray(poses)).all()
    assert scores.shape == (4,)
    assert float(scores[0]) > 0.5  # true pose on a clean scene


def test_stream_closed_loop_reinit():
    """samples>=2 + ReinitPolicy close the failure loop LIVE: black
    frames collapse the depth-agreement health, the policy fires on the
    background fetch thread, on_track_lost's returned pose is applied by
    the next push (the live analog of eval's long_horizon_eval loop)."""
    import time

    from iros20_6d_pose_tracking_tpu.tracking.hypotheses import ReinitPolicy

    t = _tracker(head_scale=0.0)
    pose0 = np.eye(4, dtype=np.float32)
    pose0[2, 3] = 0.5
    rgb, depth = _video(t, pose0, 1)
    calls = []

    def on_lost(idx, score):
        calls.append((idx, score))
        return pose0  # external re-detection

    s = st.StreamTracker(t, window=True, samples=2, refetch_every=1,
                         reinit_policy=ReinitPolicy(patience=2),
                         on_track_lost=on_lost)
    s.begin(pose0, image_hw=(H, W))
    for _ in range(3):  # healthy warmup: policy must NOT fire
        s.push(rgb[0], depth[0])
        _ = s.current_pose()
        time.sleep(0.05)  # let the background fetch consume the score
    assert s.track_lost_events == 0

    black_rgb = np.zeros_like(rgb[0])
    black_dep = np.zeros_like(depth[0])
    gen_before = s._gen
    for _ in range(20):  # blackout: health ~0 -> policy fires
        s.push(black_rgb, black_dep)
        _ = s.current_pose()
        time.sleep(0.05)
        if s.track_lost_events and s._gen > gen_before:
            break
    assert s.track_lost_events >= 1
    assert calls and calls[0][1] < 0.3  # fired on a collapsed score
    assert s._gen > gen_before          # returned pose applied (set_pose)
    assert s.stats()["track_lost_events"] == s.track_lost_events

    # samples=1 cannot provide a health score: constructor refuses
    with pytest.raises(ValueError):
        st.StreamTracker(t, samples=1, reinit_policy=ReinitPolicy())
