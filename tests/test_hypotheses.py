"""Multi-hypothesis tracking + track-health tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.models import tracknet
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
from iros20_6d_pose_tracking_tpu.tracking import tracker as trk
from iros20_6d_pose_tracking_tpu.tracking import hypotheses as hy

RES = 64
K = jnp.array([[300.0, 0, 32.0], [0, 300.0, 32.0], [0, 0, 1.0]])


def _setup():
    mesh = rz.upload(M.make_icosphere(subdiv=2, radius=0.05))
    cfg = trk.TrackerConfig(resolution=RES, object_width_mm=110.0)
    pose = jnp.eye(4).at[2, 3].set(0.5)
    rgb, depth = rz.render(mesh, pose, K, rz.full_frame_window(64, 64),
                           out_hw=(64, 64))
    return mesh, cfg, pose, rgb, depth


def test_health_high_at_truth_low_off_pose():
    mesh, cfg, pose, rgb, depth = _setup()
    good = float(hy.depth_agreement(mesh, pose, K, depth, cfg))
    assert good > 0.9, good
    off = pose.at[0, 3].add(0.05).at[2, 3].add(0.06)
    bad = float(hy.depth_agreement(mesh, off, K, depth, cfg))
    assert bad < 0.5, bad
    nowhere = pose.at[0, 3].add(0.4)
    assert float(hy.depth_agreement(mesh, nowhere, K, depth, cfg)) == 0.0


def test_health_tolerates_occlusion():
    mesh, cfg, pose, rgb, depth = _setup()
    # Occlude half the object with a nearer surface.
    occ = jnp.where(
        (jnp.arange(64)[None, :] < 32) & (depth > 0), 300.0, depth
    )
    score = float(hy.depth_agreement(mesh, pose, K, occ, cfg))
    assert score > 0.85, score  # occluded pixels excluded from denominator


@pytest.mark.slow
def test_multi_hypothesis_selects_better_pose():
    """With a zeroed network (identity update), the winner must be the
    hypothesis closest to the truth — here the unperturbed pose 0 when
    the prior is correct."""
    mesh, cfg, pose, rgb, depth = _setup()
    model = tracknet.Se3TrackNet(image_size=RES)
    variables = tracknet.init_variables(model, jax.random.PRNGKey(0))
    params = variables["params"]
    for head in ("trans_out", "rot_out"):
        params[head]["kernel"] = jnp.zeros_like(params[head]["kernel"])
        params[head]["bias"] = jnp.zeros_like(params[head]["bias"])
    variables = {"params": params, "batch_stats": variables["batch_stats"]}
    mean, std = jnp.zeros(8), jnp.full(8, 100.0)

    new_pose, score, aux = hy.track_step_multi(
        model, cfg, variables, mesh, K, mean, std, pose, rgb, depth,
        jax.random.PRNGKey(3), samples=4,
    )
    assert float(score) > 0.9
    np.testing.assert_allclose(np.array(new_pose), np.array(pose), atol=1e-6)
    scores = np.array(aux["scores"])
    assert scores[0] >= scores[1:].max() - 1e-6  # truth hypothesis wins

    # Start from a drifted prior: some perturbation should beat it or at
    # least the scores must reflect the geometry (winner score >= prior's).
    drifted = pose.at[0, 3].add(0.02)
    _, score_d, aux_d = hy.track_step_multi(
        model, cfg, variables, mesh, K, mean, std, drifted, rgb, depth,
        jax.random.PRNGKey(4), samples=8,
    )
    assert float(score_d) >= float(np.array(aux_d["scores"])[0]) - 1e-6


def test_reinit_policy():
    p = hy.ReinitPolicy(threshold=0.3, patience=2)
    assert not p.update(0.9)
    assert not p.update(0.1)
    assert p.update(0.1)       # second consecutive bad frame
    assert not p.update(0.9)   # recovers
    assert p.bad_streak == 0


def test_tracker_on_track_samples():
    """Tracker.on_track(samples=N) runs the multi-hypothesis path and
    records a health score."""
    from iros20_6d_pose_tracking_tpu.tracking.tracker import Tracker

    dataset_info = {
        "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": 32.0,
                   "centerY": 32.0, "width": 64, "height": 64},
        "resolution": RES, "boundingbox": 10,
    }
    tm = M.make_icosphere(subdiv=2, radius=0.05)
    t = Tracker(dataset_info, np.zeros(8), np.full(8, 100.0), mesh=tm)
    pose = np.eye(4)
    pose[2, 3] = 0.5
    rgb, depth = rz.render(t.mesh, jnp.asarray(pose, jnp.float32), K,
                           rz.full_frame_window(64, 64), out_hw=(64, 64))
    out = t.on_track(pose, np.asarray(rgb), np.asarray(depth), samples=4)
    assert out.shape == (4, 4)
    assert 0.0 <= t.last_score <= 1.0


def test_track_video_with_health():
    mesh = rz.upload(M.make_cube(0.08))
    cfg = trk.TrackerConfig(resolution=RES, object_width_mm=155.0)
    model = tracknet.Se3TrackNet(image_size=RES)
    variables = tracknet.init_variables(model, jax.random.PRNGKey(0))
    p = variables["params"]
    for h in ("trans_out", "rot_out"):
        p[h]["kernel"] = jnp.zeros_like(p[h]["kernel"])
        p[h]["bias"] = jnp.zeros_like(p[h]["bias"])
    variables = {"params": p, "batch_stats": variables["batch_stats"]}
    pose = jnp.eye(4).at[2, 3].set(0.5)
    rgb, depth = rz.render(mesh, pose, K, rz.full_frame_window(64, 64),
                           out_hw=(64, 64))
    poses, scores = hy.track_video_with_health(
        model, cfg, variables, mesh, K, jnp.zeros(8), jnp.full(8, 100.0),
        pose, jnp.stack([rgb] * 3), jnp.stack([depth] * 3),
    )
    assert poses.shape == (3, 4, 4) and scores.shape == (3,)
    assert float(np.array(scores).min()) > 0.9  # perfect hold -> healthy
