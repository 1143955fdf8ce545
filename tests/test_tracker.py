"""Tracking-step plumbing tests (zero-delta identity, scan, API parity)."""
import numpy as np
import jax
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.models import tracknet
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
from iros20_6d_pose_tracking_tpu.tracking import tracker as trk

RES = 64
K = np.array([[300.0, 0, 32.0], [0, 300.0, 32.0], [0, 0, 1.0]], np.float32)


def _setup(zero_heads=False):
    model = tracknet.Se3TrackNet(image_size=RES)
    variables = tracknet.init_variables(model, jax.random.PRNGKey(0))
    if zero_heads:
        params = variables["params"]
        for head in ("trans_out", "rot_out"):
            params[head]["kernel"] = jnp.zeros_like(params[head]["kernel"])
            params[head]["bias"] = jnp.zeros_like(params[head]["bias"])
        variables = {"params": params, "batch_stats": variables["batch_stats"]}
    mesh = rz.upload(M.make_icosphere(subdiv=2, radius=0.05))
    cfg = trk.TrackerConfig(resolution=RES, object_width_mm=110.0)
    mean = jnp.zeros(8)
    std = jnp.ones(8) * 100.0
    return model, cfg, variables, mesh, mean, std


def _frame(mesh, pose):
    rgb, depth = rz.render(
        mesh, jnp.asarray(pose, jnp.float32), jnp.array(K),
        rz.full_frame_window(64, 64), out_hw=(64, 64),
    )
    return rgb, depth


def test_zero_head_keeps_pose():
    """tanh(0)=0 delta must decode to exactly the previous pose
    (datasets.py:159-175 inverse codec)."""
    model, cfg, variables, mesh, mean, std = _setup(zero_heads=True)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    rgb, depth = _frame(mesh, pose)
    new_pose, aux = trk.track_step(
        model, cfg, variables, mesh, jnp.array(K), mean, std,
        jnp.array(pose), rgb, depth,
    )
    np.testing.assert_allclose(np.array(new_pose), pose, atol=1e-6)
    # The rendered branch actually rendered the object.
    assert np.array(aux["depthA"]).max() > 0
    assert np.array(aux["depthB"]).max() > 0


def test_track_step_bounded_update():
    """Any network output is tanh-bounded: pose change <= normalizers."""
    model, cfg, variables, mesh, mean, std = _setup()
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.02, -0.01, 0.55]
    rgb, depth = _frame(mesh, pose)
    new_pose, _ = trk.track_step(
        model, cfg, variables, mesh, jnp.array(K), mean, std,
        jnp.array(pose), rgb, depth,
    )
    dt = np.linalg.norm(np.array(new_pose)[:3, 3] - pose[:3, 3])
    assert dt <= np.sqrt(3) * cfg.trans_normalizer + 1e-6


def test_track_video_scan():
    model, cfg, variables, mesh, mean, std = _setup(zero_heads=True)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 0.5]
    rgb, depth = _frame(mesh, pose)
    frames_rgb = jnp.stack([rgb] * 4)
    frames_depth = jnp.stack([depth] * 4)
    poses = trk.track_video(
        model, cfg, variables, mesh, jnp.array(K), mean, std,
        jnp.array(pose), frames_rgb, frames_depth,
    )
    assert poses.shape == (4, 4, 4)
    np.testing.assert_allclose(np.array(poses[-1]), pose, atol=1e-6)


def test_auto_cull_rejects_inward_normals():
    """A closed mesh whose file normals point INWARD (common CAD/PLY
    export error) must not auto-enable backface culling: the
    normal-oriented mask (rasterizer._backface_mask) would keep the far
    surface. is_closed alone passes (winding is still consistent after a
    flip), so the Tracker also requires is_outward_oriented."""
    sphere = M.make_icosphere(subdiv=2, radius=0.05)
    real = sphere.faces[: sphere.num_faces]
    inside_out = M.TriMesh(
        verts=sphere.verts,
        faces=np.concatenate(
            [real[:, ::-1], sphere.faces[sphere.num_faces:]]),
        colors=sphere.colors,
        normals=-sphere.normals,
        num_faces=sphere.num_faces,
    )
    assert M.is_closed(inside_out.verts,
                       inside_out.faces[: inside_out.num_faces])
    assert M.is_outward_oriented(sphere.verts, real, sphere.normals)
    assert not M.is_outward_oriented(
        inside_out.verts, inside_out.faces[: inside_out.num_faces],
        inside_out.normals)
    dataset_info = {
        "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": 32.0,
                   "centerY": 32.0, "width": 64, "height": 64},
        "resolution": RES,
    }
    t = trk.Tracker(dataset_info, np.zeros(8), np.ones(8) * 100.0,
                    mesh=inside_out)
    assert t.cfg.cull_backfaces is False
    t2 = trk.Tracker(dataset_info, np.zeros(8), np.ones(8) * 100.0,
                     mesh=sphere)
    assert t2.cfg.cull_backfaces is True


def test_tracker_class_api():
    """Reference-shaped constructor + on_track (predict.py:127-296)."""
    dataset_info = {
        "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": 32.0,
                   "centerY": 32.0, "width": 64, "height": 64},
        "resolution": RES,
        "boundingbox": 10,
    }
    sphere = M.make_icosphere(subdiv=2, radius=0.05)
    t = trk.Tracker(
        dataset_info, np.zeros(8), np.ones(8) * 100.0, mesh=sphere,
    )
    # object width from diameter + 10% pad: ~110 mm.
    assert 95.0 < t.object_width < 125.0
    # auto renderer selection: XLA path on the CPU test backend, and
    # backface culling auto-enabled for the watertight sphere.
    assert t.cfg.render_impl == "xla"
    assert t.cfg.cull_backfaces is True
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 0.5]
    rgb, depth = _frame(t.mesh, pose.astype(np.float32))
    out = t.on_track(pose, np.array(rgb), np.array(depth))
    assert out.shape == (4, 4)
    assert abs(out[2, 3] - 0.5) < t.cfg.trans_normalizer + 1e-6


def test_bf16_step_matches_f32():
    """--bf16 inference: the bf16-activation model's single-step pose
    update agrees with f32 to sub-mm / sub-millidegree on the same f32
    weights, and a short bf16 trajectory stays glued to the f32 one —
    the accuracy side of the bench's tracking_hz_bf16 row."""
    model32, cfg, variables, mesh, mean, std = _setup()
    model16 = tracknet.Se3TrackNet(image_size=RES, dtype=jnp.bfloat16)
    cfg16 = trk.TrackerConfig(resolution=RES, object_width_mm=110.0,
                              dtype=jnp.bfloat16)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.01, -0.005, 0.5]
    rgb, depth = _frame(mesh, pose)
    p32, _ = trk.track_step(model32, cfg, variables, mesh, jnp.array(K),
                            mean, std, jnp.array(pose), rgb, depth)
    p16, _ = trk.track_step(model16, cfg16, variables, mesh, jnp.array(K),
                            mean, std, jnp.array(pose), rgb, depth)
    p32, p16 = np.asarray(p32), np.asarray(p16)
    assert np.linalg.norm(p16[:3, 3] - p32[:3, 3]) < 1e-3      # < 1 mm
    assert np.abs(p16[:3, :3] - p32[:3, :3]).max() < 5e-3      # ~0.3 deg

    T = 8
    frames_rgb = jnp.broadcast_to(rgb, (T,) + rgb.shape)
    frames_dep = jnp.broadcast_to(depth, (T,) + depth.shape)
    tr32 = np.asarray(trk.track_video(model32, cfg, variables, mesh,
                                      jnp.array(K), mean, std,
                                      jnp.array(pose), frames_rgb,
                                      frames_dep))
    tr16 = np.asarray(trk.track_video(model16, cfg16, variables, mesh,
                                      jnp.array(K), mean, std,
                                      jnp.array(pose), frames_rgb,
                                      frames_dep))
    assert np.isfinite(tr16).all()
    assert np.linalg.norm(tr16[-1][:3, 3] - tr32[-1][:3, 3]) < 5e-3


def test_frame_scan_matches_flat_scan():
    """frame_scan (nested scan — shared-device contention immunity) is
    BITWISE-equal to a flat lax.scan: same carries, same stacked outputs,
    for multi-leaf xs/ys pytrees and non-trivial dtypes."""
    def step(carry, x):
        a, b = x
        new = carry * 0.9 + jnp.sum(a) * 1e-3 - jnp.mean(b)
        return new, (new, carry)

    T = 7
    key = jax.random.PRNGKey(0)
    xs = (jax.random.normal(key, (T, 3, 4)),
          jax.random.uniform(jax.random.fold_in(key, 1), (T, 5)))
    init = jnp.float32(1.5)
    c_flat, y_flat = jax.lax.scan(step, init, xs)
    c_nest, y_nest = trk.frame_scan(step, init, xs)
    assert np.asarray(c_flat) == np.asarray(c_nest)
    for yf, yn in zip(y_flat, y_nest):
        assert yf.shape == yn.shape
        np.testing.assert_array_equal(np.asarray(yf), np.asarray(yn))

    # and through the real tracker program: track_video output poses are
    # identical to a flat-scan reimplementation of the same step
    model, cfg, variables, mesh, mean, std = _setup()
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.01, -0.005, 0.5]
    rgb, depth = _frame(mesh, pose)
    Tv = 5
    frames_rgb = jnp.broadcast_to(rgb, (Tv,) + rgb.shape)
    frames_dep = jnp.broadcast_to(depth, (Tv,) + depth.shape)

    def flat_step(p, frame):
        r, d = frame
        np_, _ = trk.track_step(model, cfg, variables, mesh, jnp.array(K),
                                mean, std, p, r, d)
        return np_, np_

    @jax.jit
    def flat_video(p0, fr, fd):
        _, poses = jax.lax.scan(flat_step, p0, (fr, fd))
        return poses

    got = np.asarray(trk.track_video(model, cfg, variables, mesh,
                                     jnp.array(K), mean, std,
                                     jnp.array(pose), frames_rgb,
                                     frames_dep))
    want = np.asarray(flat_video(jnp.array(pose), frames_rgb, frames_dep))
    # the scan TRANSFORM is exact (above); the full compiled program may
    # fuse differently between the two loop structures, so the whole-
    # trajectory comparison allows float-ulp accumulation (measured 0.0
    # on the TPU bench program, ~1e-6 on CPU)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)
