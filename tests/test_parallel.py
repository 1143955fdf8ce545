"""SPMD tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iros20_6d_pose_tracking_tpu.data import augment as A
from iros20_6d_pose_tracking_tpu.models import tracknet
from iros20_6d_pose_tracking_tpu.parallel import spmd
from iros20_6d_pose_tracking_tpu.train import trainer as tr

RES = 32


def _cfg(batch):
    return tr.TrainConfig(
        resolution=RES, batch_size=batch,
        aug=A.AugmentConfig(blur_prob=0.0, black_cover_prob=0.0),
    )


def _raw(rng, *lead):
    poses = np.tile(np.eye(4, dtype=np.float32), lead + (1, 1))
    poses[..., 2, 3] = 0.6
    return {
        "rgbA": rng.rand(*lead, RES, RES, 3).astype(np.float32) * 255,
        "depthA": np.full(lead + (RES, RES), 600, np.float32),
        "rgbB": rng.rand(*lead, RES, RES, 3).astype(np.float32) * 255,
        "depthB": np.full(lead + (RES, RES), 600, np.float32),
        "maskB": np.ones(lead + (RES, RES), np.uint8),
        "A_in_cam": poses,
        "B_in_cam": poses.copy(),
    }


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = spmd.make_mesh(8, obj=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("obj", "dp")


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    """DP-sharded step must produce the same loss/params as unsharded."""
    mesh = spmd.make_mesh(8, obj=1)
    cfg = _cfg(batch=8)
    model = tracknet.Se3TrackNet(image_size=RES)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=100)
    state0 = tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    raw = _raw(rng, 8)
    key = jax.random.PRNGKey(1)
    mean, std = jnp.zeros(8), jnp.full(8, 100.0)

    s_ref, m_ref = tr.train_step(model, tx, cfg, state0, key, raw, mean, std)

    state0b = tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    step = spmd.dp_train_step(model, tx, cfg, mesh)
    with mesh:
        s_dp, m_dp = step(state0b, key, raw, mean, std)
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    a = jax.tree.leaves(s_ref.params)[0]
    b = jax.tree.leaves(s_dp.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_ensemble_train_step():
    """Two independent object models train in one jitted SPMD step."""
    mesh = spmd.make_mesh(8, obj=2)
    dp = 4
    cfg = _cfg(batch=dp)
    model = tracknet.Se3TrackNet(image_size=RES)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=100)
    states = [tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(i))
              for i in range(2)]
    ens = spmd.stack_states(states)
    ens = spmd.shard_pytree(ens, mesh, "obj")
    rng = np.random.RandomState(1)
    raw = _raw(rng, 2, dp)
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    mean, std = jnp.zeros(8), jnp.full(8, 100.0)

    step = spmd.ensemble_train_step(model, tx, cfg, mesh)
    with mesh:
        new_ens, metrics = step(ens, keys, raw, mean, std)
    loss = np.asarray(metrics["loss"])
    assert loss.shape == (2,)
    assert np.isfinite(loss).all()
    # The two object models started different and stay different.
    k = jax.tree.leaves(new_ens.params)[0]
    assert not np.allclose(np.asarray(k)[0], np.asarray(k)[1])


@pytest.mark.slow
def test_ensemble_step_matches_per_object_single_device():
    """ensemble (obj=2) x dp=4 must reproduce each object's single-device
    gradients: the vmap over objects and the within-object gradient
    all-reduce may not change the math (GSPMD regression guard).

    Uses SGD so new_params = params - lr * grad exposes the gradient
    directly (Adam's step-1 update is ~sign(grad) * lr, which amplifies
    f32 reduction-order noise on near-zero grads into full lr flips)."""
    import optax

    mesh = spmd.make_mesh(8, obj=2)
    dp = 4
    cfg = _cfg(batch=dp)
    model = tracknet.Se3TrackNet(image_size=RES)
    tx = optax.sgd(0.01)
    states = [tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(i))
              for i in range(2)]
    rng = np.random.RandomState(7)
    raw = _raw(rng, 2, dp)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    mean, std = jnp.zeros(8), jnp.full(8, 100.0)

    # reference: each object stepped alone on one device
    ref = [tr.train_step(model, tx, cfg, states[i], keys[i],
                         jax.tree.map(lambda x: x[i], raw), mean, std)
           for i in range(2)]

    states2 = [tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(i))
               for i in range(2)]
    ens = spmd.shard_pytree(spmd.stack_states(states2), mesh, "obj")
    step = spmd.ensemble_train_step(model, tx, cfg, mesh)
    with mesh:
        new_ens, metrics = step(ens, keys, raw, mean, std)

    loss = np.asarray(metrics["loss"])
    for i in range(2):
        np.testing.assert_allclose(loss[i], float(ref[i][1]["loss"]),
                                   rtol=1e-5)
    ens_flat = jax.tree.leaves(new_ens.params)
    for i in range(2):
        for el, rl in zip(ens_flat, jax.tree.leaves(ref[i][0].params)):
            np.testing.assert_allclose(np.asarray(el)[i], np.asarray(rl),
                                       atol=1e-5)


@pytest.mark.slow
def test_output_shardings_pinned():
    """Output layouts are contracts: dp params stay fully replicated,
    ensemble params stay 'obj'-sharded on the leading axis."""
    from jax.sharding import PartitionSpec as P

    cfg = _cfg(batch=8)
    model = tracknet.Se3TrackNet(image_size=RES)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=100)
    rng = np.random.RandomState(0)
    mean, std = jnp.zeros(8), jnp.full(8, 100.0)

    mesh = spmd.make_mesh(8, obj=1)
    state = tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    with mesh:
        s_dp, _ = spmd.dp_train_step(model, tx, cfg, mesh)(
            state, jax.random.PRNGKey(1), _raw(rng, 8), mean, std)
    for leaf in jax.tree.leaves(s_dp.params):
        assert leaf.sharding.is_fully_replicated, leaf.sharding

    mesh2 = spmd.make_mesh(8, obj=2)
    cfg2 = _cfg(batch=4)
    states = [tr.create_train_state(model, cfg2, tx, jax.random.PRNGKey(i))
              for i in range(2)]
    ens = spmd.shard_pytree(spmd.stack_states(states), mesh2, "obj")
    with mesh2:
        new_ens, _ = spmd.ensemble_train_step(model, tx, cfg2, mesh2)(
            ens, jax.random.split(jax.random.PRNGKey(3), 2),
            _raw(rng, 2, 4), mean, std)
    for leaf in jax.tree.leaves(new_ens.params):
        spec = leaf.sharding.spec
        assert len(spec) >= 1 and spec[0] == "obj", leaf.sharding


@pytest.mark.slow
def test_sp_sharded_render_and_step_match_single_device():
    """Face-sharded (SP) render + track step over the 8-device mesh must
    reproduce the single-device path: the pmax z-test / argmax and the
    psum'd attribute rows may not change a pixel or the pose."""
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.parallel import latency as lat
    from iros20_6d_pose_tracking_tpu.render import mesh as M
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
    from iros20_6d_pose_tracking_tpu.tracking import tracker as trk
    from iros20_6d_pose_tracking_tpu.ops import roi as roi_ops

    # Drain all devices first: a straggler collective from a previous
    # test's ('obj','dp') program can deadlock this test's [0..8)
    # rendezvous on the CPU backend (same guard as __graft_entry__).
    for d in jax.devices():
        np.asarray(jax.device_put(np.float32(0), d))

    res = 48
    K = jnp.array([[200.0, 0, 24.0], [0, 200.0, 24.0], [0, 0, 1.0]])
    pose = jnp.eye(4).at[2, 3].set(0.5)
    tm = M.make_cube(0.08)
    mesh_single = rz.upload(tm)
    spm = lat.sp_mesh(8)
    smesh = lat.shard_mesh_faces(mesh_single, spm)
    cfg = trk.TrackerConfig(resolution=res, object_width_mm=150.0)

    bbox = roi_ops.compute_bbox(pose, K, cfg.object_width_mm,
                                (1000.0, 1000.0, 1000.0))
    rgb_ref, d_ref = rz.render(mesh_single, pose, K,
                               rz.window_from_bbox(bbox), out_hw=(res, res))
    with spm:
        render = jax.jit(lat.sharded_render(cfg, spm))
        rgb_sp, d_sp = render(smesh.fverts, smesh.fcolors, smesh.fnormals,
                              smesh.fmask, pose, K, bbox)
    np.testing.assert_allclose(np.asarray(d_sp), np.asarray(d_ref),
                               atol=0.02)  # mm; z-tie winner slack
    bad = np.abs(np.asarray(rgb_sp) - np.asarray(rgb_ref)).max(-1) > 2.0
    assert bad.mean() < 2e-3
    assert (np.asarray(d_sp) > 0).sum() > 100

    # full step equivalence
    model = tracknet.Se3TrackNet(image_size=res)
    variables = tracknet.init_variables(model, jax.random.PRNGKey(0))
    frame_rgb, frame_depth = rz.render(
        mesh_single, pose, K, rz.full_frame_window(48, 48), out_hw=(48, 48))
    mean, std = jnp.zeros(8), jnp.full(8, 100.0)
    ref_pose, _ = trk.track_step(model, cfg, variables, mesh_single, K,
                                 mean, std, pose, frame_rgb, frame_depth)
    with spm:
        step = lat.sp_track_step(model, cfg, spm)
        sp_pose = step(variables, smesh, K, mean, std, pose, frame_rgb,
                       frame_depth)
    np.testing.assert_allclose(np.asarray(sp_pose), np.asarray(ref_pose),
                               atol=1e-5)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape == (4, 4)


@pytest.mark.slow
def test_multi_object_track_videos():
    """Two objects with different meshes/widths tracked in one SPMD
    program over the ('obj', 'dp') mesh."""
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.render import mesh as M
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
    from iros20_6d_pose_tracking_tpu.tracking import tracker as trk

    mesh = spmd.make_mesh(8, obj=2)
    res = 48
    model = tracknet.Se3TrackNet(image_size=res)
    cfg = trk.TrackerConfig(resolution=res)

    tms = [M.make_icosphere(subdiv=2, radius=0.05), M.make_cube(0.08)]
    ens_meshes = spmd.stack_meshes(tms)
    assert ens_meshes.fverts.shape[0] == 2

    # Zero-head variables so poses stay at init (plumbing check).
    ens_vars = []
    for i in range(2):
        v = tracknet.init_variables(model, jax.random.PRNGKey(i))
        p = v["params"]
        for head in ("trans_out", "rot_out"):
            p[head]["kernel"] = jnp.zeros_like(p[head]["kernel"])
            p[head]["bias"] = jnp.zeros_like(p[head]["bias"])
        ens_vars.append({"params": p, "batch_stats": v["batch_stats"]})
    ens_vars = jax.tree.map(lambda *xs: jnp.stack(xs), *ens_vars)

    K = jnp.array([[200.0, 0, 24.0], [0, 200.0, 24.0], [0, 0, 1.0]])
    pose = jnp.eye(4).at[2, 3].set(0.5)
    init_poses = jnp.stack([pose, pose])
    widths = jnp.array([110.0, 150.0])

    frames = []
    for tm in tms:
        rgb, depth = rz.render(rz.upload(tm), pose, K,
                               rz.full_frame_window(48, 48), out_hw=(48, 48))
        frames.append((jnp.stack([rgb] * 3), jnp.stack([depth] * 3)))
    frames_rgb = jnp.stack([f[0] for f in frames])
    frames_depth = jnp.stack([f[1] for f in frames])

    run = spmd.multi_object_track_videos(model, cfg, mesh)
    with mesh:
        poses = run(ens_vars, ens_meshes, K, jnp.zeros(8), jnp.full(8, 100.0),
                    init_poses, frames_rgb, frames_depth, widths)
    assert poses.shape == (2, 3, 4, 4)
    np.testing.assert_allclose(np.asarray(poses[0, -1]), np.asarray(pose),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(poses[1, -1]), np.asarray(pose),
                               atol=1e-6)
