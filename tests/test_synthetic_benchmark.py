"""Synthetic accuracy benchmark harness (eval/synthetic_benchmark.py):
object factories, trajectory/video generation, and the tiny-scale
train->track->score loop the demo and benchmarks/accuracy_suite.py use."""
import numpy as np
import jax
import pytest

from iros20_6d_pose_tracking_tpu.eval import synthetic_benchmark as SB
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz

K = np.array([[250.0, 0, 32.0], [0, 250.0, 32.0], [0, 0, 1.0]], np.float32)
# small-frame intrinsics: YCB_K's principal point (312, 241) lies outside
# tiny test frames, so videos/tracking here use this instead
K_SMALL = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]],
                   np.float32)


def test_object_factories_render():
    """Every suite object builds, uploads, and renders something."""
    for name, factory in SB.OBJECTS.items():
        tm = factory()
        assert tm.num_faces > 0, name
        mesh = rz.upload(tm)
        import jax.numpy as jnp

        pose = jnp.eye(4).at[2, 3].set(0.5)
        _, depth = rz.render(mesh, pose, jnp.asarray(K),
                             rz.full_frame_window(64, 64), out_hw=(64, 64))
        assert float(depth.max()) > 0, f"{name} renders nothing"


def test_gt_trajectory_stays_in_range():
    gt = SB.make_gt_trajectory(40, seed=1)
    assert gt.shape == (40, 4, 4)
    z = gt[:, 2, 3]
    assert (z >= 0.45 - 1e-6).all() and (z <= 0.9 + 1e-6).all()
    # per-frame deltas stay inside the 0.02 m / 15 deg normalizers
    dt = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1)
    assert dt.max() < 0.02


def test_hard_video_has_background_and_occlusion():
    mesh = rz.upload(M.make_cube(0.08))
    gt = SB.make_gt_trajectory(6)
    rgb_c, depth_c = SB.render_test_video(mesh, gt, K=K_SMALL,
                                          hw=(48, 64), hard=False,
                                          impl="xla")
    rgb_h, depth_h = SB.render_test_video(mesh, gt, K=K_SMALL,
                                          hw=(48, 64), hard=True,
                                          impl="xla")
    assert rgb_c.shape == rgb_h.shape == (6, 48, 64, 3)
    d_c, d_h = np.asarray(depth_c), np.asarray(depth_h)
    # clean background is empty; hard background carries valid depth
    assert (d_c[0] > 0).any() and (d_c[0][d_c[0] > 0] < 1200).all()
    assert (d_h > 1200).mean() > 0.3


@pytest.mark.slow
def test_tiny_suite_end_to_end():
    """A miniature run of the full accuracy loop on CPU."""
    obj = SB.train_object(M.make_cube(0.08), K=K_SMALL, name="cube",
                          steps=3, batch=4, res=48, impl="xla",
                          log=lambda *a: None)
    gt = SB.make_gt_trajectory(4)
    fr, fd = SB.render_test_video(obj.mesh, gt, K=K_SMALL, hw=(48, 64),
                                  hard=True, impl="xla")
    r = SB.evaluate_tracking(obj, gt, fr, fd, K=K_SMALL)
    for k in ("add_auc", "adi_auc", "add_mean_mm", "baseline_add_mean_mm"):
        assert np.isfinite(r[k]), k
    assert r["add"].shape == (4,)


def test_ensemble_sampler_shapes_and_divergence():
    """ensemble_synth_batch renders per-object pair batches in one
    program: correct (O, B, ...) shapes, finite labels, and the two
    objects' renders actually differ (per-object mesh + traced width)."""
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.data.dataset import (
        DRComposite, ensemble_synth_batch)
    from iros20_6d_pose_tracking_tpu.parallel import spmd

    tms = [M.make_cube(0.08), M.make_box((0.10, 0.06, 0.035))]
    ens = spmd.stack_meshes(tms)
    widths = jnp.asarray([tm.diameter * 1000 * 1.1 for tm in tms])
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    raw = ensemble_synth_batch(
        ens, jnp.asarray(K_SMALL), keys, widths, 3, 48, 0.02, 15.0,
        ((-0.05, 0.05), (-0.05, 0.05), (0.45, 0.7)), DRComposite())
    assert raw["rgbA"].shape == (2, 3, 48, 48, 3)
    assert raw["rgbA"].dtype == jnp.uint8        # PNG-fidelity transfer
    assert raw["depthA"].dtype == jnp.uint16     # (4x less HBM than f32)
    assert raw["A_in_cam"].shape == (2, 3, 4, 4)
    for v in raw.values():
        assert np.isfinite(np.asarray(v, np.float32)).all()
    d = np.asarray(raw["depthA"], np.float32)
    assert float(np.abs(d[0] - d[1]).max()) > 1.0


@pytest.mark.slow
def test_tiny_ensemble_training_end_to_end():
    """train_objects_ensemble: two objects trained simultaneously; the
    returned BenchObjects track and score like sequential ones, with
    DIFFERENT per-object weights and normalization stats."""
    objs = SB.train_objects_ensemble(
        ("cube", "box"), K=K_SMALL, steps=3, batch=4, res=48, impl="xla",
        log=lambda *a: None)
    assert len(objs) == 2
    m0 = np.asarray(objs[0].mean)
    m1 = np.asarray(objs[1].mean)
    assert m0.shape == (8,) and not np.allclose(m0, m1)
    p0 = jax.tree_util.tree_leaves(objs[0].variables["params"])[0]
    p1 = jax.tree_util.tree_leaves(objs[1].variables["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    gt = SB.make_gt_trajectory(3)
    fr, fd = SB.render_test_video(objs[0].mesh, gt, K=K_SMALL,
                                  hw=(48, 64), impl="xla")
    r = SB.evaluate_tracking(objs[0], gt, fr, fd, K=K_SMALL)
    assert np.isfinite(r["add_auc"])


def _random_bench_object(tm, name, seed, res=48, mean_off=0.0):
    """Untrained BenchObject (random weights) — enough to exercise the
    numerical tracking path without a training run."""
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.models import tracknet
    from iros20_6d_pose_tracking_tpu.tracking import tracker as trk

    model = tracknet.Se3TrackNet(image_size=res)
    variables = tracknet.init_variables(model, jax.random.PRNGKey(seed))
    w = tm.diameter * 1000 * 1.1
    return SB.BenchObject(
        name=name, tm=tm, mesh=rz.upload(tm), model=model,
        variables=variables, mean=jnp.full(8, mean_off),
        std=jnp.full(8, 100.0 + 10 * seed), width_mm=w,
        tcfg=trk.TrackerConfig(resolution=res, object_width_mm=w,
                               render_impl="xla"),
    )


@pytest.mark.slow
def test_ensemble_evaluate_tracking_matches_sequential():
    """One-program ensemble eval (multi_object_track_videos consumer)
    reproduces the sequential evaluate_tracking numbers per object —
    per-object weights, stats, widths, and meshes all plumbed through
    the stacked path."""
    objs = [
        _random_bench_object(M.make_cube(0.08), "cube", 0),
        _random_bench_object(M.make_box((0.10, 0.06, 0.035)), "box", 1,
                             mean_off=5.0),
    ]
    gt = SB.make_gt_trajectory(4)
    vids = []
    for o in objs:
        fr, fd = SB.render_test_video(o.mesh, gt, K=K_SMALL, hw=(48, 64),
                                      impl="xla")
        import jax.numpy as jnp

        vids.append((
            np.asarray(jnp.clip(jnp.round(fr), 0, 255).astype(jnp.uint8)),
            np.asarray(jnp.round(fd).astype(jnp.uint16)),
        ))
    ens = SB.ensemble_evaluate_tracking(
        objs, gt, np.stack([v[0] for v in vids]),
        np.stack([v[1] for v in vids]), K=K_SMALL)
    assert len(ens) == 2
    for o, v, e in zip(objs, vids, ens):
        seq = SB.evaluate_tracking(o, gt, v[0], v[1], K=K_SMALL)
        np.testing.assert_allclose(e["poses"], seq["poses"], atol=1e-4)
        assert e["add_auc"] == pytest.approx(seq["add_auc"], abs=0.05)
    # the two objects' trajectories actually differ (not one object
    # evaluated twice)
    assert np.abs(ens[0]["poses"] - ens[1]["poses"]).max() > 1e-4


@pytest.mark.slow
def test_shift_severity_sweep_smoke():
    """Severity 0 is the matched domain (near-zero shift): a hold-pose
    tracker on a static scene scores ~perfect there; rows carry the
    sweep schema."""
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.models import tracknet
    from iros20_6d_pose_tracking_tpu.tracking import tracker as trk

    tm = M.make_cube(0.08)
    model = tracknet.Se3TrackNet(image_size=48)
    variables = tracknet.init_variables(model, jax.random.PRNGKey(0))
    params = variables["params"]
    for head in ("trans_out", "rot_out"):
        params[head]["kernel"] = params[head]["kernel"] * 0.0
        params[head]["bias"] = params[head]["bias"] * 0.0
    w = tm.diameter * 1000 * 1.1
    obj = SB.BenchObject(
        name="cube", tm=tm, mesh=rz.upload(tm), model=model,
        variables={"params": params,
                   "batch_stats": variables["batch_stats"]},
        mean=jnp.zeros(8), std=jnp.full(8, 100.0), width_mm=w,
        tcfg=trk.TrackerConfig(resolution=48, object_width_mm=w,
                               render_impl="xla"),
    )
    pose0 = np.eye(4, dtype=np.float32)
    pose0[:3, 3] = [0.0, 0.0, 0.6]
    gt = np.tile(pose0[None], (3, 1, 1))
    rows = SB.shift_severity_sweep(obj, gt, hard=False, impl="xla",
                                   severities=(0.0,), K=K_SMALL,
                                   hw=(48, 64), log=lambda *a: None)
    assert len(rows) == 1 and rows[0]["severity"] == 0.0
    assert np.isfinite(rows[0]["add_auc"])


@pytest.mark.slow
def test_ensemble_checkpoint_resume(tmp_path):
    """Interrupting an ensemble run and resuming from its checkpoint
    reproduces the uninterrupted run's weights: RNG streams are keyed by
    the absolute step index, so steps k..N consume identical batches."""
    kw = dict(K=K_SMALL, batch=4, res=48, impl="xla",
              log=lambda *a: None)
    full = SB.train_objects_ensemble(("cube", "box"), steps=4, **kw)

    ck = str(tmp_path / "ck")
    # phase 1: run only steps 0..1 (ckpt_every=2 -> saves at step 2? no:
    # saves at i%2==0 and i>0 -> step 2). Interrupt by running steps=3.
    SB.train_objects_ensemble(("cube", "box"), steps=4, ckpt_dir=ck,
                              ckpt_every=2, **kw)
    # the completed run saved its last step (3); wipe nothing — resume
    # should be a no-op returning identical weights via step 3+1 == steps
    resumed = SB.train_objects_ensemble(("cube", "box"), steps=4,
                                        ckpt_dir=ck, ckpt_every=2, **kw)
    p_full = jax.tree_util.tree_leaves(full[0].variables["params"])[0]
    p_res = jax.tree_util.tree_leaves(resumed[0].variables["params"])[0]
    np.testing.assert_allclose(np.asarray(p_full), np.asarray(p_res),
                               atol=1e-6)

    # true interrupt: keep only a mid-run checkpoint (step 2), resume
    import json, os
    meta_p = os.path.join(ck, "ensemble_last.msgpack.json")
    meta = json.load(open(meta_p))
    assert meta["step"] == 3
    # rewrite metadata to pretend the run died right after step 2's save
    # is not possible without the step-2 state; instead rerun phase 1
    # with steps=3 into a fresh dir (saves at i==2 == steps-1)
    ck2 = str(tmp_path / "ck2")
    SB.train_objects_ensemble(("cube", "box"), steps=3, ckpt_dir=ck2,
                              ckpt_every=100, **kw)
    meta_p2 = os.path.join(ck2, "ensemble_last.msgpack.json")
    meta2 = json.load(open(meta_p2))
    meta2["total_steps"] = 4  # the interrupted run targeted 4 steps
    json.dump(meta2, open(meta_p2, "w"))
    resumed2 = SB.train_objects_ensemble(("cube", "box"), steps=4,
                                         ckpt_dir=ck2, **kw)
    p_res2 = jax.tree_util.tree_leaves(resumed2[0].variables["params"])[0]
    np.testing.assert_allclose(np.asarray(p_full), np.asarray(p_res2),
                               atol=1e-6)


@pytest.mark.slow
def test_train_object_checkpoint_resume(tmp_path):
    """Single-object (non-ensemble) training checkpoints and resumes to
    the uninterrupted run's exact weights — the path textured objects
    ride in ensemble suites (they can't join the stacked program)."""
    import json, os

    kw = dict(K=K_SMALL, name="cube", batch=4, res=48, impl="xla",
              log=lambda *a: None)
    full = SB.train_object(M.make_cube(0.08), steps=4, **kw)

    # interrupted run: steps=3 saves its last step (2) to the ckpt; then
    # retarget total_steps=4 in the metadata (as if the 4-step run died
    # right after step 2's periodic save) and resume to completion.
    ck = str(tmp_path / "ck")
    SB.train_object(M.make_cube(0.08), steps=3, ckpt_dir=ck,
                    ckpt_every=100, **kw)
    meta_p = os.path.join(ck, "cube_last.msgpack.json")
    meta = json.load(open(meta_p))
    assert meta["step"] == 2
    meta["total_steps"] = 4
    json.dump(meta, open(meta_p, "w"))
    resumed = SB.train_object(M.make_cube(0.08), steps=4, ckpt_dir=ck,
                              **kw)
    p_full = jax.tree_util.tree_leaves(full.variables["params"])[0]
    p_res = jax.tree_util.tree_leaves(resumed.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(p_full), np.asarray(p_res),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.mean),
                               np.asarray(resumed.mean), atol=1e-6)

    # a mismatched config ignores the checkpoint instead of loading it
    fresh = SB.train_object(M.make_cube(0.08), steps=5, ckpt_dir=ck, **kw)
    assert json.load(open(meta_p))["total_steps"] == 5
    assert fresh.losses  # trained from scratch, losses re-logged


@pytest.mark.slow
def test_run_suite_ensemble_with_textured_and_extras(tmp_path):
    """run_suite end to end at tiny scale: ensemble mode with a textured
    object (trained/evaluated OUTSIDE the ensemble — stack_meshes bakes
    textures, which would be a self-inflicted train/eval domain gap),
    domain shift, severity sweep, all-object long horizon, and a forced
    recovery row."""
    results = SB.run_suite(
        ("cube", "textured_box"), steps=2, frames=3, batch=4, res=48,
        hard=False, impl="xla", log=lambda *a: None, ensemble=True,
        domain_shift=True, long_horizon_frames=12,
        shift_sweep=(1.0,), sweep_objects=("textured_box",),
        recovery_objects=("cube",), live_recovery_objects=("cube",),
        ablation_objects=("textured_box",),
    )
    assert [r["name"] for r in results] == ["cube", "textured_box"]
    for r in results:
        assert np.isfinite(r["add_auc"])
        assert np.isfinite(r["domain_shifted"]["add_auc"])
        assert r["long_horizon"]["frames"] == 11
    # textured object: severity row + the texture-hostile extra row
    sw = results[1]["shift_sweep"]
    assert [p["severity"] for p in sw] == [1.0, "tex_hostile"]
    # recovery row ran on cube with the failure telemetry schema
    rc = results[0]["recovery"]
    assert rc["fail_at"] == 4 and rc["reinit_count"] >= 0
    assert "detection_latency" in rc
    # LIVE recovery row (StreamTracker path, VERDICT r4 #4) on cube
    lv = results[0]["live_recovery"]
    assert lv["fail_at"] == 4 and "detection_latency" in lv
    assert "refetch_every" in lv  # the latency-quantization context
    # single-axis ablation rows (VERDICT r4 #3) on the textured object
    ab = results[1]["shift_ablation"]
    axes = {row["axis"] for row in ab}
    assert {"none", "full"} <= axes and len(axes) >= 4
    for row in ab:
        assert np.isfinite(row["add_auc"])
