"""End-to-end demo: train se(3)-TrackNet on on-device synthetic pairs,
then track a moving synthetic RGB-D video — the full framework loop
(datagen -> train -> track -> eval) with no external data.

Run: python examples/demo_train_and_track.py [--steps N] [--frames T]
Writes metrics to stdout and the tracked-vs-gt ADD curve to demo_out/.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--outdir", default="demo_out")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.core import se3
    from iros20_6d_pose_tracking_tpu.data import augment as A
    from iros20_6d_pose_tracking_tpu.data.dataset import SyntheticPairs
    from iros20_6d_pose_tracking_tpu.eval import metrics as ME
    from iros20_6d_pose_tracking_tpu.models import tracknet
    from iros20_6d_pose_tracking_tpu.render import mesh as M
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
    from iros20_6d_pose_tracking_tpu.tracking import tracker as trk
    from iros20_6d_pose_tracking_tpu.train import trainer as tr

    os.makedirs(args.outdir, exist_ok=True)
    res = 176
    # A face-colored cube: rotation is observable from both RGB and depth
    # (a sphere's rotation is depth-invisible and drifts by construction).
    tm = M.make_cube(0.08)
    mesh = rz.upload(tm)
    width = tm.diameter * 1000 * 1.1
    K = np.array(
        [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]],
        np.float32,
    )
    impl = "pallas" if jax.devices()[0].platform != "cpu" else "xla"

    # ---- train ----------------------------------------------------------
    cfg = tr.TrainConfig(
        resolution=res, batch_size=args.batch, learning_rate=1e-3,
        trans_normalizer=0.02, rot_normalizer=15 * np.pi / 180,
        aug=A.AugmentConfig(),
    )
    synth = SyntheticPairs(
        mesh, K, resolution=res, object_width_mm=width,
        max_trans=0.02, max_rot_deg=15.0,
        xyz_range=((-0.12, 0.12), (-0.09, 0.09), (0.45, 0.85)),
    )
    mean, std = tr.compute_mean_std(
        (synth.sample_batch(jax.random.PRNGKey(900 + i), args.batch)
         for i in range(4)),
        cfg, max_samples=4 * args.batch,
    )
    print("mean", np.round(mean, 2), "\nstd", np.round(std, 2), flush=True)

    model = tracknet.Se3TrackNet(image_size=res)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=10_000)
    state = tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    mean_j, std_j = jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32)

    key = jax.random.PRNGKey(7)
    t0 = time.time()
    for i in range(args.steps):
        raw = synth.sample_batch(jax.random.fold_in(key, i), args.batch)
        state, m = tr.train_step(model, tx, cfg, state,
                                 jax.random.fold_in(key, 10**6 + i), raw,
                                 mean_j, std_j)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(m['loss']):.5f} "
                  f"trans={float(m['trans']):.5f} rot={float(m['rot']):.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # ---- synthetic test video -------------------------------------------
    T = args.frames
    rng = np.random.RandomState(5)
    gt = [np.eye(4, dtype=np.float32)]
    gt[0][:3, 3] = [0.0, 0.0, 0.6]
    w_vel = rng.randn(3)
    w_vel = w_vel / np.linalg.norm(w_vel) * np.deg2rad(6.0)  # 6 deg/frame
    t_vel = np.array([0.004, -0.003, 0.005])
    for i in range(1, T):
        prev = gt[-1]
        cur = prev.copy()
        cur[:3, :3] = np.asarray(
            se3.so3_exp(jnp.asarray(w_vel, jnp.float32))) @ prev[:3, :3]
        # gentle direction changes
        if i % 15 == 0:
            w_vel = rng.randn(3)
            w_vel = w_vel / np.linalg.norm(w_vel) * np.deg2rad(6.0)
            t_vel = rng.randn(3) * 0.004
        cur[:3, 3] = prev[:3, 3] + t_vel
        cur[2, 3] = np.clip(cur[2, 3], 0.45, 0.9)
        gt.append(cur)
    gt = np.stack(gt)

    def render_frame(pose):
        return rz.render(mesh, jnp.asarray(pose), jnp.asarray(K),
                         rz.full_frame_window(640, 480), out_hw=(480, 640),
                         impl=impl)

    frames_rgb, frames_depth = [], []
    for i in range(T):
        r, d = render_frame(gt[i])
        frames_rgb.append(r)
        frames_depth.append(d)
    frames_rgb = jnp.stack(frames_rgb)
    frames_depth = jnp.stack(frames_depth)

    # ---- track -----------------------------------------------------------
    tcfg = trk.TrackerConfig(
        resolution=res, trans_normalizer=0.02,
        rot_normalizer=15 * np.pi / 180, object_width_mm=width,
        render_impl=impl,
    )
    poses = trk.track_video(
        model, tcfg, variables, mesh, jnp.asarray(K), mean_j, std_j,
        jnp.asarray(gt[0]), frames_rgb[1:], frames_depth[1:],
    )
    poses = np.concatenate([gt[:1], np.asarray(poses)], axis=0)

    # ---- evaluate ---------------------------------------------------------
    cloud = M.voxel_down_sample(tm.verts, 0.005)
    add, adi = ME.batch_errors(poses, gt, cloud)
    drift_baseline_add, _ = ME.batch_errors(
        np.tile(gt[:1], (T, 1, 1)), gt, cloud
    )
    np.savetxt(os.path.join(args.outdir, "add_per_frame.txt"), add)
    print(f"\ntracked   ADD: mean={add.mean()*1000:.2f}mm "
          f"max={add.max()*1000:.2f}mm AUC={ME.vocap(add)*100:.2f}")
    print(f"hold-init ADD: mean={drift_baseline_add.mean()*1000:.2f}mm "
          f"AUC={ME.vocap(drift_baseline_add)*100:.2f}")
    print(f"final-frame translation err: "
          f"{np.linalg.norm(poses[-1][:3,3]-gt[-1][:3,3])*1000:.2f}mm")
    ok = add.mean() < 0.25 * drift_baseline_add.mean()
    print("DEMO", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
