"""Metric and scorer tests: ADD/ADI vs scipy oracle, VOCap properties,
and the full YCB/YCBInEOAT file protocols on synthetic directory trees."""
import os
import numpy as np
import pytest

from iros20_6d_pose_tracking_tpu.core import se3
from iros20_6d_pose_tracking_tpu.eval import metrics as ME
from iros20_6d_pose_tracking_tpu.eval import eval_ycb, eval_ycbineoat

import jax.numpy as jnp


def _rand_pose(rng, t_scale=0.1):
    T = np.eye(4)
    T[:3, :3] = np.array(se3.so3_exp(jnp.array(rng.randn(3), jnp.float32)))
    T[:3, 3] = rng.randn(3) * t_scale
    return T


def test_add_adi_vs_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3) * 0.05
    for _ in range(5):
        pred, gt = _rand_pose(rng), _rand_pose(rng)
        p = pts @ pred[:3, :3].T + pred[:3, 3]
        g = pts @ gt[:3, :3].T + gt[:3, 3]
        want_add = np.linalg.norm(p - g, axis=1).mean()
        want_adi = cKDTree(p).query(g, k=1)[0].mean()
        got_add = float(ME.add_err(jnp.array(pred, jnp.float32),
                                   jnp.array(gt, jnp.float32),
                                   jnp.array(pts, jnp.float32)))
        got_adi = float(ME.adi_err(jnp.array(pred, jnp.float32),
                                   jnp.array(gt, jnp.float32),
                                   jnp.array(pts, jnp.float32)))
        assert abs(got_add - want_add) < 1e-5
        assert abs(got_adi - want_adi) < 1e-5


def test_adi_symmetric_object_less_than_add():
    """A rotated sphere of points has tiny ADI but large ADD."""
    rng = np.random.RandomState(1)
    pts = rng.randn(2000, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= 0.05
    pred = np.eye(4)
    gt = np.eye(4)
    gt[:3, :3] = np.array(se3.so3_exp(jnp.array([0, 0, 1.0])))
    add = float(ME.add_err(jnp.array(pred, jnp.float32), jnp.array(gt, jnp.float32),
                           jnp.array(pts, jnp.float32)))
    adi = float(ME.adi_err(jnp.array(pred, jnp.float32), jnp.array(gt, jnp.float32),
                           jnp.array(pts, jnp.float32)))
    assert adi < 0.2 * add  # bounded by point-sampling spacing


def test_vocap_properties():
    assert ME.vocap(np.zeros(100)) == pytest.approx(1.0)
    assert ME.vocap(np.full(100, 0.5)) == 0.0  # all beyond cutoff
    # Half the results perfect, half beyond: AUC ~ 0.5.
    errs = np.concatenate([np.zeros(50), np.full(50, 0.2)])
    assert 0.45 < ME.vocap(errs) < 0.55
    # Monotonic: worse errors lower the AUC.
    a = ME.vocap(np.linspace(0, 0.05, 100))
    b = ME.vocap(np.linspace(0, 0.09, 100))
    assert a > b


def test_vocap_known_value():
    """Hand-computed case: errors [0.02, 0.04] with cutoff 0.1.
    mrec = [0, .02, .04, .1], running-max prec = [0, .5, 1, 1]
    AUC = (.02*.5 + .02*1 + .06*1) * 10 = 0.9
    """
    assert ME.vocap([0.02, 0.04]) == pytest.approx(0.9)


def _write_pose(path, pose):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savetxt(path, pose)


def test_eval_ycb_protocol(tmp_path):
    """Synthetic single-class YCB tree exercising keyframe filtering."""
    rng = np.random.RandomState(2)
    ycb = tmp_path / "ycb"
    pts = rng.randn(300, 3) * 0.04
    (ycb / "CADmodels" / "002_master_chef_can").mkdir(parents=True)
    np.savetxt(ycb / "CADmodels" / "002_master_chef_can" / "points.xyz", pts)
    (ycb / "YCB_Video_toolbox").mkdir()

    keyframes = []
    res = tmp_path / "res" / "seq0048"
    gts = []
    for i in range(6):
        frame = i + 1
        gt = _rand_pose(rng)
        _write_pose(str(ycb / "data_organized" / "0048" / "pose_gt" / "1"
                        / f"{frame:06d}.txt"), gt)
        pred = gt.copy()
        pred[:3, 3] += rng.randn(3) * 0.002
        _write_pose(str(res / f"{i:06d}.txt"), pred)
        _write_pose(str(res / f"{i:06d}gt.txt"), gt)  # predict.py writes these too
        if i % 2 == 0:  # only even frames are keyframes
            keyframes.append(f"0048/{frame:06d}")
        gts.append(gt)
    with open(ycb / "YCB_Video_toolbox" / "keyframe.txt", "w") as f:
        f.write("\n".join(keyframes) + "\n")

    adi, add = eval_ycb.eval_one_class(str(tmp_path / "res"), str(ycb), 1)
    assert len(adi) == 3  # keyframes only
    assert ME.vocap(add) * 100 > 90  # 2mm errors -> high AUC


def test_eval_ycbineoat_protocol(tmp_path):
    rng = np.random.RandomState(3)
    ycb = tmp_path / "ycb"
    pts = rng.randn(200, 3) * 0.05
    (ycb / "CADmodels" / "006_mustard_bottle").mkdir(parents=True)
    np.savetxt(ycb / "CADmodels" / "006_mustard_bottle" / "points.xyz", pts)

    data = tmp_path / "data"
    res = tmp_path / "res"
    video = "mustard0_2020"
    for i in range(5):
        gt = _rand_pose(rng)
        _write_pose(str(data / video / "annotated_poses" / f"{i:06d}.txt"), gt)
        pred = gt.copy()
        pred[:3, 3] += rng.randn(3) * 0.001
        _write_pose(str(res / video / f"{i:06d}.txt"), pred)

    out = eval_ycbineoat.eval_all(str(res), str(data), str(ycb))
    assert out["overall"]["n"] == 5
    assert out["mustard"]["add"] > 90


@pytest.mark.slow
def test_eval_all_21_class_pooled(tmp_path):
    """The exact published-number protocol end to end (VERDICT r3 #6):
    a synthetic 21-class YCB tree, REAL `predict --mode ycbv_all` runs
    for two classes (the CLI writes the per-class result layout), hand-
    written predictions for the other 19, then eval_all pools all 21
    classes with the keyframe-count assertion ENABLED (the
    reference eval_ycb.py:121-162 path that produces the 93.05/95.71
    headline numbers on real data)."""
    import jax
    import yaml
    from PIL import Image

    from iros20_6d_pose_tracking_tpu.apps import predict
    from iros20_6d_pose_tracking_tpu.render import mesh as M
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz

    rng = np.random.RandomState(7)
    ycb = tmp_path / "ycb"
    data = ycb / "data_organized"
    res_root = tmp_path / "results"
    class_names = [f"{i:03d}_obj" for i in range(1, 22)]
    Kc = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]],
                  np.float32)
    W, H = 160, 120
    n_frames = 4

    # CAD clouds for all 21 classes; tracked classes use their real mesh
    tracked = {4: M.make_icosphere(subdiv=2, radius=0.05),
               7: M.make_cube(0.08)}
    for cid, name in enumerate(class_names, start=1):
        d = ycb / "CADmodels" / name
        d.mkdir(parents=True)
        pts = (tracked[cid].verts if cid in tracked
               else rng.randn(200, 3) * 0.04)
        np.savetxt(d / "points.xyz", pts)

    keyframes = []

    def write_seq(seq_id, cid, tm=None):
        """Ground truth (1-based frame ids, YCB convention) and, for
        tracked classes, rendered color/depth the CLI consumes."""
        seq = data / f"{seq_id:04d}"
        (seq / "pose_gt" / str(cid)).mkdir(parents=True, exist_ok=True)
        mesh = rz.upload(tm) if tm is not None else None
        if tm is not None:
            (seq / "color").mkdir(exist_ok=True)
            (seq / "depth_filled").mkdir(exist_ok=True)
        gts = []
        for i in range(n_frames):
            pose = np.eye(4)
            pose[:3, 3] = [0.003 * i, -0.002 * i, 0.5 + 0.002 * i]
            np.savetxt(seq / "pose_gt" / str(cid) / f"{i + 1:06d}.txt",
                       pose)
            keyframes.append(f"{seq_id:04d}/{i + 1:06d}")
            if tm is not None:
                rgb, depth = rz.render(
                    mesh, jnp.asarray(pose, jnp.float32), jnp.asarray(Kc),
                    rz.full_frame_window(W, H), out_hw=(H, W), impl="xla")
                Image.fromarray(np.asarray(rgb).astype(np.uint8)).save(
                    seq / "color" / f"{i + 1:06d}.png")
                Image.fromarray(np.asarray(depth).astype(np.uint16)).save(
                    seq / "depth_filled" / f"{i + 1:06d}.png")
            gts.append(pose)
        return gts

    # two REAL CLI runs (classes 4 and 7, one sequence each)
    (ycb / "YCB_Video_toolbox").mkdir(parents=True)
    train_data = tmp_path / "train_data"
    train_data.mkdir()
    info = {
        "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": 80.0,
                   "centerY": 60.0, "width": W, "height": H},
        "resolution": 64, "boundingbox": 10,
        "max_translation": 0.02, "max_rotation": 15,
        "train_samples": 8, "val_samples": 4, "models": {},
    }
    with open(tmp_path / "dataset_info.yml", "w") as f:
        yaml.dump(info, f)
    np.save(tmp_path / "mean.npy", np.zeros(8))
    np.save(tmp_path / "std.npy", np.full(8, 100.0))

    for cid, seq_id in ((4, 48), (7, 49)):
        tm = tracked[cid]
        write_seq(seq_id, cid, tm)
        obj_path = tmp_path / f"obj{cid}.obj"
        with open(obj_path, "w") as f:
            for v in tm.verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for fc in tm.faces[: tm.num_faces]:
                f.write(f"f {fc[0] + 1} {fc[1] + 1} {fc[2] + 1}\n")
        predict.main([
            "--mode", "ycbv_all", "--class_id", str(cid),
            "--ycb_dir", str(data),
            "--train_data_path", str(train_data),
            "--mean_std_path", str(tmp_path),
            "--model_path", str(obj_path),
            "--outdir", str(res_root / class_names[cid - 1] / "run0"),
            "--track_mode", "scan", "--chunk_size", "2",
        ])

    # synthetic predictions for the remaining 19 classes (seq 0050)
    for cid, name in enumerate(class_names, start=1):
        if cid in tracked:
            continue
        gts = write_seq(50, cid)
        d = res_root / name / "run0" / "seq0050"
        d.mkdir(parents=True)
        for i, gt in enumerate(gts):
            pred = gt.copy()
            pred[:3, 3] += rng.randn(3) * 0.002
            np.savetxt(d / f"{i:05d}.txt", pred)

    with open(ycb / "YCB_Video_toolbox" / "keyframe.txt", "w") as f:
        f.write("\n".join(keyframes) + "\n")

    total = 21 * n_frames
    out = eval_ycb.eval_all(str(res_root), str(ycb), expect_total=total)
    assert out["n"] == total
    assert np.isfinite(out["add"]) and np.isfinite(out["adi"])
    # the count assertion actually guards the protocol
    with pytest.raises(AssertionError):
        eval_ycb.eval_all(str(res_root), str(ycb), expect_total=14025)
