"""End-to-end CLI drives: predict, train --synthetic, datagen."""
import argparse
import os
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.core import se3
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz

RES = 64
K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]], np.float32)
IMG_W, IMG_H = 160, 120


def _write_obj(tm, path):
    with open(path, "w") as f:
        for v in tm.verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for fc in tm.faces[: tm.num_faces]:
            f.write(f"f {fc[0]+1} {fc[1]+1} {fc[2]+1}\n")


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    """Synthetic YCB-style tree + artifacts (mesh, dataset_info, mean/std)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("ycbfix")
    seq = root / "0048"
    for d in ("color", "depth_filled", "pose_gt/4"):
        (seq / d).mkdir(parents=True)
    tm = M.make_icosphere(subdiv=2, radius=0.05)
    _write_obj(tm, root / "object.obj")
    mesh = rz.upload(tm)
    for i in range(4):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.004 * i, -0.002 * i, 0.5 + 0.002 * i]
        pose[:3, :3] = np.asarray(se3.so3_exp(jnp.array([0, 0.03 * i, 0.0])))
        rgb, depth = rz.render(mesh, jnp.array(pose), jnp.array(K),
                               rz.full_frame_window(IMG_W, IMG_H),
                               out_hw=(IMG_H, IMG_W))
        Image.fromarray(np.asarray(rgb).astype(np.uint8)).save(
            seq / "color" / f"{i:06d}.png")
        Image.fromarray(np.asarray(depth).astype(np.uint16)).save(
            seq / "depth_filled" / f"{i:06d}.png")
        np.savetxt(seq / "pose_gt" / "4" / f"{i:06d}.txt", pose)

    (root / "train_data").mkdir()
    info = {
        "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": 80.0,
                   "centerY": 60.0, "width": IMG_W, "height": IMG_H},
        "resolution": RES, "boundingbox": 10,
        "max_translation": 0.02, "max_rotation": 15,
        "train_samples": 8, "val_samples": 4,
        "models": {0: {"model_path": str(root / "object.obj")}},
    }
    with open(root / "dataset_info.yml", "w") as f:
        yaml.dump(info, f)
    np.save(root / "mean.npy", np.zeros(8))
    np.save(root / "std.npy", np.full(8, 100.0))
    return root


def test_predict_cli_ycbv(fixture_root, tmp_path):
    from iros20_6d_pose_tracking_tpu.apps import predict

    out = tmp_path / "res" / "seq0048"
    predict.main([
        "--mode", "ycbv", "--seq_id", "48", "--class_id", "4",
        "--ycb_dir", str(fixture_root),
        "--train_data_path", str(fixture_root / "train_data"),
        "--mean_std_path", str(fixture_root),
        "--model_path", str(fixture_root / "object.obj"),
        "--outdir", str(out), "--track_mode", "scan",
    ])
    poses = sorted(p for p in os.listdir(out) if p.endswith(".txt")
                   and "gt" not in p)
    assert len(poses) == 4
    p0 = np.loadtxt(out / poses[0])
    assert p0.shape == (4, 4)
    np.testing.assert_allclose(p0[3], [0, 0, 0, 1])


def _run_predict(fixture_root, out, extra):
    from iros20_6d_pose_tracking_tpu.apps import predict

    predict.main([
        "--mode", "ycbv", "--seq_id", "48", "--class_id", "4",
        "--ycb_dir", str(fixture_root),
        "--train_data_path", str(fixture_root / "train_data"),
        "--mean_std_path", str(fixture_root),
        "--model_path", str(fixture_root / "object.obj"),
        "--outdir", str(out), *extra,
    ])
    files = sorted(p for p in os.listdir(out) if p.endswith(".txt")
                   and "gt" not in p)
    return np.stack([np.loadtxt(out / p) for p in files])


@pytest.mark.slow
def test_predict_cli_modes_agree(fixture_root, tmp_path):
    """scan (chunked), stream (pipelined windowed), and ontrack (blocking
    parity loop) must produce the same trajectory."""
    scan = _run_predict(fixture_root, tmp_path / "scan",
                        ["--track_mode", "scan", "--chunk_size", "2"])
    stream = _run_predict(fixture_root, tmp_path / "stream",
                          ["--track_mode", "stream"])
    ontrack = _run_predict(fixture_root, tmp_path / "ontrack",
                           ["--track_mode", "ontrack"])
    np.testing.assert_allclose(scan, ontrack, atol=1e-5)
    np.testing.assert_allclose(stream, ontrack, atol=1e-5)


@pytest.mark.slow
def test_predict_cli_scan_reinit(fixture_root, tmp_path):
    """--reinit_frames works in scan mode by segmenting the chunked scan
    at the re-init frame (round-1 fell back to the slow stream path)."""
    import scipy.io

    ycb = fixture_root
    (ycb / "image_sets").mkdir(exist_ok=True)
    with open(ycb / "image_sets" / "keyframe.txt", "w") as f:
        f.write("0048/000001\n0048/000002\n")
    resdir = ycb / "YCB_Video_toolbox" / "results_PoseCNN_RSS2018"
    resdir.mkdir(parents=True, exist_ok=True)
    reinit_pose = np.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0.55],
                            [0, 0, 0, 1]])
    for idx in (0, 1):
        scipy.io.savemat(resdir / f"{idx:06d}.mat", {
            "rois": np.array([[0, 4.0, 0, 0, 0, 0, 0]]),
            "poses_icp": np.array([[1.0, 0, 0, 0, 0.0, 0.0, 0.55]]),
        })
    poses = _run_predict(
        fixture_root, tmp_path / "reinit",
        ["--track_mode", "scan", "--chunk_size", "2",
         "--reinit_frames", "48/3"],
    )
    # frame index 2 (= reinit_frames entry 3, 1-based) restarts from the
    # PoseCNN pose; its output must stay within one tanh-bounded update.
    dt = np.linalg.norm(poses[2][:3, 3] - reinit_pose[:3, 3])
    assert dt <= np.sqrt(3) * 0.03 + 1e-6


@pytest.mark.slow
def test_predict_cli_visual_outputs(fixture_root, tmp_path):
    """--viz_dir / --save_video / --canvas_dir write the reference's
    visual artifacts (reference predict.py:403,424-433,284-291)."""
    out = tmp_path / "viz_run"
    viz = tmp_path / "viz"
    canvas = tmp_path / "canvas"
    _run_predict(fixture_root, out,
                 ["--track_mode", "scan", "--viz_dir", str(viz),
                  "--save_video", "--canvas_dir", str(canvas)])
    assert len(list(viz.glob("*.png"))) == 3
    assert len(list(canvas.glob("*.png"))) == 3
    import cv2

    assert (out / "video.mp4").exists()
    cap = cv2.VideoCapture(str(out / "video.mp4"))
    assert cap.isOpened() and int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    # canvas = render | crop side by side with a 10px gap
    img = cv2.imread(str(sorted(canvas.glob("*.png"))[0]))
    assert img.shape == (RES, RES * 2 + 10, 3)


@pytest.mark.slow
def test_predict_cli_ycbineoat(fixture_root, tmp_path):
    from iros20_6d_pose_tracking_tpu.apps import predict

    # Rearrange the fixture into the YCBInEOAT layout.
    vid = tmp_path / "mustard_fix"
    (vid / "rgb").mkdir(parents=True)
    (vid / "depth_filled").mkdir()
    (vid / "annotated_poses").mkdir()
    seq = fixture_root / "0048"
    for i in range(4):
        os.link(seq / "color" / f"{i:06d}.png", vid / "rgb" / f"{i:06d}.png")
        os.link(seq / "depth_filled" / f"{i:06d}.png",
                vid / "depth_filled" / f"{i:06d}.png")
        os.link(seq / "pose_gt" / "4" / f"{i:06d}.txt",
                vid / "annotated_poses" / f"{i:06d}.txt")
    out = tmp_path / "res_eoat"
    predict.main([
        "--mode", "ycbineoat", "--YCBInEOAT_dir", str(vid),
        "--train_data_path", str(fixture_root / "train_data"),
        "--mean_std_path", str(fixture_root),
        "--model_path", str(fixture_root / "object.obj"),
        "--outdir", str(out),
    ])
    # One pose txt per frame, every frame (reference predict.py:603-611).
    assert len([p for p in os.listdir(out) if p.endswith(".txt")]) == 4


@pytest.mark.slow
@pytest.mark.parametrize("dr", [False, True], ids=["plain", "dr"])
def test_train_cli_synthetic(fixture_root, tmp_path, dr):
    from iros20_6d_pose_tracking_tpu.apps import train as train_app

    cfg = {
        "data_path": str(fixture_root / "train_data"),
        "validation_path": str(fixture_root / "train_data"),
        "learning_rate": 1e-3, "weight_decay": 1e-6,
        "epochs": 1, "batch_size": 4,
        "loss_weights": {"trans": 1, "rot": 1},
        "data_augmentation": {"hsv_noise": [15, 15, 15],
                              "bright_mag": [0.5, 1.5],
                              "gaussian_noise": {"rgb": 2, "depth": 5},
                              "gaussian_blur_kernel": 6},
    }
    cfg_path = tmp_path / "config.yml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    outdir = tmp_path / "train_out"
    train_app.main([
        "--config", str(cfg_path), "--output_path", str(outdir),
        "--synthetic", "--model_path", str(fixture_root / "object.obj"),
        "--epochs", "1",
    ] + (["--dr"] if dr else []))
    files = set(os.listdir(outdir))
    assert {"mean.npy", "std.npy", "dataset_info.yml", "config_backup.yml",
            "checkpoint_last.msgpack"} <= files
    assert "model_best_train.msgpack" in files
    # The checkpoint loads into a Tracker.
    from iros20_6d_pose_tracking_tpu.tracking.tracker import Tracker

    with open(fixture_root / "dataset_info.yml") as f:
        info = yaml.safe_load(f)
    t = Tracker(info, np.load(outdir / "mean.npy"),
                np.load(outdir / "std.npy"),
                ckpt_dir=str(outdir / "model_best_train.msgpack"),
                model_path=str(fixture_root / "object.obj"))
    assert t.cfg.resolution == RES


@pytest.mark.slow
def test_datagen_cli_dr(fixture_root, tmp_path):
    from iros20_6d_pose_tracking_tpu.apps import datagen

    out = tmp_path / "gen"
    datagen.main([
        "--mode", "dr", "--dataset_info", str(fixture_root / "dataset_info.yml"),
        "--out_root", str(out), "--train_samples", "3", "--val_samples", "1",
    ])
    from iros20_6d_pose_tracking_tpu.data.dataset import PairDataset

    assert len(PairDataset(str(out / "train_data_blender_DR"), RES)) == 3
    assert len(PairDataset(str(out / "validation_data_blender_DR"), RES)) == 1


def test_posecnn_init_pose(fixture_root, tmp_path):
    """--init posecnn reads the YCB_Video_toolbox PoseCNN .mat results."""
    import scipy.io

    from iros20_6d_pose_tracking_tpu.apps import predict

    ycb = fixture_root
    (ycb / "image_sets").mkdir(exist_ok=True)
    with open(ycb / "image_sets" / "keyframe.txt", "w") as f:
        f.write("0048/000001\n0048/000003\n")
    resdir = ycb / "YCB_Video_toolbox" / "results_PoseCNN_RSS2018"
    resdir.mkdir(parents=True, exist_ok=True)
    # index 0 corresponds to keyframe '0048/000001'
    quat_wxyz = np.array([1.0, 0.0, 0.0, 0.0])
    scipy.io.savemat(resdir / "000000.mat", {
        "rois": np.array([[0, 4.0, 0, 0, 0, 0, 0]]),
        "poses_icp": np.array([[*quat_wxyz, 0.01, -0.02, 0.6]]),
    })
    args = argparse.Namespace(ycb_dir=str(ycb), class_id=4)
    pose = predict._posecnn_pose(args, 48, 1)
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-9)
    np.testing.assert_allclose(pose[:3, 3], [0.01, -0.02, 0.6])


def test_poserbpf_init_pose(fixture_root):
    from iros20_6d_pose_tracking_tpu.apps import predict

    ycb = fixture_root
    # data_organized-style discovery root: fixture root has 0048/pose_gt/4
    rb = (ycb / "YCB_Video_toolbox" / "PoseRBPF_Results" / "YCB_results_RGBD")
    for c in range(1, 5):  # 4 class folders; ours is index class_id-1 = 3
        (rb / f"{c:03d}_class").mkdir(parents=True, exist_ok=True)
    seq_dir = rb / "004_class" / "seq_1"
    seq_dir.mkdir(parents=True, exist_ok=True)
    with open(seq_dir / "Pose_0.txt", "w") as f:
        f.write("0 0 0.05 -0.03 0.7 1 0 0 0\n")
    args = argparse.Namespace(ycb_dir=str(ycb), class_id=4)
    pose = predict._poserbpf_pose(args, 4, 48)
    np.testing.assert_allclose(pose[:3, 3], [0.05, -0.03, 0.7])
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-9)


def test_track_files_auto_reinit_wiring(fixture_root, monkeypatch):
    """--auto_reinit wires a ReinitPolicy + redetect-backed on_track_lost
    into the stream path (and bumps samples to >=2). The fire->reapply
    behavior itself is driven in tests/test_stream.py; this pins the CLI
    plumbing: policy present, callback resolves poses through redetect
    with 1-based frame numbering, and redetect failures return None."""
    from iros20_6d_pose_tracking_tpu.apps import predict
    from iros20_6d_pose_tracking_tpu.tracking import stream as st_mod

    captured = {}

    class FakeStream:
        def __init__(self, tracker, **kw):
            captured.update(kw)

        def begin(self, pose, image_hw=None):
            return self

        def push(self, rgb, depth):
            pass

        def poses(self):
            return np.zeros((3, 4, 4), np.float32)

    monkeypatch.setattr(st_mod, "StreamTracker", FakeStream)
    args = argparse.Namespace(track_mode="stream", samples=1,
                              auto_reinit=True, no_window=False)
    files = [str(fixture_root / "0048" / "color" / f"{i:06d}.png")
             for i in range(4)]
    dfiles = [str(fixture_root / "0048" / "depth_filled" / f"{i:06d}.png")
              for i in range(4)]
    seen = []

    def redetect(file_idx):
        seen.append(file_idx)
        if file_idx >= 3:
            raise RuntimeError("no keyframe near")
        p = np.eye(4, dtype=np.float32)
        p[2, 3] = 0.6
        return p

    out = predict._track_files(None, files, dfiles,
                               np.eye(4, dtype=np.float32), args,
                               redetect=redetect)
    assert out.shape == (4, 4, 4)
    assert captured["samples"] == 2          # bumped for health scoring
    assert captured["reinit_policy"] is not None
    cb = captured["on_track_lost"]
    pose = cb(1, 0.05)                       # stream idx 1 -> file 2
    assert seen == [2] and pose[2, 3] == 0.6
    assert cb(2, 0.05) is None               # redetect raised -> None
    # without the flag: no policy, samples untouched
    captured.clear()
    args2 = argparse.Namespace(track_mode="stream", samples=1,
                               auto_reinit=False, no_window=False)
    predict._track_files(None, files, dfiles, np.eye(4, dtype=np.float32),
                         args2, redetect=redetect)
    assert captured["reinit_policy"] is None and captured["samples"] == 1


def test_make_ycb_fixture_tree(tmp_path):
    """The committed fixture generator writes the exact tree the predict
    CLI consumes (examples/make_ycb_fixture.py — the verify recipe)."""
    import runpy
    import sys

    root = tmp_path / "fix"
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "examples", "make_ycb_fixture.py")
    argv = sys.argv
    try:
        sys.argv = [script, "--root", str(root), "--frames", "2"]
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = argv
    for rel in ("object.obj", "dataset_info.yml", "mean.npy", "std.npy",
                "0048/color/000001.png", "0048/depth_filled/000001.png",
                "0048/pose_gt/4/000001.txt", "train_data"):
        assert (root / rel).exists(), rel
    from PIL import Image

    depth = np.asarray(Image.open(root / "0048/depth_filled/000000.png"))
    assert depth.dtype == np.uint16 and (depth > 0).any()
    pose = np.loadtxt(root / "0048/pose_gt/4/000000.txt")
    assert pose.shape == (4, 4) and np.isclose(pose[2, 3], 0.5)


@pytest.mark.slow
def test_realdata_dryrun(tmp_path):
    """The one-command real-data protocol chain (docs/REALDATA.md,
    `make realdata-dryrun`): fixture tree -> 2 real `predict --mode
    ycbv_all` runs -> eval_ycb.eval_all (count assertion on) ->
    `predict --mode ycbineoat` -> eval_ycbineoat.eval_all, with every
    output diffed against pinned zero-head expectations. Green here
    means the real-data commands in REALDATA.md cannot have bit-rotted."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "realdata_dryrun",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "examples", "realdata_dryrun.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--root", str(tmp_path / "dryrun"), "--frames", "4"])
