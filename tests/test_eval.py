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
