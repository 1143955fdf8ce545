"""ROS-core live path + reference .pth.tar checkpoint end-to-end tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.apps.predict_ros import TrackerRosCore
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
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


def _tracker(variables=None, ckpt_dir=None, model_path=None,
             damp_heads=False):
    sphere = M.make_icosphere(subdiv=2, radius=0.05)
    t = trk.Tracker(DATASET_INFO, np.zeros(8), np.ones(8) * 100.0,
                    mesh=sphere, variables=variables, ckpt_dir=ckpt_dir,
                    model_path=model_path)
    if damp_heads:
        # a few px of drift per frame: realistic for a converged tracker,
        # and keeps the ROI inside the stream window for equivalence.
        params = jax.tree.map(lambda x: x, t.variables["params"])
        for head in ("trans_out", "rot_out"):
            params[head]["kernel"] = params[head]["kernel"] * 0.05
            params[head]["bias"] = params[head]["bias"] * 0.0
        t.variables = {"params": params,
                       "batch_stats": t.variables["batch_stats"]}
    return t


def _frame(t, pose):
    rgb, depth = rz.render(
        t.mesh, jnp.asarray(pose, jnp.float32), jnp.array(K),
        rz.full_frame_window(W, H), out_hw=(H, W),
    )
    return (np.asarray(rgb).astype(np.uint8),
            np.asarray(depth).astype(np.float32) / 1000.0)  # metres, ROS style


@pytest.mark.slow
def test_ros_core_stream_matches_blocking():
    """The pipelined stream core must produce the same trajectory as the
    reference-shaped blocking core (reference predict_ros.py:48-66)."""
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 0.5]
    t1 = _tracker(damp_heads=True)
    rgb_u8, depth_m = _frame(t1, pose)

    core_blocking = TrackerRosCore(t1, fill_depth_holes=False,
                                   use_stream=False)
    core_blocking.set_init_pose(pose)
    core_blocking.grab_color(rgb_u8)
    core_blocking.grab_depth(depth_m)
    p_ref = [core_blocking.on_track() for _ in range(3)]

    t2 = _tracker(variables=t1.variables)
    core_stream = TrackerRosCore(t2, fill_depth_holes=False, use_stream=True)
    assert core_stream.on_track() is None  # not ready yet
    core_stream.set_init_pose(pose)
    core_stream.grab_color(rgb_u8)
    core_stream.grab_depth(depth_m)
    p_stream = [core_stream.on_track() for _ in range(3)]

    for a, b in zip(p_ref, p_stream):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # Non-finite / out-of-range ROS depth (NaN/inf no-return pixels, >65m
    # readings) must be sanitized before the uint16-mm cast, not wrap or
    # hit undefined float->int conversion: identical pixels as 0 mm.
    bad = depth_m.copy()
    bad[:4, :4] = np.nan
    bad[:4, 4:8] = np.inf
    bad[:4, 8:12] = 70.0  # metres; would wrap to ~4.5 m in uint16 mm
    zeroed = depth_m.copy()
    zeroed[:4, :12] = 0.0
    core_stream.grab_color(rgb_u8)
    core_stream.grab_depth(bad)
    p_bad = core_stream.on_track()
    core_blocking.grab_color(rgb_u8)
    core_blocking.grab_depth(zeroed)
    p_zeroed = core_blocking.on_track()
    assert np.isfinite(p_bad).all()
    np.testing.assert_allclose(p_bad, p_zeroed, atol=1e-5)


@pytest.mark.slow
def test_reference_pth_tar_checkpoint_end_to_end(tmp_path):
    """A reference-format ``model_best_val.pth.tar`` (torch.save of
    {'state_dict': ..., 'epoch': ...}, reference problems.py:140-151)
    loads through Tracker(ckpt_dir=...) and tracks — the full deployment
    path a reference user would take to switch frameworks."""
    torch = pytest.importorskip("torch")

    from test_model import _build_torch_model
    from iros20_6d_pose_tracking_tpu.models import torch_import

    torch.manual_seed(11)
    tnet = _build_torch_model().eval()
    ckpt = tmp_path / "model_best_val.pth.tar"
    torch.save({"state_dict": tnet.state_dict(), "epoch": 42}, str(ckpt))

    t = _tracker(ckpt_dir=str(ckpt))
    # variables really came from the file
    want = torch_import.state_dict_to_variables(tnet.state_dict())
    got_leaf = jax.tree.leaves(t.variables["params"])[0]
    want_leaf = jax.tree.leaves(want["params"])[0]
    np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(want_leaf))

    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 0.5]
    rgb_u8, depth_m = _frame(t, pose)
    out = t.on_track(pose, rgb_u8, (depth_m * 1000).astype(np.uint16))
    assert out.shape == (4, 4)
    assert np.isfinite(out).all()
    # tanh-bounded update from the loaded weights
    assert np.linalg.norm(out[:3, 3] - pose[:3, 3]) <= \
        np.sqrt(3) * t.cfg.trans_normalizer + 1e-6
