"""Trajectory-space validation of the PyTorch checkpoint bridge.

Single-forward parity (test_model.py, 2e-5) can hide feedback drift: in
tracking, frame t's pose error changes frame t+1's ROI, so codec/crop/
normalization mismatches compound. This test runs the SAME 20-frame
synthetic video through:

  (a) the framework's fused ``track_video`` scan, with weights that made a
      full export->import round trip through the bridge
      (state_dict -> variables -> state_dict -> torch module), and
  (b) an independent numpy+PyTorch oracle re-implementing the reference's
      per-frame pipeline (compute_bbox / crop_bbox nearest resize /
      OffsetDepth / NormalizeChannels / forward / Rodrigues compose —
      reference predict.py:217-296, Utils.py:302-359,
      data_augmentation.py:124-164, datasets.py:159-175),

and asserts pose agreement along the whole trajectory. The rendered A
branch is shared (the rasterizer has its own golden tests) — each
pipeline renders at ITS OWN current estimate, so render-input divergence
also compounds and is covered.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from iros20_6d_pose_tracking_tpu.models import tracknet, torch_import
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
from iros20_6d_pose_tracking_tpu.tracking import tracker as trk

from test_model import _build_torch_model

RES = 64
H, W = 192, 256
K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1.0]], np.float32)
WIDTH_MM = 110.0
TAU, RHO = 0.03, 5 * np.pi / 180
T_FRAMES = 20


# ---- numpy mirror of the reference preprocessing (oracle side) ----

def np_bbox(pose):
    obj = pose[:3, 3] * 1000.0
    off = WIDTH_MM / 2.0
    corners = []
    for dx in (-1, 1):
        for dy in (-1, 1):
            u = (obj[0] + dx * off) * K[0, 0] / obj[2] + K[0, 2]
            v = (obj[1] + dy * off) * K[1, 1] / obj[2] + K[1, 2]
            corners.append((v, u))
    vu = np.round(np.array(corners)).astype(np.int64)
    top, left = vu[:, 0].min(), vu[:, 1].min()
    bottom, right = vu[:, 0].max(), vu[:, 1].max()
    return top, left, bottom, right


def np_crop(img, top, left, crop_h, crop_w):
    oi = np.arange(RES)
    oj = np.arange(RES)
    src_r = top + (oi * crop_h) // RES
    src_c = left + (oj * crop_w) // RES
    valid = (src_r[:, None] >= 0) & (src_r[:, None] < img.shape[0]) & \
            (src_c[None, :] >= 0) & (src_c[None, :] < img.shape[1])
    rr = np.clip(src_r, 0, img.shape[0] - 1)
    cc = np.clip(src_c, 0, img.shape[1] - 1)
    out = img[rr][:, cc].astype(np.float32)
    if out.ndim == 3:
        valid = valid[..., None]
    return np.where(valid, out, 0.0)


def np_offset_depth(depth, pose):
    invalid = (depth <= 100.0) | (depth >= 2000.0)
    return np.where(invalid, 2000.0, depth - abs(pose[2, 3] * 1000.0))


def oracle_step(tnet, pose, rgb_u8, depth_u16, mesh, mean, std):
    import torch
    from scipy.spatial.transform import Rotation

    top, left, bottom, right = np_bbox(pose)
    ch, cw = bottom - top, right - left
    rgbB = np_crop(rgb_u8, top, left, ch, cw)
    depthB = np_crop(depth_u16, top, left, ch, cw)
    # A branch: shared rasterizer, windowed at the oracle's own estimate.
    bbox = jnp.array([[top, left], [top, right], [bottom, left],
                      [bottom, right]], jnp.int32)
    rgbA, depthA = rz.render(mesh, jnp.asarray(pose, jnp.float32),
                             jnp.array(K), rz.window_from_bbox(bbox),
                             out_hw=(RES, RES))
    rgbA, depthA = np.asarray(rgbA), np.asarray(depthA)
    bufA = np.concatenate([rgbA, np_offset_depth(depthA, pose)[..., None]],
                          -1)
    bufB = np.concatenate([rgbB, np_offset_depth(depthB, pose)[..., None]],
                          -1)
    bufA = (bufA - mean[:4]) / std[:4]
    bufB = (bufB - mean[4:]) / std[4:]
    with torch.no_grad():
        t_pred, r_pred = tnet(
            torch.from_numpy(bufA.transpose(2, 0, 1)[None].astype(np.float32)),
            torch.from_numpy(bufB.transpose(2, 0, 1)[None].astype(np.float32)),
        )
    t_pred = t_pred.numpy()[0].astype(np.float64)
    r_pred = r_pred.numpy()[0].astype(np.float64)
    new = np.eye(4)
    new[:3, 3] = pose[:3, 3] + t_pred * TAU
    new[:3, :3] = Rotation.from_rotvec(r_pred * RHO).as_matrix() @ pose[:3, :3]
    return new


@pytest.mark.slow
def test_trajectory_parity_through_bridge():
    torch = pytest.importorskip("torch")
    torch.manual_seed(3)
    tnet = _build_torch_model().eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
        # Small heads: keep per-frame updates a few px so the track stays
        # on-object for the whole horizon.
        for head in (tnet.trans_out, tnet.rot_out):
            head[0].weight *= 0.05
            head[0].bias *= 0.0

    # Full bridge round trip: torch -> flax -> torch.
    variables = torch_import.state_dict_to_variables(tnet.state_dict())
    sd_back = torch_import.variables_to_state_dict(variables)
    tnet2 = _build_torch_model().eval()
    missing = tnet2.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd_back.items()},
        strict=False,
    )
    assert not missing.missing_keys

    tm = M.make_cube(0.08)
    mesh = rz.upload(tm)
    rng = np.random.RandomState(0)
    mean = (rng.rand(8) * 10).astype(np.float32)
    std = (rng.rand(8) * 20 + 80).astype(np.float32)

    gt = np.eye(4)
    gt[:3, 3] = [0.01, -0.005, 0.55]
    rgb_f, depth_f = rz.render(mesh, jnp.asarray(gt, jnp.float32),
                               jnp.array(K), rz.full_frame_window(W, H),
                               out_hw=(H, W))
    rgb_u8 = np.asarray(rgb_f).astype(np.uint8)
    depth_u16 = np.asarray(depth_f).astype(np.uint16)

    init = np.eye(4)
    init[:3, 3] = [0.0, 0.0, 0.5]

    # (a) framework scan over the bridged weights
    model = tracknet.create_model(RES)
    cfg = trk.TrackerConfig(resolution=RES, trans_normalizer=TAU,
                            rot_normalizer=RHO, object_width_mm=WIDTH_MM)
    poses_jax = np.asarray(trk.track_video(
        model, cfg, variables, mesh, jnp.array(K),
        jnp.asarray(mean), jnp.asarray(std),
        jnp.asarray(init, jnp.float32),
        jnp.asarray(np.stack([rgb_u8] * T_FRAMES)),
        jnp.asarray(np.stack([depth_u16] * T_FRAMES)),
    ))

    # (b) torch oracle over the round-tripped weights
    pose = init.copy()
    poses_torch = []
    for _ in range(T_FRAMES):
        pose = oracle_step(tnet2, pose, rgb_u8, depth_u16, mesh, mean, std)
        poses_torch.append(pose.copy())
    poses_torch = np.stack(poses_torch)

    # trajectory-level agreement: rotations in radians, translations in m.
    for t in range(T_FRAMES):
        np.testing.assert_allclose(
            poses_jax[t][:3, 3], poses_torch[t][:3, 3], atol=5e-4,
            err_msg=f"translation diverged at frame {t}")
        np.testing.assert_allclose(
            poses_jax[t][:3, :3], poses_torch[t][:3, :3], atol=5e-3,
            err_msg=f"rotation diverged at frame {t}")
    # and the horizon end is tight: compounded drift stays tiny.
    assert np.linalg.norm(poses_jax[-1][:3, 3] - poses_torch[-1][:3, 3]) < 3e-4
