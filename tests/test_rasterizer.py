"""Rasterizer golden tests against analytic geometry (no GL oracle needed)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as Rz
from iros20_6d_pose_tracking_tpu.ops import roi
from iros20_6d_pose_tracking_tpu.core import se3


K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)
IMG_W, IMG_H = 640, 480


def _pose(t, w=(0, 0, 0)):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array(se3.so3_exp(jnp.array(w, jnp.float32)))
    T[:3, 3] = t
    return jnp.array(T)


def test_cube_face_on_depth():
    cube = Rz.upload(M.make_cube(0.1))
    pose = _pose([0.0, 0.0, 0.5])
    rgb, depth = Rz.render(
        cube, pose, jnp.array(K), Rz.full_frame_window(IMG_W, IMG_H),
        out_hw=(IMG_H, IMG_W),
    )
    depth = np.array(depth)
    # Front face plane at z = 0.45 m.
    assert abs(depth[240, 320] - 450.0) < 0.5
    # Projected half-extent: 0.05 * 600 / 0.45 = 66.7 px.
    assert depth[240, 320 + 60] > 0 and depth[240, 320 + 75] == 0
    assert depth[240 - 60, 320] > 0 and depth[240 - 75, 320] == 0
    rgb = np.array(rgb)
    assert rgb[240, 320].max() > 50  # lit
    assert rgb[0, 0].max() == 0      # background


@pytest.mark.slow
def test_sphere_depth_analytic():
    sph = Rz.upload(M.make_icosphere(subdiv=4, radius=0.05))
    pose = _pose([0.02, -0.01, 0.6])
    rgb, depth = Rz.render(
        sph, pose, jnp.array(K), Rz.full_frame_window(IMG_W, IMG_H),
        out_hw=(IMG_H, IMG_W),
    )
    depth = np.array(depth)
    # Nearest point of the sphere along its center ray.
    u = int(round(0.02 * 600 / 0.6 + 320))
    v = int(round(-0.01 * 600 / 0.6 + 240))
    d = depth[v, u]
    # center depth 0.6 - 0.05 = 0.55 m (+ small tessellation flattening)
    assert abs(d - 550.0) < 3.0, d
    # Silhouette radius r_px ~ f * r / sqrt(z^2 - r^2) = 50.2 px
    ring = depth[v, u - 49], depth[v, u + 49]
    assert all(r > 0 for r in ring)
    assert depth[v, u + 56] == 0


def test_rotation_moves_silhouette():
    cube = Rz.upload(M.make_cube(0.08))
    d0 = np.array(
        Rz.render(cube, _pose([0, 0, 0.5]), jnp.array(K),
                  Rz.full_frame_window(IMG_W, IMG_H), out_hw=(IMG_H, IMG_W))[1]
    )
    d1 = np.array(
        Rz.render(cube, _pose([0, 0, 0.5], (0.0, 0.6, 0.0)), jnp.array(K),
                  Rz.full_frame_window(IMG_W, IMG_H), out_hw=(IMG_H, IMG_W))[1]
    )
    # Rotated cube occupies different pixels and the rotated one is wider.
    assert (d0 > 0).sum() != (d1 > 0).sum()
    # 45-deg-ish rotation brings an edge closer than the flat face.
    assert d1[d1 > 0].min() < d0[d0 > 0].min()


def test_roi_render_matches_fullframe_crop():
    """ROI-windowed render ~ crop of a full-frame render (the reference's
    two equivalent paths, predict.py:193-215)."""
    sph = Rz.upload(M.make_icosphere(subdiv=3, radius=0.04))
    pose = _pose([0.05, 0.03, 0.55], (0.3, 0.2, 0.1))
    width_mm = 0.08 * 1.1 * 1000

    rgb_w, depth_w, bbox = Rz.render_at_bbox(
        sph, pose, jnp.array(K), width_mm, out_hw=(176, 176)
    )
    rgb_f, depth_f = Rz.render(
        sph, pose, jnp.array(K), Rz.full_frame_window(IMG_W, IMG_H),
        out_hw=(IMG_H, IMG_W),
    )
    rgb_c, depth_c = roi.crop_bbox(rgb_f, depth_f, bbox, (176, 176))

    m_w = np.array(depth_w) > 0
    m_c = np.array(depth_c) > 0
    inter = (m_w & m_c).sum()
    union = (m_w | m_c).sum()
    assert inter / union > 0.93, inter / union
    both = m_w & m_c
    err = np.abs(np.array(depth_w)[both] - np.array(depth_c)[both])
    assert np.median(err) < 2.0  # mm


def test_behind_camera_renders_empty():
    cube = Rz.upload(M.make_cube(0.1))
    rgb, depth = Rz.render(
        cube, _pose([0, 0, -0.5]), jnp.array(K),
        Rz.full_frame_window(IMG_W, IMG_H), out_hw=(IMG_H, IMG_W),
    )
    assert np.array(depth).max() == 0
    assert np.array(rgb).max() == 0


def test_beyond_far_plane_empty():
    cube = Rz.upload(M.make_cube(0.1))
    _, depth = Rz.render(
        cube, _pose([0, 0, 3.0]), jnp.array(K),
        Rz.full_frame_window(IMG_W, IMG_H), out_hw=(IMG_H, IMG_W),
    )
    assert np.array(depth).max() == 0


def test_vmap_over_poses():
    sph = Rz.upload(M.make_icosphere(subdiv=2, radius=0.05))
    poses = jnp.stack([_pose([0, 0, 0.5]), _pose([0.03, 0, 0.6])])
    win = Rz.full_frame_window(176, 176)
    Ksmall = jnp.array([[200.0, 0, 88], [0, 200.0, 88], [0, 0, 1]])

    def r(p):
        return Rz.render(sph, p, Ksmall, win, out_hw=(176, 176))[1]

    depths = jax.vmap(r)(poses)
    assert depths.shape == (2, 176, 176)
    assert np.array(depths[0]).max() > 0


@pytest.mark.slow
def test_skip_blocks_equals_noskip():
    sph = Rz.upload(M.make_icosphere(subdiv=3, radius=0.04))
    pose = _pose([0.02, 0.01, 0.5], (0.2, -0.4, 0.3))
    win = Rz.full_frame_window(IMG_W, IMG_H)
    _, d1 = Rz.render(sph, pose, jnp.array(K), win, out_hw=(IMG_H, IMG_W),
                      skip_blocks=True)
    _, d2 = Rz.render(sph, pose, jnp.array(K), win, out_hw=(IMG_H, IMG_W),
                      skip_blocks=False)
    np.testing.assert_array_equal(np.array(d1), np.array(d2))


def test_pallas_pass1_matches_xla():
    """The Pallas kernel (interpret mode on CPU) must agree with the jnp
    reference implementation pixel-for-pixel on depth."""
    sph = Rz.upload(M.make_icosphere(subdiv=3, radius=0.04))
    pose = _pose([0.03, 0.02, 0.55], (0.4, -0.2, 0.3))
    win = (150.0, 450.0, 100.0, 400.0)
    _, d_xla = Rz.render(sph, pose, jnp.array(K), win, out_hw=(128, 128),
                         impl="xla")
    _, d_pal = Rz.render(sph, pose, jnp.array(K), win, out_hw=(128, 128),
                         impl="pallas_interpret")
    d_xla, d_pal = np.array(d_xla), np.array(d_pal)
    # Winner ties at shared edges may differ; depths must match everywhere.
    np.testing.assert_allclose(d_pal, d_xla, atol=0.3)  # mm
    assert (d_pal > 0).sum() > 100


def test_pallas_pass1_cube_roi():
    cube = Rz.upload(M.make_cube(0.1))
    pose = _pose([0.0, 0.0, 0.5])
    rgb1, d1, _ = Rz.render_at_bbox(cube, pose, jnp.array(K), 130.0,
                                    out_hw=(176, 176), impl="xla")
    rgb2, d2, _ = Rz.render_at_bbox(cube, pose, jnp.array(K), 130.0,
                                    out_hw=(176, 176),
                                    impl="pallas_interpret")
    np.testing.assert_allclose(np.array(d2), np.array(d1), atol=0.3)
    np.testing.assert_allclose(np.array(rgb2), np.array(rgb1), atol=2.0)


def test_backface_cull_output_identical():
    """Culling compacted backfaces must not change a single pixel for a
    closed mesh viewed from outside (sphere AND cube; exercises the
    winner remap through the cull permutation)."""
    for tm in (M.make_icosphere(subdiv=3, radius=0.04), M.make_cube(0.08)):
        mesh = Rz.upload(tm)
        pose = _pose([0.03, 0.02, 0.55], (0.4, -0.2, 0.3))
        win = (150.0, 450.0, 100.0, 400.0)
        rgb0, d0 = Rz.render(mesh, pose, jnp.array(K), win, out_hw=(96, 96),
                             impl="pallas_interpret", cull_backfaces=False)
        rgb1, d1 = Rz.render(mesh, pose, jnp.array(K), win, out_hw=(96, 96),
                             impl="pallas_interpret", cull_backfaces=True)
        # At silhouette z-ties an edge-on backface can co-win with the
        # front face at identical depth; allow micron-scale differences.
        np.testing.assert_allclose(np.array(d1), np.array(d0), atol=0.01)
        bad = np.abs(np.array(rgb1) - np.array(rgb0)).max(axis=-1) > 2.0
        assert bad.mean() < 1e-3, f"{bad.sum()} rgb pixels changed"
        assert (np.array(d1) > 0).sum() > 100
        # XLA path: mask-only cull (no compaction) must also be
        # output-identical.
        rgb2, d2 = Rz.render(mesh, pose, jnp.array(K), win, out_hw=(96, 96),
                             impl="xla", cull_backfaces=True)
        rgb3, d3 = Rz.render(mesh, pose, jnp.array(K), win, out_hw=(96, 96),
                             impl="xla", cull_backfaces=False)
        np.testing.assert_allclose(np.array(d2), np.array(d3), atol=0.01)
        bad = np.abs(np.array(rgb2) - np.array(rgb3)).max(axis=-1) > 2.0
        assert bad.mean() < 1e-3, f"{bad.sum()} xla rgb pixels changed"


def test_worklist_kernel_matches_default():
    """The compacted work-list pass-1 variant is semantically identical."""
    from iros20_6d_pose_tracking_tpu.render import pallas_raster as pr

    sph = Rz.upload(M.make_icosphere(subdiv=3, radius=0.04))
    pose = _pose([0.03, 0.02, 0.55], (0.4, -0.2, 0.3))
    win = (150.0, 450.0, 100.0, 400.0)
    fx, fy, fiz, fvalid, R, t = Rz._project(sph, pose, jnp.array(K), win,
                                            (128, 128), 0.1)
    coef, _ = pr.build_face_coefficients(fx, fy, fiz, fvalid)
    bbox = pr.build_block_bboxes(fx, fy, fvalid, 256)
    iz1, id1 = pr.pallas_pass1(coef, bbox, (128, 128), face_block=256,
                               interpret=True)
    iz2, id2 = pr.pallas_pass1_worklist(coef, bbox, (128, 128),
                                        face_block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(iz2), np.asarray(iz1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(id2), np.asarray(id1))


def test_fused_pass2_gather_bit_identical():
    """fuse_pass2 (one-hot MXU gather kernel) must be BIT-identical to
    the jnp.take pass-2 on the pallas path: the 3-term bf16 split
    reassembles each f32 attribute row exactly."""
    from iros20_6d_pose_tracking_tpu.render import pallas_raster as pr

    rng = np.random.RandomState(0)
    F, C, P = 1280, 36, 7013  # non-multiple P exercises tile padding
    attr = jnp.asarray(rng.randn(F, C).astype(np.float32) * 100)
    winner = jnp.asarray(rng.randint(0, F, (P,)).astype(np.int32))
    covered = jnp.asarray(rng.rand(P) > 0.3)
    rows = np.asarray(pr.pallas_gather_rows(attr, winner, covered,
                                            interpret=True))
    ref = np.asarray(jnp.take(attr, winner, axis=0))
    cov = np.asarray(covered)
    np.testing.assert_array_equal(rows[cov], ref[cov])

    sph = Rz.upload(M.make_icosphere(subdiv=3, radius=0.04))
    pose = _pose([0.03, 0.02, 0.55], (0.4, -0.2, 0.3))
    win = (150.0, 450.0, 100.0, 400.0)
    for cull in (False, True):
        r0, d0 = Rz.render(sph, pose, jnp.array(K), win, out_hw=(128, 128),
                           impl="pallas_interpret", cull_backfaces=cull)
        r1, d1 = Rz.render(sph, pose, jnp.array(K), win, out_hw=(128, 128),
                           impl="pallas_interpret", cull_backfaces=cull,
                           fuse_pass2=True)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
        assert (np.asarray(d1) > 0).sum() > 100
