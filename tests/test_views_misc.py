"""Tests for view sampling, point-cloud ops, viz, and mesh decimation."""
import numpy as np
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.core import views
from iros20_6d_pose_tracking_tpu.ops import pointcloud as pc
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.utils import viz


def test_hinter_sampling_uniformity():
    pts, levels = views.hinter_sampling(100, radius=2.0)
    assert len(pts) >= 100
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 2.0, atol=1e-9)
    # Near-uniform: nearest-neighbour spacing varies < 2.5x.
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = np.sqrt(d2.min(1))
    assert nn.max() / nn.min() < 2.5


def test_sample_views_look_at_origin():
    vs, pts = views.sample_views(60, radius=1.5, elev_range=(0, np.pi / 2))
    assert len(vs) > 10
    for v, p in zip(vs[:5], pts[:5]):
        assert p[2] >= -1e-9  # elevation filter
        cam_origin = (v["R"] @ p.reshape(3, 1) + v["t"]).reshape(-1)
        np.testing.assert_allclose(cam_origin, 0, atol=1e-9)  # eye -> origin
        # Center projects onto the +z optical axis.
        center_cam = v["t"].reshape(-1)
        assert center_cam[2] > 0
        np.testing.assert_allclose(center_cam[:2], 0, atol=1e-9)


def test_random_view_matrix_rigid():
    rng = np.random.RandomState(0)
    V = views.random_view_matrix(rng, 0.5, 1.0)
    R = V[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    # camera at distance in [0.5, 1]
    eye = -R.T @ V[:3, 3]
    assert 0.5 <= np.linalg.norm(eye) <= 1.0 + 1e-9


def test_rgbd_to_pointcloud():
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = jnp.full((48, 64), 0.5)
    pts, _, mask = pc.rgbd_to_pointcloud(K, depth)
    assert bool(mask.all())
    p = np.asarray(pts).reshape(48, 64, 3)
    np.testing.assert_allclose(p[24, 32], [0, 0, 0.5], atol=1e-6)
    np.testing.assert_allclose(p[24, 42], [0.05, 0, 0.5], atol=1e-6)


def test_find_class_videos(tmp_path):
    for vid, classes in [(48, [1, 4]), (50, [2]), (3, [4])]:
        for c in classes:
            (tmp_path / f"{vid:04d}" / "pose_gt" / str(c)).mkdir(parents=True)
    assert pc.find_class_contained_videos_ycb(str(tmp_path), 4) == [48]
    assert pc.find_class_contained_videos_ycb(str(tmp_path), 4,
                                              testset=False) == [3, 48]


def test_make_canvas():
    a = np.full((8, 8, 3), 10, np.uint8)
    b = np.full((8, 8, 3), 200, np.uint8)
    canvas = viz.make_canvas([a, b], flip_br=False, gap=4)
    assert canvas.shape == (8, 20, 3)
    assert (canvas[:, 8:12] == 0).all()  # gap
    assert (canvas[:, 12:] == 200).all()


def test_decimate_counts_and_shape():
    tm = M.make_icosphere(subdiv=4, radius=0.05)  # 5120 faces
    v, f, c = M.decimate(tm.verts, tm.faces[: tm.num_faces], tm.colors, 1200)
    assert 400 <= len(f) <= 2400, len(f)
    # Surface preserved: vertices stay near the sphere.
    r = np.linalg.norm(v, axis=1)
    assert abs(r.mean() - 0.05) < 0.004
    assert c.shape == (len(v), 3)
    # Decimated mesh renders fine.
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
    import jax.numpy as jnp
    mesh = rz.upload(M.build_trimesh(v, f, c))
    K = jnp.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]])
    pose = jnp.eye(4).at[2, 3].set(0.5)
    _, d = rz.render(mesh, pose, K, rz.full_frame_window(128, 128),
                     out_hw=(128, 128))
    assert float(np.asarray(d).max()) > 0


def test_binary_ply_roundtrip(tmp_path):
    """Exercise the binary_little_endian PLY parser with a hand-written
    file (verts + colors + normals + faces)."""
    import struct

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    normals = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]],
                      np.uint8)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    path = tmp_path / "bin.ply"
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\n")
        for p in ("x", "y", "z", "nx", "ny", "nz"):
            f.write(f"property float {p}\n".encode())
        for c in ("red", "green", "blue"):
            f.write(f"property uchar {c}\n".encode())
        f.write(b"element face 2\n")
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        for i in range(4):
            f.write(struct.pack("<6f", *verts[i], *normals[i]))
            f.write(struct.pack("<3B", *colors[i]))
        for fc in faces:
            f.write(struct.pack("<B3i", 3, *fc))

    d = M.load_ply(str(path))
    np.testing.assert_allclose(d["verts"], verts, atol=1e-6)
    np.testing.assert_allclose(d["colors"], colors / 255.0, atol=1e-6)
    np.testing.assert_array_equal(d["faces"], faces)
    tm = M.load_mesh(str(path))
    assert tm.num_faces == 2


def test_ascii_ply_quad_triangulation(tmp_path):
    """ASCII PLY with a quad face fan-triangulates to 2 triangles."""
    path = tmp_path / "quad.ply"
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write("element vertex 4\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("element face 1\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        f.write("0 0 0\n1 0 0\n1 1 0\n0 1 0\n")
        f.write("4 0 1 2 3\n")
    d = M.load_ply(str(path))
    assert d["faces"].shape == (2, 3)


def test_is_closed_detection():
    """Watertight oriented meshes -> True (safe to backface-cull);
    open/degenerate face sets -> False."""
    sphere = M.make_icosphere(subdiv=2, radius=0.05)
    assert M.is_closed(sphere.verts, sphere.faces[: sphere.num_faces])
    # the face-colored cube duplicates vertices per face: the weld step
    # must recover its geometric closedness
    cube = M.make_cube(0.08)
    assert M.is_closed(cube.verts, cube.faces[: cube.num_faces])
    tri = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]],
                   np.float32)
    # one triangle: boundary edges have no reverse
    assert not M.is_closed(tri, np.array([[0, 1, 2]]))
    # two triangles sharing an edge with the SAME orientation (flipped
    # winding): directed edge repeated
    assert not M.is_closed(tri, np.array([[0, 1, 2], [0, 1, 3]]))
    # padding row (0,0,0) is degenerate
    assert not M.is_closed(tri, np.array([[0, 0, 0]]))
