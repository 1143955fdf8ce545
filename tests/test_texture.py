"""UV-textured rendering: OBJ/MTL parsing, perspective-correct UV
interpolation through the linear-form attribute pipeline, texture
sampling parity across rasterizer impls.

The reference renders textured CAD models through trimesh/pyrender
materials (reference offscreen_renderer.py:53-69); here the texture is
sampled on device in pass 2 (render/rasterizer.py::shade_rows).
"""
import numpy as np
import pytest

from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz

RES = (64, 64)
K = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]], np.float32)


def _quad_trimesh(uv_lo=0.05, uv_hi=0.95, texture=None):
    """Unit-ish quad in the xy-plane facing the camera (+z normal toward
    -z i.e. the camera), with per-corner UVs."""
    s = 0.1
    verts = np.array(
        [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    normals = np.tile(np.array([0, 0, -1], np.float32), (4, 1))
    uv = {0: (uv_lo, uv_lo), 1: (uv_hi, uv_lo),
          2: (uv_hi, uv_hi), 3: (uv_lo, uv_hi)}
    face_uvs = np.array(
        [[uv[i] for i in f] for f in faces], np.float32)
    colors = np.array([[*uv[i], 0.5] for i in range(4)], np.float32)
    return M.build_trimesh(verts, faces, colors, normals,
                           face_uvs=face_uvs, texture=texture)


def _gradient_texture(th=257, tw=257):
    """tex[y, x] = (u, v, 0.5) with u = x/(tw-1), v = 1 - y/(th-1):
    bilinear sampling at (u, v) returns exactly (u, v, 0.5), so a
    textured render must match a vertex-colored render whose corner
    colors are (u, v, 0.5) — both are the same perspective-correct
    interpolation of the linear forms."""
    y, x = np.mgrid[0:th, 0:tw].astype(np.float32)
    return np.stack([x / (tw - 1), 1.0 - y / (th - 1),
                     np.full((th, tw), 0.5, np.float32)], -1)


def _pose(z=0.5, rot_axis_angle=None):
    pose = np.eye(4, dtype=np.float32)
    if rot_axis_angle is not None:
        import jax.numpy as jnp

        from iros20_6d_pose_tracking_tpu.core import se3

        pose[:3, :3] = np.asarray(
            se3.so3_exp(jnp.asarray(rot_axis_angle, jnp.float32)))
    pose[2, 3] = z
    return pose


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("tilt", [None, (0.5, -0.4, 0.2)],
                         ids=["fronto", "tilted"])
def test_textured_equals_vertex_color_oracle(impl, tilt):
    """Gradient texture ≡ vertex-color interpolation (same linear forms),
    at fronto-parallel AND strongly tilted poses — the tilted case fails
    for any NON-perspective-correct UV scheme."""
    import jax.numpy as jnp

    tex = _gradient_texture()
    tm_tex = _quad_trimesh(texture=tex)
    tm_col = _quad_trimesh(texture=None)
    pose = jnp.asarray(_pose(rot_axis_angle=tilt))
    Kj = jnp.asarray(K)
    window = rz.full_frame_window(*RES)
    rgb_t, d_t = rz.render(rz.upload(tm_tex), pose, Kj, window,
                           out_hw=RES, impl=impl)
    rgb_c, d_c = rz.render(rz.upload(tm_col), pose, Kj, window,
                           out_hw=RES, impl=impl)
    rgb_t, rgb_c = np.asarray(rgb_t), np.asarray(rgb_c)
    hit = np.asarray(d_t) > 0
    assert hit.sum() > 200, "quad must cover a real pixel area"
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_c),
                               atol=0.26)  # pallas packed-key z rounding
    assert np.abs(rgb_t[hit] - rgb_c[hit]).max() < 0.5  # 0..255 scale


def test_texture_pallas_matches_xla():
    """The Pallas kernel path and the XLA oracle shade textured meshes
    identically (winner ids feed the same UV rows)."""
    import jax.numpy as jnp

    tm = _quad_trimesh(texture=_gradient_texture())
    mesh = rz.upload(tm)
    pose = jnp.asarray(_pose(rot_axis_angle=(0.4, 0.3, 0.0)))
    Kj = jnp.asarray(K)
    window = rz.full_frame_window(*RES)
    rgb_x, d_x = rz.render(mesh, pose, Kj, window, out_hw=RES, impl="xla")
    rgb_p, d_p = rz.render(mesh, pose, Kj, window, out_hw=RES,
                           impl="pallas_interpret")
    assert np.abs(np.asarray(rgb_x) - np.asarray(rgb_p)).max() < 0.5
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(d_p), atol=0.26)


def test_checkerboard_orientation():
    """8x8 checker texture renders with the expected quadrant colors:
    pins the UV origin (bottom-left) and the v flip into image rows."""
    import jax.numpy as jnp

    checker = np.zeros((8, 8, 3), np.float32)
    checker[:4, :4] = (1, 0, 0)    # texture TOP-left (v near 1) red
    checker[:4, 4:] = (0, 1, 0)    # top-right green
    checker[4:, :4] = (0, 0, 1)    # bottom-left (v near 0) blue
    checker[4:, 4:] = (1, 1, 1)
    # nearest-like sampling: keep UVs off texel boundaries
    tm = _quad_trimesh(uv_lo=0.15, uv_hi=0.85, texture=checker)
    pose = jnp.asarray(_pose())
    rgb, depth = rz.render(rz.upload(tm), pose, jnp.asarray(K),
                           rz.full_frame_window(*RES), out_hw=RES)
    rgb = np.asarray(rgb)
    # Object-space: v=+y is DOWN in image (CV camera y down). Corner 0
    # (-s,-s) has uv (.15,.15) -> texture bottom-left = blue, and
    # projects to the image TOP-left quadrant.
    H, W = RES
    top_left = rgb[H // 2 - 8, W // 2 - 8]
    bot_left = rgb[H // 2 + 8, W // 2 - 8]
    assert top_left[2] > 100 and top_left[0] < 60, top_left   # blue
    assert bot_left[0] > 100 and bot_left[2] < 60, bot_left   # red


def test_obj_mtl_texture_loading(tmp_path):
    """OBJ with vt + f v/vt + mtllib/map_Kd loads into a textured
    TriMesh; Morton reordering keeps face_uvs aligned with faces."""
    from PIL import Image

    tex = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    Image.fromarray(tex).save(tmp_path / "albedo.png")
    (tmp_path / "mat.mtl").write_text(
        "newmtl m0\nKd 1 1 1\nmap_Kd albedo.png\n")
    (tmp_path / "model.obj").write_text(
        "mtllib mat.mtl\n"
        "v -0.1 -0.1 0\nv 0.1 -0.1 0\nv 0.1 0.1 0\nv -0.1 0.1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl m0\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    tm = M.load_mesh(str(tmp_path / "model.obj"))
    assert tm.texture is not None and tm.texture.shape == (16, 16, 3)
    assert tm.face_uvs is not None
    assert tm.face_uvs.shape == (tm.faces.shape[0], 3, 2)
    # UVs aligned with faces through the Morton permutation: corner uv
    # equals the uv of the corner's ORIGINAL vertex (vertex i had uv
    # uv_table[i] in this file).
    uv_table = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    real = tm.faces[: tm.num_faces]
    np.testing.assert_allclose(tm.face_uvs[: tm.num_faces],
                               uv_table[real], atol=0)
    # And it renders with non-uniform (textured) albedo.
    import jax.numpy as jnp

    rgb, depth = rz.render(rz.upload(tm), jnp.asarray(_pose()),
                           jnp.asarray(K), rz.full_frame_window(*RES),
                           out_hw=RES)
    rgb = np.asarray(rgb)
    hit = np.asarray(depth) > 0
    assert hit.sum() > 200
    assert rgb[hit].std(axis=0).mean() > 5.0, "texture detail visible"


def test_bake_texture_to_colors():
    """Baking reproduces the gradient texture's per-vertex albedo."""
    tex = _gradient_texture()
    tm = _quad_trimesh(texture=tex)
    real = tm.faces[: tm.num_faces]
    cols = M.bake_texture_to_colors(tm.verts, real,
                                    tm.face_uvs[: tm.num_faces], tex)
    # vertex 0 has uv (.05,.05) -> color (.05,.05,.5)
    np.testing.assert_allclose(cols[0], [0.05, 0.05, 0.5], atol=0.01)
    np.testing.assert_allclose(cols[2], [0.95, 0.95, 0.5], atol=0.01)


def test_untextured_paths_unchanged():
    """Meshes without UVs keep the 30-column attribute pack and vertex
    color shading (no behavior change for every existing consumer)."""
    import jax.numpy as jnp

    tm = M.make_cube(0.08)
    assert tm.face_uvs is None and tm.texture is None
    mesh = rz.upload(tm)
    assert mesh.fuvs is None and mesh.texture is None
    rgb, depth = rz.render(mesh, jnp.asarray(_pose(z=0.4)),
                           jnp.asarray(K), rz.full_frame_window(*RES),
                           out_hw=RES)
    assert np.asarray(depth).max() > 0


def test_textured_box_through_synthetic_pairs():
    """The suite's textured object: sub-face texture detail must survive
    the full on-device pair sampler (train-side of the closed loop) —
    a rendered rgbA face shows more distinct colors than the 6 vertex-
    color fallback hues could produce."""
    import jax
    import jax.numpy as jnp
    from iros20_6d_pose_tracking_tpu.data.dataset import SyntheticPairs

    tm = M.make_textured_box()
    assert tm.face_uvs is not None and tm.texture is not None
    sp = SyntheticPairs(rz.upload(tm), K, resolution=64,
                        object_width_mm=140.0)
    raw = sp.sample_batch(jax.random.PRNGKey(3), 2)
    rgbA = np.asarray(raw["rgbA"] if isinstance(raw, dict)
                      else raw[0])
    a = rgbA[0]
    if a.dtype != np.uint8:
        a = np.clip(a, 0, 255).astype(np.uint8)
    fg = a.reshape(-1, 3)
    fg = fg[fg.sum(1) > 0]
    uniq = np.unique((fg // 24), axis=0)
    assert len(uniq) > 12, f"only {len(uniq)} quantized colors: " \
        "texture did not reach the pair sampler"


def test_textured_box_in_suite_registry():
    from iros20_6d_pose_tracking_tpu.eval import synthetic_benchmark as SB

    assert "textured_box" in SB.OBJECTS
    assert "textured_box" not in SB.SYMMETRIC_OBJECTS


def test_save_obj_roundtrip_render(tmp_path):
    """save_obj -> load_mesh round trip renders identically (up to the
    PNG's uint8 texture quantization) for a textured mesh, and exactly
    matches geometry for an untextured one — the disk form a predict-CLI
    user hands to --model_path."""
    import jax.numpy as jnp

    tm = M.make_textured_box()
    p = str(tmp_path / "tex_box.obj")
    M.save_obj(tm, p)
    tm2 = M.load_mesh(p)
    assert tm2.texture is not None and tm2.face_uvs is not None
    pose = _pose(z=0.45, rot_axis_angle=(0.5, 0.6, 0.1))
    win = rz.full_frame_window(*RES)
    r1, d1 = rz.render(rz.upload(tm), jnp.asarray(pose), jnp.asarray(K),
                       win, out_hw=RES)
    r2, d2 = rz.render(rz.upload(tm2), jnp.asarray(pose), jnp.asarray(K),
                       win, out_hw=RES)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-3)
    # rgb is 0..255; the PNG round trip quantizes texels to uint8, so
    # bilinear-sampled pixels may move by up to ~1 gray level
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1.0)

    cube = M.make_cube(0.08)
    p2 = str(tmp_path / "cube.obj")
    M.save_obj(cube, p2)
    c2 = M.load_mesh(p2)
    np.testing.assert_allclose(cube.verts, c2.verts, atol=1e-6)
    np.testing.assert_array_equal(cube.faces[: cube.num_faces],
                                  c2.faces[: c2.num_faces])
    np.testing.assert_allclose(cube.colors, c2.colors, atol=1e-4)


def _subdivide_textured(tm, levels=3):
    """Midpoint-subdivide every face; per-corner UVs interpolate with the
    geometry (test helper for building a finely-tessellated textured
    mesh)."""
    verts = np.asarray(tm.verts, np.float64)
    faces = np.asarray(tm.faces[: tm.num_faces])
    uvs = np.asarray(tm.face_uvs[: tm.num_faces], np.float64)
    for _ in range(levels):
        tri = verts[faces]                      # (F, 3, 3)
        mid = (tri + np.roll(tri, -1, axis=1)) / 2  # m01, m12, m20
        uv_mid = (uvs + np.roll(uvs, -1, axis=1)) / 2
        new_tris, new_uvs = [], []
        for corner in range(3):
            new_tris.append(np.stack(
                [tri[:, corner], mid[:, corner],
                 mid[:, (corner + 2) % 3]], axis=1))
            new_uvs.append(np.stack(
                [uvs[:, corner], uv_mid[:, corner],
                 uv_mid[:, (corner + 2) % 3]], axis=1))
        new_tris.append(mid)
        new_uvs.append(uv_mid)
        tri = np.concatenate(new_tris, 0)
        uvs = np.concatenate(new_uvs, 0)
        # re-index: unique vertices from the triangle soup
        flat = tri.reshape(-1, 3)
        uniq, inv = np.unique(np.round(flat, 9), axis=0,
                              return_inverse=True)
        verts = uniq
        faces = inv.reshape(-1, 3)
    return M.build_trimesh(verts, faces, face_uvs=uvs.astype(np.float32),
                           texture=tm.texture)


def test_uv_preserving_decimation_golden():
    """Decimating a finely-tessellated textured mesh KEEPS the texture:
    per-corner UVs ride the surviving faces (seams included), so the
    decimated render matches the original far better than the old
    bake-to-vertex-colors fallback (VERDICT r3 #8)."""
    import jax.numpy as jnp

    base = M.make_textured_box()
    fine = _subdivide_textured(base, levels=3)   # 12 -> 768 real faces
    assert fine.num_faces > 700
    target = 120
    v, f, c, fuv = M.decimate(fine.verts, fine.faces[: fine.num_faces],
                              None, target,
                              face_uvs=fine.face_uvs[: fine.num_faces])
    dec = M.build_trimesh(v, f, c, face_uvs=fuv, texture=fine.texture)
    assert dec.num_faces < fine.num_faces
    assert dec.face_uvs is not None and dec.texture is not None

    # old fallback: bake texture to vertex colors, then decimate
    baked_colors = M.bake_texture_to_colors(
        fine.verts, fine.faces[: fine.num_faces],
        fine.face_uvs[: fine.num_faces], fine.texture)
    vb, fb, cb = M.decimate(fine.verts, fine.faces[: fine.num_faces],
                            baked_colors, target)
    baked = M.build_trimesh(vb, fb, cb)

    K = np.array([[300.0, 0, 64.0], [0, 300.0, 64.0], [0, 0, 1.0]],
                 np.float32)
    win = rz.full_frame_window(128, 128)
    pose = jnp.eye(4).at[2, 3].set(0.45)
    ref_rgb, _ = rz.render(rz.upload(fine), pose, jnp.asarray(K), win,
                           out_hw=(128, 128), impl="xla")
    dec_rgb, dec_d = rz.render(rz.upload(dec), pose, jnp.asarray(K), win,
                               out_hw=(128, 128), impl="xla")
    bak_rgb, _ = rz.render(rz.upload(baked), pose, jnp.asarray(K), win,
                           out_hw=(128, 128), impl="xla")
    hit = np.asarray(dec_d) > 0
    assert hit.mean() > 0.05
    err_uv = np.abs(np.asarray(ref_rgb) - np.asarray(dec_rgb))[hit].mean()
    err_bake = np.abs(np.asarray(ref_rgb) - np.asarray(bak_rgb))[hit].mean()
    # texture detail survives: UV-preserving decimation at least halves
    # the appearance error of the bake fallback, and stays close to the
    # full-resolution textured render in absolute terms
    assert err_uv < 0.5 * err_bake
    assert err_uv < 12.0


def test_tracker_max_faces_keeps_texture():
    """Tracker(max_faces=...) on a textured mesh now uploads a TEXTURED
    decimated mesh (fuvs + texture on the device arrays), not a
    vertex-color bake."""
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.tracking.tracker import Tracker

    base = M.make_textured_box()
    fine = _subdivide_textured(base, levels=2)   # 192 real faces
    info = {
        "camera": {"focalX": 300.0, "focalY": 300.0, "centerX": 64.0,
                   "centerY": 64.0, "width": 128, "height": 128},
        "resolution": 48, "boundingbox": 10,
        "max_translation": 0.02, "max_rotation": 15,
        "models": {},
    }
    t = Tracker(info, np.zeros(8), np.full(8, 100.0), mesh=fine,
                max_faces=60, persistent_cache=False)
    assert t.mesh.fuvs is not None and t.mesh.texture is not None
    assert int(t.mesh.fmask.sum()) <= 64 + 60  # decimated (padding aside)
