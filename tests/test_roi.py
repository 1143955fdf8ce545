"""ROI bbox/crop golden tests against independently-written numpy reference
implementations of the Utils.py:302-359 semantics."""
import numpy as np
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.ops import roi


def np_compute_bbox(pose, K, scale_size, scale=(1, 1, 1)):
    """Literal numpy transcription of the documented semantics."""
    ox, oy, oz = pose[0, 3] * scale[0], pose[1, 3] * scale[1], pose[2, 3] * scale[2]
    off = scale_size / 2
    pts = np.array(
        [
            [ox - off, oy - off, oz],
            [ox - off, oy + off, oz],
            [ox + off, oy - off, oz],
            [ox + off, oy + off, oz],
        ]
    )
    vus = np.zeros((4, 2))
    vus[:, 1] = pts[:, 0] * K[0, 0] / pts[:, 2] + K[0, 2]
    vus[:, 0] = pts[:, 1] * K[1, 1] / pts[:, 2] + K[1, 2]
    return np.round(vus).astype(np.int32)


def np_crop_nearest(img, top, left, crop_h, crop_w, out_hw):
    """Zero-pad crop + cv2-style nearest resize, numpy."""
    H_out, W_out = out_hw
    h, w = img.shape[:2]
    chan = img.shape[2:] if img.ndim == 3 else ()
    crop = np.zeros((crop_h, crop_w) + chan, dtype=np.float64)
    t0, l0 = max(top, 0), max(left, 0)
    b0, r0 = min(top + crop_h, h), min(left + crop_w, w)
    if b0 > t0 and r0 > l0:
        crop[t0 - top : b0 - top, l0 - left : r0 - left] = img[t0:b0, l0:r0]
    out = np.zeros((H_out, W_out) + chan)
    for i in range(H_out):
        for j in range(W_out):
            si = (i * crop_h) // H_out
            sj = (j * crop_w) // W_out
            out[i, j] = crop[si, sj]
    return out


def _default_K():
    return np.array([[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]])


def test_compute_bbox_matches_numpy():
    K = _default_K()
    rng = np.random.RandomState(0)
    for _ in range(20):
        pose = np.eye(4)
        pose[:3, 3] = [rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), rng.uniform(0.4, 1.2)]
        for scale in [(1000, 1000, 1000), (1000, -1000, 1000)]:
            want = np_compute_bbox(pose, K, 250.0, scale)
            got = np.array(roi.compute_bbox(jnp.array(pose, jnp.float32), jnp.array(K, jnp.float32), 250.0, scale))
            np.testing.assert_array_equal(got, want)


def test_crop_resize_in_bounds():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, size=(480, 640, 3)).astype(np.float32)
    out = np.array(
        roi.crop_resize_nearest(jnp.array(img), jnp.int32(100), jnp.int32(200), jnp.int32(150), jnp.int32(150), (64, 64))
    )
    want = np_crop_nearest(img, 100, 200, 150, 150, (64, 64))
    np.testing.assert_allclose(out, want)


def test_crop_resize_out_of_bounds_zero_pad():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, size=(120, 160)).astype(np.float32)
    # bbox hanging off the top-left corner
    out = np.array(
        roi.crop_resize_nearest(jnp.array(img), jnp.int32(-30), jnp.int32(-20), jnp.int32(100), jnp.int32(100), (50, 50))
    )
    want = np_crop_nearest(img, -30, -20, 100, 100, (50, 50))
    np.testing.assert_allclose(out, want)
    assert out[0, 0] == 0.0  # padded region


def test_crop_resize_off_bottom_right():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, size=(120, 160)).astype(np.float32)
    out = np.array(
        roi.crop_resize_nearest(jnp.array(img), jnp.int32(80), jnp.int32(120), jnp.int32(100), jnp.int32(100), (50, 50))
    )
    want = np_crop_nearest(img, 80, 120, 100, 100, (50, 50))
    np.testing.assert_allclose(out, want)


def test_crop_bbox_end_to_end():
    K = _default_K()
    pose = np.eye(4)
    pose[:3, 3] = [0.02, -0.03, 0.7]
    bbox = np.array(roi.compute_bbox(jnp.array(pose, jnp.float32), jnp.array(K, jnp.float32), 250.0, (1000, 1000, 1000)))
    rng = np.random.RandomState(4)
    color = rng.randint(0, 255, size=(480, 640, 3)).astype(np.float32)
    depth = rng.randint(300, 1500, size=(480, 640)).astype(np.float32)
    c, d = roi.crop_bbox(jnp.array(color), jnp.array(depth), jnp.array(bbox), (176, 176))
    assert c.shape == (176, 176, 3) and d.shape == (176, 176)
    left, right = bbox[:, 1].min(), bbox[:, 1].max()
    top, bottom = bbox[:, 0].min(), bbox[:, 0].max()
    want_c = np_crop_nearest(color, top, left, bottom - top, right - left, (176, 176))
    np.testing.assert_allclose(np.array(c), want_c)
