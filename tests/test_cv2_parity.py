"""Golden tests against OpenCV itself — the library the reference uses —
for the ops we re-implemented in JAX."""
import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from iros20_6d_pose_tracking_tpu.core import se3
from iros20_6d_pose_tracking_tpu.ops import image as I
from iros20_6d_pose_tracking_tpu.ops import depthproc


def test_so3_exp_matches_cv2_rodrigues():
    rng = np.random.RandomState(0)
    for _ in range(25):
        w = rng.randn(3) * rng.uniform(0.01, 3.0)
        want = cv2.Rodrigues(w)[0]
        got = np.asarray(se3.so3_exp(jnp.asarray(w, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_so3_log_matches_cv2_rodrigues():
    rng = np.random.RandomState(1)
    for _ in range(25):
        w = rng.randn(3)
        w = w / np.linalg.norm(w) * rng.uniform(0.01, 3.0)
        R = cv2.Rodrigues(w)[0]
        want = cv2.Rodrigues(R)[0].reshape(-1)
        got = np.asarray(se3.so3_log(jnp.asarray(R, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_codec_rotation_label_matches_reference_math():
    """trans/rot label exactly as datasets.py:141-150 computes them with
    cv2.Rodrigues + column normalization."""
    rng = np.random.RandomState(2)
    tau, rho = 0.02, 15 * np.pi / 180
    for _ in range(10):
        A = np.eye(4)
        A[:3, :3] = cv2.Rodrigues(rng.randn(3))[0]
        A[:3, 3] = rng.randn(3) * 0.1 + [0, 0, 0.6]
        d = rng.randn(3)
        d = d / np.linalg.norm(d) * rng.uniform(0, rho * 0.9)
        B = A.copy()
        B[:3, :3] = cv2.Rodrigues(d)[0] @ A[:3, :3]
        B[:3, 3] = A[:3, 3] + rng.randn(3) * 0.003

        # reference computation
        t_want = (B[:3, 3] - A[:3, 3]) / tau
        rel = B[:3, :3] @ A[:3, :3].T
        rel = rel / np.linalg.norm(rel, axis=0, keepdims=True)
        r_want = cv2.Rodrigues(rel)[0].reshape(-1) / rho

        t_got, r_got = se3.encode_delta(
            jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32), tau, rho
        )
        np.testing.assert_allclose(np.asarray(t_got), t_want, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r_got), r_want, atol=2e-3)


def test_resize_nearest_matches_cv2():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    for size in [(64, 64), (176, 176), (37, 53)]:
        want = cv2.resize(img, (size[1], size[0]),
                          interpolation=cv2.INTER_NEAREST)
        got = np.asarray(I.resize_nearest(jnp.asarray(img), size))
        np.testing.assert_array_equal(got, want)


def test_gaussian_blur_matches_cv2():
    rng = np.random.RandomState(4)
    img = rng.rand(48, 64).astype(np.float32) * 255
    for k in (3, 5, 7):
        want = cv2.GaussianBlur(img, (k, k), sigmaX=2)
        got = np.asarray(I.gaussian_blur(jnp.asarray(img), k, 2.0))
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_median_blur_matches_cv2():
    rng = np.random.RandomState(5)
    img = rng.rand(32, 40).astype(np.float32)
    want = cv2.medianBlur(img, 5)
    got = np.asarray(I.median_blur(jnp.asarray(img), 5))
    # interior exact; cv2 border handling differs on the 2px rim
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], atol=1e-6)


def test_hsv_roundtrip_matches_cv2_scale():
    rng = np.random.RandomState(6)
    rgb = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    want = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV).astype(np.float32)
    got = np.asarray(I.rgb_to_hsv(jnp.asarray(rgb, jnp.float32)))
    # cv2 rounds to uint8; allow 1 step in H (0..180) and S,V (0..255).
    assert np.abs(got - want).max() <= 1.0 + 1e-3
    back = np.asarray(I.hsv_to_rgb(jnp.asarray(got)))
    np.testing.assert_allclose(back, rgb.astype(np.float32), atol=1.0)


def test_dilate_matches_cv2():
    rng = np.random.RandomState(7)
    img = (rng.rand(24, 24) * 10).astype(np.float32)
    kernel = np.ones((5, 5), np.uint8)
    want = cv2.dilate(img, kernel)
    got = np.asarray(I.dilate(jnp.asarray(img), kernel))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fill_depth_fills_holes():
    depth = np.full((48, 48), 1.0, np.float32)
    depth[20:26, 20:26] = 0.0   # hole
    depth[:4] = 0.0             # border emptiness
    out = np.asarray(depthproc.fill_depth(jnp.asarray(depth)))
    assert (out[21:25, 21:25] > 0.5).all()           # hole filled
    assert abs(np.median(out[30:40, 30:40]) - 1.0) < 0.05  # values preserved
