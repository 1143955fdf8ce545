"""so(3)/se(3) map and pose-codec tests (round trips + cv2-free goldens)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iros20_6d_pose_tracking_tpu.core import se3


def _np_rodrigues_exp(w):
    """Independent numpy Rodrigues for cross-checking."""
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    k = w / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


@pytest.mark.parametrize("seed", range(5))
def test_exp_matches_numpy(seed):
    rng = np.random.RandomState(seed)
    w = rng.randn(3) * rng.uniform(0.01, 2.5)
    R = np.array(se3.so3_exp(jnp.array(w, dtype=jnp.float32)))
    np.testing.assert_allclose(R, _np_rodrigues_exp(w), atol=1e-5)


def test_exp_log_roundtrip_batch():
    rng = np.random.RandomState(0)
    w = rng.randn(256, 3).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    w *= rng.uniform(1e-4, 3.0, size=(256, 1)).astype(np.float32)  # theta < pi
    R = se3.so3_exp(jnp.array(w))
    w2 = np.array(se3.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=2e-4)


def test_log_identity_and_tiny():
    assert np.allclose(np.array(se3.so3_log(jnp.eye(3))), 0.0, atol=1e-6)
    w = jnp.array([1e-7, -2e-7, 3e-7])
    np.testing.assert_allclose(np.array(se3.so3_log(se3.so3_exp(w))), np.array(w), atol=1e-8)


def test_log_near_pi():
    rng = np.random.RandomState(3)
    for _ in range(20):
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        theta = np.pi - 1e-5
        w = (axis * theta).astype(np.float32)
        R = se3.so3_exp(jnp.array(w))
        w2 = np.array(se3.so3_log(R))
        # log is defined up to sign at pi; compare rotations. f32 arccos
        # conditioning near trace=-1 bounds accuracy to ~sqrt(eps).
        R2 = np.array(se3.so3_exp(jnp.array(w2)))
        np.testing.assert_allclose(R2, np.array(R), atol=2e-3)


def test_exactly_pi_rotation():
    # R = diag(1,-1,-1): rotation by pi around x.
    R = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
    w = np.array(se3.so3_log(R))
    np.testing.assert_allclose(np.abs(w), [np.pi, 0, 0], atol=1e-4)


def test_normalize_rotation_matrix_column_semantics():
    rng = np.random.RandomState(1)
    R = np.array(se3.so3_exp(jnp.array(rng.randn(3), dtype=jnp.float32)))
    Rs = R * np.array([2.0, 0.5, 3.0])[None, :]  # scale columns
    out = np.array(se3.normalize_rotation_matrix(jnp.array(Rs)))
    np.testing.assert_allclose(out, R, atol=1e-5)


def test_pose_compose_inverse():
    rng = np.random.RandomState(2)
    T = se3.make_pose(
        se3.so3_exp(jnp.array(rng.randn(3), dtype=jnp.float32)),
        jnp.array(rng.randn(3), dtype=jnp.float32),
    )
    out = np.array(T @ se3.pose_inv(T))
    np.testing.assert_allclose(out, np.eye(4), atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.RandomState(4)
    xi = jnp.array(rng.randn(64, 6).astype(np.float32) * 0.5)
    T = se3.se3_exp(xi)
    xi2 = np.array(se3.se3_log(T))
    np.testing.assert_allclose(xi2, np.array(xi), atol=1e-4)


def test_codec_roundtrip():
    """encode_delta/decode_delta must be exact inverses (datasets.py parity)."""
    rng = np.random.RandomState(5)
    tau, rho = 0.03, 5 * np.pi / 180
    for _ in range(10):
        RA = np.array(se3.so3_exp(jnp.array(rng.randn(3), dtype=jnp.float32)))
        A = np.eye(4)
        A[:3, :3] = RA
        A[:3, 3] = rng.randn(3) * 0.2 + [0, 0, 0.8]
        delta_w = rng.randn(3)
        delta_w = delta_w / np.linalg.norm(delta_w) * rng.uniform(0, rho * 0.95)
        delta_t = rng.randn(3)
        delta_t = delta_t / np.linalg.norm(delta_t) * rng.uniform(0, tau * 0.95)
        B = np.eye(4)
        B[:3, :3] = np.array(se3.so3_exp(jnp.array(delta_w, dtype=jnp.float32))) @ RA
        B[:3, 3] = A[:3, 3] + delta_t

        tl, rl = se3.encode_delta(jnp.array(A, jnp.float32), jnp.array(B, jnp.float32), tau, rho)
        tl, rl = np.array(tl), np.array(rl)
        assert np.all(np.abs(tl) <= 1.0 + 1e-5)
        assert np.all(np.abs(rl) <= 1.0 + 1e-4)
        B2 = np.array(
            se3.decode_delta(jnp.array(A, jnp.float32), jnp.array(tl), jnp.array(rl), tau, rho)
        )
        np.testing.assert_allclose(B2, B, atol=1e-5)


def test_codec_batched():
    rng = np.random.RandomState(6)
    A = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    A[:, :3, 3] = rng.randn(8, 3) * 0.1 + [0, 0, 0.7]
    B = A.copy()
    B[:, :3, 3] += rng.randn(8, 3) * 0.005
    tl, rl = se3.encode_delta(jnp.array(A), jnp.array(B), 0.02, 15 * np.pi / 180)
    assert tl.shape == (8, 3) and rl.shape == (8, 3)
    B2 = np.array(se3.decode_delta(jnp.array(A), tl, rl, 0.02, 15 * np.pi / 180))
    np.testing.assert_allclose(B2, B, atol=1e-5)


def test_random_gaussian_magnitude_bounds():
    key = jax.random.PRNGKey(0)
    poses = se3.random_gaussian_magnitude(key, 0.02, 15.0, shape=(512,))
    t = np.array(poses[:, :3, 3])
    assert np.all(np.linalg.norm(t, axis=-1) <= 0.02 + 1e-6)
    w = np.array(se3.so3_log(poses[:, :3, :3]))
    assert np.all(np.linalg.norm(w, axis=-1) <= 15.0 * np.pi / 180 + 1e-5)
