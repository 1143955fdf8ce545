"""so(3)/se(3) maps and the relative-pose codec, pure JAX.

Reference semantics (cited for parity, independently implemented):
  - Rodrigues exp/log: reference relies on ``cv2.Rodrigues``
    (reference datasets.py:148,173).
  - Column-normalized (NOT re-orthogonalized) rotation cleanup:
    reference Utils.py:363-367 ``normalize_rotation_matrix``.
  - Pose codec: ``trans_label = (t_B - t_A)/tau``;
    ``rot_label = log(colnorm(R_B R_A^T)) / rho``
    (reference datasets.py:141-150); inverse composes
    ``R_B = exp(rho*rot) R_A``, ``t_B = t_A + tau*trans``
    (reference datasets.py:159-175).

All functions are shape-polymorphic over leading batch dims where noted and
safe to ``jit`` / ``vmap`` / differentiate (small-angle branches are handled
with Taylor-series blends rather than data-dependent control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# TPU matmul defaults to reduced (bf16-ish) precision; pose math is tiny
# 3x3/4x4 algebra where that error compounds over thousands of tracked
# frames, so every contraction here pins HIGHEST precision (no measurable
# cost at these shapes).
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_PREC)


def _mv(a, b):
    return jnp.einsum("...ij,...j->...i", a, b, precision=_PREC)


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew matrices."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues' formula: rotation vector (..., 3) -> rotation matrix (..., 3, 3).

    Uses series expansions of sin(t)/t and (1-cos t)/t^2 near t=0 so the map
    is smooth and differentiable everywhere.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1 - cos t)/t^2 with small-angle Taylor blends.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * _mm(K, K)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> rotation vector (..., 3).

    Matches cv2.Rodrigues semantics: returns theta * axis with
    theta in [0, pi]. The theta ~ pi branch extracts the axis from the
    diagonal of (R + I)/2 with signs fixed from the off-diagonals.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)

    # Generic branch: w = theta/(2 sin theta) * vee(R - R^T)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # theta/(2 sin theta): -> 1/2 as theta -> 0.
    small = theta < 1e-5
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.maximum(2.0 * sin_t, _EPS),
    )
    w_generic = scale[..., None] * vee

    # theta ~ pi branch: R ~ I + 2 ww^T - ... ; axis^2 = (diag(R)+1)/2.
    near_pi = theta > (jnp.pi - 1e-3)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.maximum((diag + 1.0) * 0.5, 0.0))
    # Fix signs relative to the largest component using off-diagonal sums,
    # which are proportional to a_i a_j near pi.
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]
    largest = jnp.argmax(axis_abs, axis=-1)

    def signed_axis(k, a, s01, s02, s12):
        sx, sy, sz = a[..., 0], a[..., 1], a[..., 2]
        def sgn(x):
            return jnp.where(x >= 0, 1.0, -1.0)
        ax0 = jnp.stack([sx, sy * sgn(s01), sz * sgn(s02)], axis=-1)
        ax1 = jnp.stack([sx * sgn(s01), sy, sz * sgn(s12)], axis=-1)
        ax2 = jnp.stack([sx * sgn(s02), sy * sgn(s12), sz], axis=-1)
        onehot = jax.nn.one_hot(k, 3, dtype=a.dtype)
        return (
            onehot[..., 0:1] * ax0 + onehot[..., 1:2] * ax1 + onehot[..., 2:3] * ax2
        )

    axis_pi = signed_axis(largest, axis_abs, s01, s02, s12)
    # cv2.Rodrigues sign convention near pi: make vee agree when nonzero;
    # at exactly pi, either sign is a valid log. Keep continuity with vee.
    dot_vee = jnp.sum(axis_pi * vee, axis=-1, keepdims=True)
    axis_pi = jnp.where(dot_vee < 0, -axis_pi, axis_pi)
    w_pi = theta[..., None] * axis_pi

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def normalize_rotation_matrix(R: jax.Array) -> jax.Array:
    """Column-wise L2 normalization of a near-rotation matrix.

    Deliberately matches reference Utils.py:363-367, which normalizes the
    three columns independently (no Gram-Schmidt / polar projection).
    """
    norms = jnp.linalg.norm(R, axis=-2, keepdims=True)
    return R / jnp.maximum(norms, _EPS)


def make_pose(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation + (..., 3) translation -> (..., 4, 4) pose."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def pose_inv(T: jax.Array) -> jax.Array:
    """Inverse of a rigid transform (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(Rt, -_mv(Rt, t))


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) exp: (..., 6) [rho(trans), w(rot)] -> (..., 4, 4)."""
    rho, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b[..., None, None] * K + c[..., None, None] * _mm(K, K)
    return make_pose(R, _mv(V, rho))


def se3_log(T: jax.Array) -> jax.Array:
    """se(3) log: (..., 4, 4) -> (..., 6) [rho, w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin/(2(1-cos))) K^2
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS))
        / jnp.maximum(theta2, _EPS),
    )
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + cot_term[..., None, None] * _mm(K, K)
    rho = _mv(Vinv, t)
    return jnp.concatenate([rho, w], axis=-1)


# ---------------------------------------------------------------------------
# Relative-pose codec (the network's label space).
# ---------------------------------------------------------------------------

def encode_delta(
    A_in_cam: jax.Array,
    B_in_cam: jax.Array,
    trans_normalizer: float,
    rot_normalizer: float,
) -> tuple[jax.Array, jax.Array]:
    """Encode the A->B relative pose into normalized network labels.

    Parity with reference datasets.py:141-150 (``processData`` label path):
      trans = (t_B - t_A) / tau
      rot   = log(colnorm(R_B R_A^T)) / rho
    Both land in [-1, 1] when the true motion is within the normalizers.
    Accepts (..., 4, 4) poses.
    """
    t_label = (B_in_cam[..., :3, 3] - A_in_cam[..., :3, 3]) / trans_normalizer
    rel = _mm(B_in_cam[..., :3, :3], jnp.swapaxes(A_in_cam[..., :3, :3], -1, -2))
    rel = normalize_rotation_matrix(rel)
    r_label = so3_log(rel) / rot_normalizer
    return t_label, r_label


def decode_delta(
    A_in_cam: jax.Array,
    trans_pred: jax.Array,
    rot_pred: jax.Array,
    trans_normalizer: float,
    rot_normalizer: float,
) -> jax.Array:
    """Decode network output back to an absolute pose B_in_cam.

    Parity with reference datasets.py:159-175 (``processPredict``):
      t_B = t_A + tau * trans ; R_B = exp(rho * rot) R_A
    """
    t_B = A_in_cam[..., :3, 3] + trans_pred * trans_normalizer
    R_rel = so3_exp(rot_pred * rot_normalizer)
    R_B = _mm(R_rel, A_in_cam[..., :3, :3])
    return make_pose(R_B, t_B)


def random_direction(key: jax.Array, shape=()) -> jax.Array:
    """Uniform direction on S^2 (reference Utils.py:394-404)."""
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, shape) * 2.0 * jnp.pi
    cos_phi = 2.0 * jax.random.uniform(k2, shape) - 1.0
    sin_phi = jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0))
    return jnp.stack(
        [sin_phi * jnp.cos(theta), sin_phi * jnp.sin(theta), cos_phi], axis=-1
    )


def random_gaussian_magnitude(
    key: jax.Array, max_trans: float, max_rot_deg: float, shape=()
) -> jax.Array:
    """Random se(3) perturbation pose (reference Utils.py:372-390).

    Direction uniform on the sphere; magnitude ~ |N(0, max)| truncated to
    [-max, max] (implemented via a truncated normal, the stationary
    distribution of the reference's rejection loop).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dir_t = random_direction(k1, shape)
    mag_t = jax.random.truncated_normal(k2, -1.0, 1.0, shape) * max_trans
    t = dir_t * mag_t[..., None]
    dir_r = random_direction(k3, shape)
    mag_r = jax.random.truncated_normal(k4, -1.0, 1.0, shape) * max_rot_deg
    w = dir_r * (mag_r[..., None] * jnp.pi / 180.0)
    return make_pose(so3_exp(w), t)
