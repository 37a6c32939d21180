"""SE(3) / quaternion utilities.

TPU-native replacement for the Eigen quaternion algebra in
src/lidarOdometry.cpp:64-90, the tf RPY conversions in
src/mapOptmization.cpp:106-124, and pyquaternion in
scripts/PointCloudOdometry.py:97-99.

Conventions:
- quaternions are ``[x, y, z, w]`` (Eigen/pyquaternion storage order used by
  the reference's ``[t(3), q(4)]`` odometry messages,
  scripts/PointCloudOdometry.py:101).
- a pose is a ``(q, t)`` tuple; ``pose_apply((q,t), p) = R(q) p + t``.
- RPY follows the ZYX (yaw-pitch-roll) convention of tf / GTSAM RzRyRx
  (src/mapOptmization.cpp:149).

Everything is shape-polymorphic over leading batch dims and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def quat_identity(dtype=jnp.float32) -> Array:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q: Array, eps: float = 1e-12) -> Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, eps)
    # canonicalize sign (w >= 0) so compositions stay numerically stable
    return q * jnp.sign(jnp.where(q[..., 3:4] == 0, 1.0, q[..., 3:4]))


def quat_multiply(q1: Array, q2: Array) -> Array:
    """Hamilton product; rotation composition R(q1 * q2) = R(q1) R(q2)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conjugate(q: Array) -> Array:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vectors v [..., 3] by quaternion q [..., 4] (broadcasting)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: Array) -> Array:
    """[..., 4] -> [..., 3, 3] rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: Array) -> Array:
    """[..., 3, 3] -> [..., 4] (x,y,z,w). Branch-free Shepperd's method."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate solutions, each numerically good in its own regime
    qw_w = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2
    q_w = jnp.stack(
        [(m21 - m12) / (4 * qw_w), (m02 - m20) / (4 * qw_w),
         (m10 - m01) / (4 * qw_w), qw_w], axis=-1)

    qx_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2
    q_x = jnp.stack(
        [qx_x, (m01 + m10) / (4 * qx_x), (m02 + m20) / (4 * qx_x),
         (m21 - m12) / (4 * qx_x)], axis=-1)

    qy_y = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2
    q_y = jnp.stack(
        [(m01 + m10) / (4 * qy_y), qy_y, (m12 + m21) / (4 * qy_y),
         (m02 - m20) / (4 * qy_y)], axis=-1)

    qz_z = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2
    q_z = jnp.stack(
        [(m02 + m20) / (4 * qz_z), (m12 + m21) / (4 * qz_z), qz_z,
         (m10 - m01) / (4 * qz_z)], axis=-1)

    # pick the branch with the largest pivot
    cond_w = tr > 0
    cond_x = (m00 > m11) & (m00 > m22)
    cond_y = m11 > m22
    q = jnp.where(
        cond_w[..., None], q_w,
        jnp.where(cond_x[..., None], q_x, jnp.where(cond_y[..., None], q_y, q_z)),
    )
    return quat_normalize(q)


def quat_from_rpy(roll: Array, pitch: Array, yaw: Array) -> Array:
    """ZYX euler (tf::createQuaternionFromRPY) -> quaternion [x,y,z,w]."""
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_rpy(q: Array) -> tuple[Array, Array, Array]:
    """Quaternion -> (roll, pitch, yaw), ZYX convention."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def so3_exp_quat(w: Array) -> Array:
    """so(3) vector [..., 3] -> unit quaternion via the exponential map.

    Small-angle-safe; used by the Gauss-Newton odometry update
    (the TPU-side equivalent of Ceres' EigenQuaternionParameterization plus-op,
    src/lidarOdometry_onlyPC.cpp:150).
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    half = 0.5 * theta
    # sin(x/2)/x with series fallback for tiny angles
    k = jnp.where(theta2 > 1e-12, jnp.sin(half) / theta, 0.5 - theta2 / 48.0)
    xyz = w * k
    qw = jnp.where(theta2[..., 0] > 1e-12, jnp.cos(half[..., 0]),
                   1.0 - theta2[..., 0] / 8.0)
    return jnp.concatenate([xyz, qw[..., None]], axis=-1)


def so3_log_quat(q: Array) -> Array:
    """Unit quaternion -> so(3) vector (inverse of so3_exp_quat).

    Small-angle-safe; sign-canonicalized so the geodesic is the short way.
    """
    q = q * jnp.sign(jnp.where(q[..., 3:4] == 0, 1.0, q[..., 3:4]))
    xyz = q[..., :3]
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    s = jnp.linalg.norm(xyz, axis=-1)
    half = jnp.arctan2(s, w)
    # w = 2*half / sin(half) with series fallback
    k = jnp.where(s > 1e-8, 2.0 * half / jnp.maximum(s, 1e-24), 2.0 / jnp.maximum(w, 1e-8))
    return xyz * k[..., None]


# ----------------------------------------------------------------------------
# Pose = (q [...,4], t [...,3])
# ----------------------------------------------------------------------------

def pose_identity(dtype=jnp.float32):
    return quat_identity(dtype), jnp.zeros(3, dtype=dtype)


def pose_compose(pose_ab, pose_bc):
    """T_ac = T_ab * T_bc (matches q_0_curr = q_0_last * q_last_curr;
    t_0_curr = t_0_last + q_0_last * t_last_curr, src/lidarOdometry.cpp:87-88)."""
    q_ab, t_ab = pose_ab
    q_bc, t_bc = pose_bc
    return quat_multiply(q_ab, q_bc), t_ab + quat_rotate(q_ab, t_bc)


def pose_inverse(pose):
    q, t = pose
    qi = quat_conjugate(q)
    return qi, -quat_rotate(qi, t)


def pose_apply(pose, p: Array) -> Array:
    q, t = pose
    return quat_rotate(q, p) + t


def pose_between(pose_a, pose_b):
    """T_a^-1 * T_b — relative pose (gtsam Pose3::between,
    src/mapOptmization.cpp:162)."""
    return pose_compose(pose_inverse(pose_a), pose_b)


def pose_from_rt(r_mat: Array, t: Array):
    return matrix_to_quat(r_mat), t


def pose_to_mat4(pose) -> Array:
    q, t = pose
    m = jnp.zeros(q.shape[:-1] + (4, 4), dtype=q.dtype)
    m = m.at[..., :3, :3].set(quat_to_matrix(q))
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m
