"""SE(3) / quaternion math on JAX arrays.

The reference represents poses as ``Eigen::Isometry3d`` plus a
``(quaternion, translation)`` parameter block optimised by Ceres with
``EigenQuaternionParameterization`` (laser_odometry.cc:186-227).  Here a pose
is a pair ``(q, t)`` with ``q`` a unit quaternion stored **wxyz** and ``t`` a
3-vector, plus tangent-space (so(3)/se(3)) helpers for the Gauss-Newton /
Levenberg-Marquardt retraction.

Everything is shape-polymorphic over leading batch dimensions and jit/vmap
friendly; float64 works on CPU for golden tests, float32 on TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Pose(NamedTuple):
    """Rigid transform: ``x_world = R(q) @ x_local + t``. q is wxyz."""

    q: jax.Array  # (..., 4) unit quaternion, wxyz
    t: jax.Array  # (..., 3)

    @staticmethod
    def identity(dtype=jnp.float32, batch: Tuple[int, ...] = ()) -> "Pose":
        q = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype), batch + (4,))
        t = jnp.zeros(batch + (3,), dtype=dtype)
        return Pose(q, t)

    def matrix(self) -> jax.Array:
        """(..., 4, 4) homogeneous matrix."""
        R = quat_to_matrix(self.q)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
            top.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bottom], axis=-2)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, wxyz storage."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Uses the 2-cross-product form (cheaper than building R)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> wxyz quaternion. Branch-free Shepperd
    (selects the numerically best of four candidate constructions)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q_i^2 - 1 values
    qw2 = tr
    qx2 = m00 - m11 - m22
    qy2 = m11 - m00 - m22
    qz2 = m22 - m00 - m11

    def build_w():
        s = jnp.sqrt(jnp.maximum(1.0 + qw2, 1e-12)) * 2.0
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s,
                          (m10 - m01) / s], axis=-1)

    def build_x():
        s = jnp.sqrt(jnp.maximum(1.0 + qx2, 1e-12)) * 2.0
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s,
                          (m02 + m20) / s], axis=-1)

    def build_y():
        s = jnp.sqrt(jnp.maximum(1.0 + qy2, 1e-12)) * 2.0
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s,
                          (m12 + m21) / s], axis=-1)

    def build_z():
        s = jnp.sqrt(jnp.maximum(1.0 + qz2, 1e-12)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s,
                          0.25 * s], axis=-1)

    cands = jnp.stack([build_w(), build_x(), build_y(), build_z()], axis=-2)
    scores = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1),
                            axis=-2)[..., 0, :]
    return quat_normalize(q)


def so3_exp_quat(phi: jax.Array) -> jax.Array:
    """axis-angle 3-vector -> wxyz quaternion.

    Taylor-safe AND autodiff-safe at phi = 0: the sqrt argument is guarded
    with the safe-where pattern so jacfwd/jacrev at the origin (the LM
    retraction linearisation point) never sees a d(sqrt)(0) = inf."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-12
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    half = 0.5 * theta
    sinc_half = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    xyz = sinc_half * phi
    return jnp.concatenate([w, xyz], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """wxyz quaternion -> axis-angle 3-vector (magnitude in [0, pi])."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # take the short arc
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn[..., 0], w)
    small = vn[..., 0] < 1e-8
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12),
                      theta / jnp.maximum(vn[..., 0], 1e-12))
    return scale[..., None] * v


def compose(a: Pose, b: Pose) -> Pose:
    """a then b applied innermost: x -> a(b(x)) (matrix product A @ B)."""
    return Pose(quat_normalize(quat_mul(a.q, b.q)),
                quat_rotate(a.q, b.t) + a.t)


def inverse(p: Pose) -> Pose:
    qi = quat_conj(p.q)
    return Pose(qi, -quat_rotate(qi, p.t))


def transform(p: Pose, pts: jax.Array) -> jax.Array:
    """Apply pose to points (..., 3)."""
    return quat_rotate(p.q[..., None, :] if pts.ndim > p.q.ndim else p.q,
                       pts) + (p.t[..., None, :] if pts.ndim > p.t.ndim
                               else p.t)


def retract(p: Pose, delta: jax.Array) -> Pose:
    """Apply a 6-dim tangent update ``delta = (dtheta, dt)``.

    Rotation update is a left-multiplied exponential,
    ``q_new = exp(dtheta) * q`` — matching the effect of Ceres'
    quaternion-local parameterisation used by the reference solver
    (laser_odometry.cc:202); translation is additive."""
    dq = so3_exp_quat(delta[..., :3])
    return Pose(quat_normalize(quat_mul(dq, p.q)), p.t + delta[..., 3:])


def rpy_from_quat(q: jax.Array) -> jax.Array:
    """Roll-pitch-yaw (XYZ extrinsic / ZYX intrinsic) from wxyz quaternion.

    Matches tf::Matrix3x3::getRPY used by the reference for the IMU override
    (laser_odometry.cc:157-168) and the twist publisher
    (laser_odometry.cc:422-425)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_from_rpy(rpy: jax.Array) -> jax.Array:
    """Inverse of :func:`rpy_from_quat` (tf::Matrix3x3::setRPY)."""
    half = 0.5 * rpy
    cr, cp, cy = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sr, sp, sy = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def kitti_row(p: Pose) -> jax.Array:
    """Flattened 3x4 row-major pose row, the KITTI poses.txt format the
    reference dumps for external ATE/RPE scoring (stats.cc:75-95)."""
    return p.matrix()[..., :3, :].reshape(p.q.shape[:-1] + (12,))
