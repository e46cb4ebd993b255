"""Batch-last quaternion / SO(3) operations.

All functions operate on arrays whose LAST axis is the environment batch
axis ``N`` (structure-of-arrays layout): quaternions are ``(4, N)`` in
``xyzw`` order (matching the reference's Isaac Gym convention,
cf. /root/reference/legged_gym/envs/base/legged_robot.py:122 where
``root_states[:, 3:7]`` is xyzw), vectors are ``(3, N)``.

Rationale: on TPU the last axis maps to the 128-wide vector lanes. With N
trailing, every op below is an elementwise multiply-add over fully-occupied
lanes; a batch-first ``(N, 4)`` layout would leave 124/128 lanes idle.

Every function is also shape-polymorphic in the batch axis: ``N`` may be
any trailing shape (e.g. scalars for single-robot unit tests).
"""
import jax.numpy as jnp


def normalize(q):
    """Normalize along axis 0."""
    return q / jnp.linalg.norm(q, axis=0, keepdims=True).clip(1e-9)


def mul(a, b):
    """Hamilton product a*b for xyzw quaternions shaped (4, ...)."""
    ax, ay, az, aw = a[0], a[1], a[2], a[3]
    bx, by, bz, bw = b[0], b[1], b[2], b[3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def conj(q):
    return jnp.stack([-q[0], -q[1], -q[2], q[3]])


def rotate(q, v):
    """Rotate vector(s) v (3, ...) by quaternion(s) q (4, ...): R(q) @ v.

    Matches isaacgym.torch_utils.quat_apply / quat_rotate semantics.
    """
    qv = q[:3]
    qw = q[3]
    t = 2.0 * _cross(qv, v)
    return v + qw * t + _cross(qv, t)


def rotate_inverse(q, v):
    """R(q)^T @ v — matches isaacgym quat_rotate_inverse."""
    return rotate(conj(q), v)


def _cross(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


cross = _cross


def to_matrix(q):
    """Rotation matrix (3, 3, ...) from xyzw quaternion (4, ...)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1 - 2 * (yy + zz)
    r01 = 2 * (xy - wz)
    r02 = 2 * (xz + wy)
    r10 = 2 * (xy + wz)
    r11 = 1 - 2 * (xx + zz)
    r12 = 2 * (yz - wx)
    r20 = 2 * (xz - wy)
    r21 = 2 * (yz + wx)
    r22 = 1 - 2 * (xx + yy)
    return jnp.stack([
        jnp.stack([r00, r01, r02]),
        jnp.stack([r10, r11, r12]),
        jnp.stack([r20, r21, r22]),
    ])


def from_axis_angle(axis, angle):
    """Quaternion (4, ...) from unit axis (3,) or (3, ...) and angle (...)."""
    axis = jnp.asarray(axis, dtype=jnp.result_type(angle, jnp.float32))
    half = 0.5 * angle
    s = jnp.sin(half)
    xyz = axis * s if axis.ndim == jnp.ndim(s) + 1 else axis[:, None] * s
    # broadcast axis (3,) against angle (...)
    if axis.ndim == 1 and jnp.ndim(angle) > 0:
        xyz = axis.reshape((3,) + (1,) * jnp.ndim(angle)) * s
    elif axis.ndim == 1:
        xyz = axis * s
    return jnp.concatenate([jnp.broadcast_to(xyz, (3,) + jnp.shape(s)),
                            jnp.cos(half)[None]], axis=0)


def integrate(q, omega_body, dt):
    """Integrate orientation by body-frame angular velocity over dt.

    q' = q ⊗ exp(dt/2 * omega_body); first-order (consistent with
    semi-implicit Euler at 5 ms) with renormalization.
    """
    half_dt = 0.5 * dt
    dq = jnp.concatenate([omega_body * half_dt,
                          jnp.ones_like(q[3:4])], axis=0)
    return normalize(mul(q, dq))


def yaw_rotate(q, v):
    """Rotate v by only the yaw component of q.

    Reference semantics: legged_gym/utils/math.py:38-42 zeroes the x, y
    quaternion components and renormalizes before applying.
    """
    q_yaw = jnp.stack([jnp.zeros_like(q[0]), jnp.zeros_like(q[1]), q[2], q[3]])
    return rotate(normalize(q_yaw), v)


def yaw(q):
    """Extract yaw angle from xyzw quaternion."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def wrap_to_pi(angles):
    """Wrap angles to (-pi, pi]. Matches legged_gym/utils/math.py:45-48."""
    a = jnp.mod(angles, 2 * jnp.pi)
    return a - 2 * jnp.pi * (a > jnp.pi)
