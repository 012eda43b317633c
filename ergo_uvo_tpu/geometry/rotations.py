"""SO(3) rotations, Euler angles, quaternions — pure JAX, batch-friendly.

TPU-native re-design of the rotation/orientation helpers in the reference's
``uvo_libraries/src/math_utility.cpp`` (rotx/roty/rotz :343-368, Euler/quat
conversions :119-215, skew :94-111, isRotationMatrix :245-254,
check_rotation_matrix :9-17, wrap2pi :222-228).  All functions are pure, work
on the trailing dims and `vmap` cleanly over leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotx(angle: jax.Array) -> jax.Array:
    """Rotation about the x axis. (ref: math_utility.cpp:343-350)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def roty(angle: jax.Array) -> jax.Array:
    """Rotation about the y axis. (ref: math_utility.cpp:352-359)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rotz(angle: jax.Array) -> jax.Array:
    """Rotation about the z axis. (ref: math_utility.cpp:361-368)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def euler_to_rotation(rpy: jax.Array) -> jax.Array:
    """ZYX (roll-pitch-yaw) Euler angles -> rotation matrix.

    R = Rz(yaw) @ Ry(pitch) @ Rx(roll), matching the reference's
    ``from_euler_to_R`` (math_utility.cpp:119-131).
    """
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    return rotz(yaw) @ roty(pitch) @ rotx(roll)


def rotation_to_euler(R: jax.Array) -> jax.Array:
    """Rotation matrix -> ZYX Euler (roll, pitch, yaw), singularity-guarded.

    Mirrors the reference's ``from_R_to_euler`` gimbal-lock handling
    (math_utility.cpp:181-205): when cos(pitch) ~ 0 the roll is set to 0 and
    yaw absorbs the remaining rotation.
    """
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    roll = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    pitch = jnp.arctan2(-R[..., 2, 0], sy)
    yaw = jnp.where(
        singular, jnp.zeros_like(sy), jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    )
    return jnp.stack([roll, pitch, yaw], -1)


def euler_to_quaternion(rpy: jax.Array) -> jax.Array:
    """ZYX Euler -> quaternion (w, x, y, z). (ref: math_utility.cpp:207-215)."""
    half = rpy * 0.5
    cr, cp, cy = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sr, sp, sy = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([w, x, y, z], -1)


def quaternion_to_rotation(q: jax.Array) -> jax.Array:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )


def rotation_to_quaternion(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (w, x, y, z), branchless Shepperd-style.

    Computes all four candidate quaternions and selects the numerically best
    (largest pivot) with `where` — no data-dependent branching, TPU-friendly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four unnormalized candidates; with pivot t_i each equals 4*q_i*[w,x,y,z],
    # so plain normalization recovers the unit quaternion.  Each candidate is
    # numerically good when its pivot is the largest.
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    q1 = jnp.stack(
        [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1
    )
    q2 = jnp.stack(
        [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1
    )
    q3 = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1
    )
    pivots = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], -2)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def skew(v: jax.Array) -> jax.Array:
    """3-vector -> skew-symmetric matrix. (ref: math_utility.cpp:94-103)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def is_rotation_matrix(R: jax.Array, tol: float = 1e-6) -> jax.Array:
    """||R^T R - I|| < tol, mirroring math_utility.cpp:245-254."""
    should_be_identity = jnp.swapaxes(R, -1, -2) @ R
    eye = jnp.eye(3, dtype=R.dtype)
    err = jnp.linalg.norm(
        (should_be_identity - eye).reshape(*R.shape[:-2], 9), axis=-1
    )
    return err < tol


def project_to_so3(R: jax.Array) -> jax.Array:
    """Project an almost-rotation onto SO(3) via SVD: U @ Vt with det fix.

    The reference re-orthonormalizes with U*Vt (``check_rotation_matrix``
    math_utility.cpp:9-17); we additionally repair an improper (det<0) result.
    """
    u, _, vt = jnp.linalg.svd(R)
    d = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate(
        [jnp.ones_like(d)[..., None], jnp.ones_like(d)[..., None], d[..., None]],
        -1,
    )
    return (u * fix[..., None, :]) @ vt


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues exponential map so(3) -> SO(3), Taylor-guarded near 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """Logarithm map SO(3) -> so(3) (axis-angle vector), numerically guarded."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Antisymmetric part gives axis * sin(theta).
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-3
    scale = jnp.where(
        small,
        0.5 + theta**2 / 12.0,
        theta / jnp.maximum(2.0 * sin_theta, 1e-12),
    )
    w_generic = scale[..., None] * v
    # Near pi: use the diagonal-based formula (v ~ 0 there).
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis2 = jnp.maximum((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + 1e-12), 0.0)
    axis = jnp.sqrt(axis2)
    # Fix signs from the off-diagonal symmetric part.
    s0 = jnp.sign(jnp.where(jnp.abs(v[..., 0]) > 1e-9, v[..., 0], 1.0))
    sxy = R[..., 1, 0] + R[..., 0, 1]
    sxz = R[..., 2, 0] + R[..., 0, 2]
    axis = axis * jnp.stack(
        [s0, s0 * jnp.sign(jnp.where(jnp.abs(sxy) > 1e-9, sxy, 1.0)),
         s0 * jnp.sign(jnp.where(jnp.abs(sxz) > 1e-9, sxz, 1.0))],
        -1,
    )
    w_near_pi = theta[..., None] * axis
    return jnp.where(near_pi[..., None], w_near_pi, w_generic)


def rpy_rate_jacobian(rpy: jax.Array) -> jax.Array:
    """Jacobian mapping body angular velocity -> Euler (roll, pitch, yaw) rates.

    Mirrors the reference's ``compute_jacobian`` (math_utility.cpp:25-28):
    [[1, sin(r)tan(p), cos(r)tan(p)], [0, cos(r), -sin(r)],
    [0, sin(r)/cos(p), cos(r)/cos(p)]].  Singular at pitch = +-pi/2
    (gimbal lock), same as the reference.
    """
    r, p = rpy[..., 0], rpy[..., 1]
    sr, cr = jnp.sin(r), jnp.cos(r)
    tp, cp = jnp.tan(p), jnp.cos(p)
    zero = jnp.zeros_like(r)
    one = jnp.ones_like(r)
    rows = [
        jnp.stack([one, sr * tp, cr * tp], -1),
        jnp.stack([zero, cr, -sr], -1),
        jnp.stack([zero, sr / cp, cr / cp], -1),
    ]
    return jnp.stack(rows, -2)


def wrap2pi(angle: jax.Array) -> jax.Array:
    """Wrap angle into [-pi, pi], keeping both endpoints as fixed points.

    Branchless closed form of the reference's subtract/add-2pi while loops
    (math_utility.cpp:222-228): 3pi -> pi and -3pi -> -pi.
    """
    two_pi = 2.0 * jnp.pi
    over = angle - two_pi * jnp.ceil((angle - jnp.pi) / two_pi)
    under = angle + two_pi * jnp.ceil((-angle - jnp.pi) / two_pi)
    return jnp.where(angle > jnp.pi, over, jnp.where(angle < -jnp.pi, under, angle))
