"""Pinhole camera model with radial-tangential distortion (4-coeff).

TPU-native equivalent of the reference's camera handling:
  * intrinsics K built from fx, fy, ccx, ccy (visual_odometry.h:187-188),
  * 4-coefficient distortion (k1, k2, p1, p2) as loaded by
    ``get_mono_camera_parameters`` (VO_utility.cpp:387-400),
  * K rescaling on image resize (``resize_camera_matrix``
    VO_utility.cpp:658-675),
  * projection matrix P = K [R|t] (``compute_projection_matrix``
    VO_utility.cpp:9-15),
  * projection + distortion used by ``reproject_errors`` (VO_utility.cpp:632-651
    — note the reference projects with *zero* distortion there, since it works
    on already-undistorted images).

Undistortion of full images is in ``ergo_uvo_tpu.image``; this module holds the
point-wise model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Intrinsics + distortion as a flat pytree (all entries scalar arrays)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
        return PinholeCamera(
            *(jnp.asarray(v, dtype=dtype) for v in (fx, fy, cx, cy, k1, k2, p1, p2))
        )

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )

    def with_zero_distortion(self) -> "PinholeCamera":
        z = jnp.zeros_like(self.fx)
        return PinholeCamera(self.fx, self.fy, self.cx, self.cy, z, z, z, z)


def distort_normalized(cam: PinholeCamera, xy: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords (..., 2).

    x' = x(1 + k1 r² + k2 r⁴) + 2 p1 x y + p2 (r² + 2x²)   (OpenCV model,
    the one implied by the reference's use of ``cv::undistort`` with
    (k1, k2, p1, p2) — VO_utility.cpp:360-366).
    """
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], -1)


def undistort_normalized(
    cam: PinholeCamera, xy_dist: jax.Array, iters: int = 8
) -> jax.Array:
    """Invert the distortion by fixed-point iteration (OpenCV-style).

    A fixed `iters`-step loop — compile-friendly (no data-dependent
    termination), matching cv::undistortPoints' default iteration scheme.
    """

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        xn = (xy_dist[..., 0] - dx) / radial
        yn = (xy_dist[..., 1] - dy) / radial
        return jnp.stack([xn, yn], -1)

    return jax.lax.fori_loop(0, iters, body, xy_dist)


def pixel_to_normalized(cam: PinholeCamera, uv: jax.Array) -> jax.Array:
    """Pixel coords (..., 2) -> normalized image plane (no undistortion)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], -1)


def normalized_to_pixel(cam: PinholeCamera, xy: jax.Array) -> jax.Array:
    u = xy[..., 0] * cam.fx + cam.cx
    v = xy[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], -1)


def project_points(
    cam: PinholeCamera,
    points_cam: jax.Array,
    eps: float = 1e-9,
    with_distortion: bool = False,
) -> jax.Array:
    """Project camera-frame 3D points (..., 3) to pixels (..., 2).

    `with_distortion=False` matches the reference's ``reproject_errors``
    (VO_utility.cpp:640: zero distCoeffs), used on undistorted images.
    """
    z = points_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    xy = points_cam[..., :2] / safe_z[..., None]
    if with_distortion:
        xy = distort_normalized(cam, xy)
    return normalized_to_pixel(cam, xy)


def projection_matrix(K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """P = K [R | t], shape (..., 3, 4). (ref: VO_utility.cpp:9-15)."""
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)
    return K @ Rt


def resize_camera_matrix(K: jax.Array, orig_width, desired_width) -> jax.Array:
    """Scale K for a width-`desired_width` resize, exactly as the reference.

    ``resize_camera_matrix`` (VO_utility.cpp:658-671) divides the whole K by
    the single width ratio (aspect assumed preserved; target height is
    ``int(orig_height/ratio)``), then restores the skew entry and K[2,2]=1.
    The follow-on ``getOptimalNewCameraMatrix(alpha=0)`` is
    ``ergo_uvo_tpu.image.undistort.optimal_new_camera`` (host-side, init-time).
    """
    ratio = orig_width / desired_width
    K2 = K / ratio
    K2 = K2.at[..., 0, 1].set(K[..., 0, 1])
    return K2.at[..., 2, 2].set(1.0)


def resized_height(orig_width: int, orig_height: int, desired_width: int) -> int:
    """Target height for a width-preserving resize (truncating, as the ref)."""
    return int(orig_height / (orig_width / desired_width))
