"""SE(3) rigid transforms as a JAX pytree, with exp/log maps.

The reference carries (R, t) pairs as loose ``cv::Mat`` variables
(``visual_odometry.h:209-215``, ``transform_coordinates``
math_utility.cpp:376-379).  Here rigid transforms are a first-class immutable
pytree so they flow through `jit` / `scan` / `vmap` and can be optimized on
manifolds (BA, pose graph).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.geometry.rotations import skew, so3_exp, so3_log


class SE3(NamedTuple):
    """Rigid transform: x_out = R @ x + t.  Batchable on leading dims."""

    R: jax.Array  # (..., 3, 3)
    t: jax.Array  # (..., 3)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return SE3(R, t)

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other: apply `other` first, then `self`."""
        return SE3(self.R @ other.R, (self.R @ other.t[..., None])[..., 0] + self.t)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -(Rt @ self.t[..., None])[..., 0])

    def apply(self, points: jax.Array) -> jax.Array:
        """Transform points of shape (..., N, 3) or (..., 3)."""
        if points.shape[-1] != 3:
            raise ValueError(f"points must have trailing dim 3, got {points.shape}")
        if points.ndim >= 2 and self.R.ndim == points.ndim + 1:
            # Batched points (..., N, 3) with transform (..., 3, 3).
            return points @ jnp.swapaxes(self.R, -1, -2) + self.t[..., None, :]
        return (self.R @ points[..., None])[..., 0] + self.t

    def matrix(self) -> jax.Array:
        """(..., 4, 4) homogeneous matrix."""
        batch = self.R.shape[:-2]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.R.dtype), (*batch, 1, 4)
        )
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)


def se3_exp(xi: jax.Array) -> SE3:
    """Exponential map se(3) -> SE(3); xi = (rho, w) with w the rotation part.

    Convention: xi[..., :3] = translation generator rho, xi[..., 3:] = w.
    """
    rho, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    R = so3_exp(w)
    K = skew(w)
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + a[..., None, None] * K + b[..., None, None] * (K @ K)
    return SE3(R, (V @ rho[..., None])[..., 0])


def se3_log(T: SE3) -> jax.Array:
    """Logarithm map SE(3) -> se(3) = (rho, w)."""
    w = so3_log(T.R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    K = skew(w)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) K^2
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.sin(half_theta))
        / jnp.maximum(theta2, 1e-24),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    Vinv = eye - 0.5 * K + cot_term[..., None, None] * (K @ K)
    rho = (Vinv @ T.t[..., None])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)
