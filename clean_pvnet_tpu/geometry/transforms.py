"""Pure-function 3D/2D pose math, jit/vmap friendly.

Behavioral counterpart of reference lib/utils/pvnet/pvnet_pose_utils.py
(project :42-51, cm_degree_5 :54-61) re-designed as batched JAX primitives:
everything works on leading batch dims via vmap and compiles under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_points(xyz: jax.Array, rt: jax.Array) -> jax.Array:
    """Apply rigid transform. xyz [..., N, 3], rt [..., 3, 4] -> [..., N, 3]."""
    return xyz @ jnp.swapaxes(rt[..., :3, :3], -1, -2) + rt[..., None, :3, 3]


def project(xyz: jax.Array, K: jax.Array, rt: jax.Array) -> jax.Array:
    """Project 3D points to pixels. (ref pvnet_pose_utils.py:42-51)

    xyz [..., N, 3], K [..., 3, 3], rt [..., 3, 4] -> [..., N, 2]
    """
    cam = transform_points(xyz, rt) @ jnp.swapaxes(K, -1, -2)
    return cam[..., :2] / cam[..., 2:3]


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of w [..., 3] -> [..., 3, 3]."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        -2,
    )


def angle_axis_to_matrix(aa: jax.Array) -> jax.Array:
    """Rodrigues formula, [..., 3] -> [..., 3, 3]; stable near theta=0."""
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + 1e-32)
    small = theta2 < 1e-12
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = hat(aa)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    return eye + a * K + b * (K @ K)


def matrix_to_angle_axis(R: jax.Array) -> jax.Array:
    """Log map SO(3) -> R^3, [..., 3, 3] -> [..., 3]."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    sin_t = jnp.sin(theta)
    # generic case
    scale = jnp.where(sin_t > 1e-6, theta / (2.0 * sin_t + 1e-32), 0.5)
    aa = w * scale[..., None]
    # near pi: w -> 0, use diagonal to recover axis
    near_pi = theta[..., None] > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + 1e-32), 0, None)
    axis = jnp.sqrt(axis2)
    # fix signs from off-diagonals
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0)
    axis = axis * jnp.stack([sx, sy, sz], -1)
    aa_pi = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-32) * theta[..., None]
    return jnp.where(near_pi, aa_pi, aa)


def rotation_geodesic_deg(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Angular distance in degrees, with the trace clamp the reference applies
    (ref pvnet_pose_utils.py:54-61 incl. issue #250 clamp)."""
    diff = R1 @ jnp.swapaxes(R2, -1, -2)
    trace = diff[..., 0, 0] + diff[..., 1, 1] + diff[..., 2, 2]
    trace = jnp.clip(trace, -1.0, 3.0)
    return jnp.degrees(jnp.arccos((trace - 1.0) / 2.0))
