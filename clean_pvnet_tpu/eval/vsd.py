"""Visible Surface Discrepancy (VSD), on-device.

Behavioral counterpart of reference lib/utils/vsd/vsd_utils.py:5-48 with the
visibility estimation of lib/utils/vsd/visibility.py:6-29 and the
depth→distance conversion of lib/utils/vsd/misc.py:42-60 — computed with the
jittable rasterizer (ops/rasterize.render_depth_jax) instead of OpenGL, so
the whole metric (two renders + masks + cost) runs as one fixed-shape XLA
program and vmaps over instances.

T-LESS evaluation uses cost_type='step' with tau=20mm, delta=15mm and
threshold err < 0.3 (ref lib/evaluators/tless_test/pvnet.py:66-105,
lib/utils/tless/tless_config.py:25-29).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from clean_pvnet_tpu.ops.rasterize import render_depth_jax


def depth_to_dist(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Z-depth image → euclidean distance image (ref misc.py:42-60)."""
    h, w = depth.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    X = (xs - K[0, 2]) * depth / K[0, 0]
    Y = (ys - K[1, 2]) * depth / K[1, 1]
    return jnp.sqrt(X * X + Y * Y + depth * depth)


def estimate_visib_mask(d_test: jax.Array, d_model: jax.Array, delta: float):
    """(ref visibility.py:6-20)"""
    valid = (d_test > 0) & (d_model > 0)
    return ((d_model - d_test) <= delta) & valid


@partial(jax.jit, static_argnames=("cost_type",))
def vsd_error(
    dist_est: jax.Array,
    dist_gt: jax.Array,
    dist_test: jax.Array,
    delta: float,
    tau: float,
    cost_type: str = "step",
) -> jax.Array:
    """Core VSD from distance images (ref vsd_utils.py:5-48)."""
    visib_gt = estimate_visib_mask(dist_test, dist_gt, delta)
    visib_est = estimate_visib_mask(dist_test, dist_est, delta)
    visib_est = visib_est | (visib_gt & (dist_est > 0))

    inter = visib_gt & visib_est
    union = visib_gt | visib_est

    diff = jnp.abs(dist_gt - dist_est)
    if cost_type == "step":
        costs = (diff >= tau).astype(jnp.float32)
    else:  # tlinear
        costs = jnp.clip(diff / tau, 0.0, 1.0)
    costs = jnp.where(inter, costs, 0.0)

    union_count = jnp.sum(union)
    comp_count = union_count - jnp.sum(inter)
    err = (jnp.sum(costs) + comp_count) / jnp.maximum(union_count, 1)
    return jnp.where(union_count > 0, err, 1.0)


@partial(jax.jit, static_argnames=("hw", "face_chunk"))
def cou_pose_error(
    pose_est: jax.Array,
    pose_gt: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    K: jax.Array,
    hw: tuple[int, int],
    face_chunk: int = 256,
) -> jax.Array:
    """Complement-over-Union pose error (ref pysixd/pose_error.py:86-118):
    1 − IoU of the silhouettes rendered under the estimated and GT poses.
    Both renders + the mask IoU run in one fixed-shape XLA program."""
    mask_est = render_depth_jax(verts, faces, K, pose_est, hw, face_chunk) > 0
    mask_gt = render_depth_jax(verts, faces, K, pose_gt, hw, face_chunk) > 0
    inter = jnp.sum(mask_est & mask_gt)
    union = jnp.sum(mask_est | mask_gt)
    return jnp.where(union > 0, 1.0 - inter / jnp.maximum(union, 1), 1.0)


@partial(jax.jit, static_argnames=("hw", "cost_type", "face_chunk"))
def vsd_pose_error(
    pose_est: jax.Array,
    pose_gt: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    depth_test: jax.Array,
    K: jax.Array,
    hw: tuple[int, int],
    delta: float = 15.0,
    tau: float = 20.0,
    cost_type: str = "step",
    face_chunk: int = 256,
) -> jax.Array:
    """Full VSD of an estimated pose: renders both depth maps on-device.

    Units follow the caller (T-LESS works in mm: verts/poses/depth in mm,
    delta/tau in mm, matching ref tless_config.py:25-29)."""
    d_est = render_depth_jax(verts, faces, K, pose_est, hw, face_chunk)
    d_gt = render_depth_jax(verts, faces, K, pose_gt, hw, face_chunk)
    return vsd_error(
        depth_to_dist(d_est, K),
        depth_to_dist(d_gt, K),
        depth_to_dist(depth_test, K),
        delta,
        tau,
        cost_type,
    )
