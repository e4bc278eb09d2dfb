"""Pose metrics, batched and jittable.

Behavioral counterparts of reference lib/evaluators/linemod/pvnet.py:
  projection_2d (:59-66)   mean reprojection distance of the model cloud
  add_metric    (:68-82)   ADD, and ADD-S via nearest-neighbor matching for
                           symmetric objects (CUDA NN ext → ops/nn_query)
  cm_degree_5   (:84-94)   translation (cm) and geodesic rotation (deg)
  mask_iou      (:96-100)
All operate on [3,4] poses and vmap over leading batch dims.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from clean_pvnet_tpu.geometry.transforms import (
    project,
    rotation_geodesic_deg,
    transform_points,
)
from clean_pvnet_tpu.ops.nn_query import nearest_neighbor_dists


@jax.jit
def projection_2d_error(model_pts, pose_pred, pose_gt, K):
    """Mean 2D distance between model clouds projected under the two poses."""
    p1 = project(model_pts, K, pose_pred)
    p2 = project(model_pts, K, pose_gt)
    return jnp.mean(jnp.linalg.norm(p1 - p2, axis=-1))


@jax.jit
def add_error(model_pts, pose_pred, pose_gt):
    """Average point-to-point distance under the two poses."""
    m1 = transform_points(model_pts, pose_pred)
    m2 = transform_points(model_pts, pose_gt)
    return jnp.mean(jnp.linalg.norm(m1 - m2, axis=-1))


@partial(jax.jit, static_argnames=("chunk",))
def adds_error(model_pts, pose_pred, pose_gt, chunk: int = 2048):
    """Symmetric ADD-S: mean NN distance from gt cloud into pred cloud.

    Matches the reference orientation: for each *target* point, distance to
    its nearest *predicted* point (ref pvnet.py:74-75 indexes pred by NN of
    target)."""
    m1 = transform_points(model_pts, pose_pred)
    m2 = transform_points(model_pts, pose_gt)
    return jnp.mean(nearest_neighbor_dists(m2, m1, chunk=chunk))


@jax.jit
def cm_degree(pose_pred, pose_gt):
    """Returns (translation_cm, rotation_deg) (ref pvnet.py:84-94)."""
    trans_cm = jnp.linalg.norm(pose_pred[..., 3] - pose_gt[..., 3], axis=-1) * 100.0
    rot_deg = rotation_geodesic_deg(pose_pred[..., :3], pose_gt[..., :3])
    return trans_cm, rot_deg


@jax.jit
def mask_iou(mask_pred, mask_gt):
    p = mask_pred > 0
    g = mask_gt > 0
    inter = jnp.sum(p & g, axis=(-2, -1))
    union = jnp.sum(p | g, axis=(-2, -1))
    return inter / jnp.maximum(union, 1)


def mesh_diameter(pts) -> float:
    """Exact model diameter (max pairwise distance), hull-accelerated.

    The diameter's endpoints lie on the convex hull, so the O(N²) pairwise
    max only runs over hull vertices — exact for real meshes (T-LESS models
    are 10-30k points) where a subsample would understate the ADD(-S)
    threshold (ref lib/utils/linemod/linemod_config.py diameters are exact).
    """
    import numpy as np

    pts = np.asarray(pts, np.float64)
    if len(pts) > 64:
        try:
            from scipy.spatial import ConvexHull

            pts = pts[ConvexHull(pts).vertices]
        except Exception:
            pass  # degenerate/coplanar cloud: fall through to full pairwise
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.max()))
