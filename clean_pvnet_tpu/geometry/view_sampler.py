"""Viewpoint sampling on a sphere (batched, numpy).

Behavioral counterpart of reference lib/utils/pysixd/view_sampler.py
(fibonacci_sampling :11-59, hinter_sampling :61-163, sample_views :165-230):
near-equidistant camera positions on a view sphere converted to
object-to-camera poses that look at the origin. Used by template/synthetic
renderers (ref lib/utils/meshrenderer/scenerenderer.py:71) to cover the pose
space evenly.

TPU-first differences: fully vectorized (no per-point Python loops for the
pose math), poses returned as one [N, 3, 4] array ready to feed the batched
rasterizer / vmapped renderers, and the icosahedron refinement dedupes edges
with numpy `unique` instead of a dict loop.
"""

from __future__ import annotations

import math

import numpy as np

# Icosahedron (the same canonical 12-vertex / 20-face solid the reference
# refines, ref view_sampler.py:73-80).
_PHI = (1.0 + math.sqrt(5.0)) / 2.0
_ICO_VERTS = np.array(
    [(-1, _PHI, 0), (1, _PHI, 0), (-1, -_PHI, 0), (1, -_PHI, 0),
     (0, -1, _PHI), (0, 1, _PHI), (0, -1, -_PHI), (0, 1, -_PHI),
     (_PHI, 0, -1), (_PHI, 0, 1), (-_PHI, 0, -1), (-_PHI, 0, 1)],
    np.float64,
)
_ICO_FACES = np.array(
    [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11), (1, 5, 9),
     (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8), (3, 9, 4), (3, 4, 2),
     (3, 2, 6), (3, 6, 8), (3, 8, 9), (4, 9, 5), (2, 4, 11), (6, 2, 10),
     (8, 6, 7), (9, 8, 1)],
    np.int64,
)


def fibonacci_sampling(n_pts: int, radius: float = 1.0) -> np.ndarray:
    """[n_pts, 3] near-equidistant sphere points from the Fibonacci lattice
    (ref view_sampler.py:11-59). `n_pts` must be odd."""
    if n_pts % 2 != 1:
        raise ValueError("fibonacci_sampling needs an odd n_pts")
    half = n_pts // 2
    i = np.arange(-half, half + 1, dtype=np.float64)
    ga = 2.0 * math.pi * (_PHI - 1.0)  # complementary golden angle
    lat = np.arcsin(2.0 * i / (2 * half + 1))
    lon = (ga * i) % (2.0 * math.pi)
    s = np.cos(lat) * radius
    return np.stack([np.cos(lon) * s, np.sin(lon) * s, np.tan(lat) * s], -1)


def hinter_sampling(
    min_n_pts: int, radius: float = 1.0
) -> tuple[np.ndarray, np.ndarray]:
    """Icosahedron-refinement sphere sampling (Hinterstoisser et al. BMVC'08;
    ref view_sampler.py:61-163).

    Returns ([N, 3] points, [N] refinement level per point), N >= min_n_pts,
    ordered from the top point by (level, azimuth) so any prefix is itself a
    roughly uniform covering — the property the reference's ordering pass
    provides.
    """
    pts = _ICO_VERTS.copy()
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    faces = _ICO_FACES.copy()
    level = np.zeros(len(pts), np.int64)

    ref_level = 0
    while len(pts) < min_n_pts:
        ref_level += 1
        # every face contributes its 3 edges; dedupe with unique rows
        edges = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], 0
        )
        edges = np.sort(edges, axis=1)
        uniq, inv = np.unique(edges, axis=0, return_inverse=True)
        mid = pts[uniq[:, 0]] + pts[uniq[:, 1]]
        mid /= np.linalg.norm(mid, axis=1, keepdims=True)
        mid_id = len(pts) + np.arange(len(uniq))
        pts = np.concatenate([pts, mid], 0)
        level = np.concatenate([level, np.full(len(uniq), ref_level)], 0)

        n = len(faces)
        m01 = mid_id[inv[:n]]
        m12 = mid_id[inv[n : 2 * n]]
        m20 = mid_id[inv[2 * n :]]
        faces = np.concatenate(
            [
                np.stack([faces[:, 0], m01, m20], 1),
                np.stack([m01, faces[:, 1], m12], 1),
                np.stack([m01, m12, m20], 1),
                np.stack([m20, m12, faces[:, 2]], 1),
            ],
            0,
        )

    # deterministic uniform-prefix ordering: coarse levels first, then by
    # z descending and azimuth (the reference walks the connectivity graph
    # from the top vertex; sorting by (level, -z-band, azimuth) gives the
    # same top-down sweep property without the graph walk)
    az = np.mod(np.arctan2(pts[:, 1], pts[:, 0]), 2.0 * math.pi)
    order = np.lexsort((az, -np.round(pts[:, 2], 6), level))
    return pts[order] * radius, level[order]


def look_at_poses(cam_pts: np.ndarray) -> np.ndarray:
    """[N, 3] camera positions (object frame) → [N, 3, 4] object-to-camera
    poses looking at the origin, OpenCV convention (+z forward), matching the
    reference's gluLookAt + GL→CV flip (ref view_sampler.py:204-227)."""
    cam_pts = np.asarray(cam_pts, np.float64)
    f = -cam_pts
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    up = np.array([0.0, 0.0, 1.0])
    s = np.cross(f, np.broadcast_to(up, f.shape))
    deg = np.linalg.norm(s, axis=1) < 1e-12  # looking straight along ±z
    s[deg] = (1.0, 0.0, 0.0)
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    u = np.cross(s, f)
    # GL camera rows (s, u, -f), then flip y/z into the CV convention
    R_gl = np.stack([s, u, -f], 1)
    flip = np.diag([1.0, -1.0, -1.0])
    R = flip @ R_gl
    t = -np.einsum("nij,nj->ni", R, cam_pts)
    return np.concatenate([R, t[..., None]], -1).astype(np.float32)


def sample_views(
    min_n_views: int,
    radius: float = 1.0,
    azimuth_range: tuple[float, float] = (0.0, 2.0 * math.pi),
    elev_range: tuple[float, float] = (-0.5 * math.pi, 0.5 * math.pi),
    method: str = "hinter",
) -> tuple[np.ndarray, np.ndarray]:
    """Sample ≥min_n_views camera viewpoints on the sphere and return
    ([M, 3, 4] object-to-camera poses, [M] refinement levels), filtered to
    the azimuth/elevation ranges (ref view_sampler.py:165-230). The batched
    pose array feeds the vmapped rasterizer directly."""
    if method == "hinter":
        pts, level = hinter_sampling(min_n_views, radius)
    elif method == "fibonacci":
        n = min_n_views + (1 - min_n_views % 2)
        pts, level = fibonacci_sampling(n, radius), np.zeros(
            min_n_views + (1 - min_n_views % 2), np.int64
        )
    else:
        raise ValueError(f"unknown sampling method: {method}")

    az = np.mod(np.arctan2(pts[:, 1], pts[:, 0]), 2.0 * math.pi)
    elev = np.arcsin(np.clip(pts[:, 2] / np.linalg.norm(pts, axis=1), -1, 1))
    keep = (
        (az >= azimuth_range[0])
        & (az <= azimuth_range[1])
        & (elev >= elev_range[0])
        & (elev <= elev_range[1])
    )
    return look_at_poses(pts[keep]), level[keep]
