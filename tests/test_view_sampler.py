"""View sampling (geometry/view_sampler) + CoU pose error (eval/vsd).

Counterparts of reference lib/utils/pysixd/view_sampler.py and
pose_error.py:86-118 (cou).
"""

import math

import jax.numpy as jnp
import numpy as np

from clean_pvnet_tpu.data.synthetic import make_synthetic_mesh
from clean_pvnet_tpu.eval.vsd import cou_pose_error
from clean_pvnet_tpu.geometry.view_sampler import (
    fibonacci_sampling,
    hinter_sampling,
    look_at_poses,
    sample_views,
)

HW = (96, 128)
K = np.array([[150.0, 0, 64], [0, 150.0, 48], [0, 0, 1]], np.float32)


class TestSphereSampling:
    def test_fibonacci_on_sphere(self):
        pts = fibonacci_sampling(101, radius=2.0)
        assert pts.shape == (101, 3)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 2.0, rtol=1e-6)

    def test_fibonacci_near_equidistant(self):
        pts = fibonacci_sampling(201)
        # nearest-neighbor spacing should be tight around its mean
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        nn = d.min(1)
        assert nn.std() / nn.mean() < 0.3

    def test_hinter_counts_and_radius(self):
        pts, level = hinter_sampling(100, radius=0.75)
        # one icosahedron refinement step: 12 -> 42 -> 162
        assert len(pts) == 162 and len(level) == 162
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 0.75, rtol=1e-6)
        assert level.min() == 0 and level.max() == 2
        # coarse levels come first: any prefix is a uniform covering
        assert (np.diff(level) >= 0).all()

    def test_hinter_unique_points(self):
        pts, _ = hinter_sampling(40)
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 1e-3


class TestLookAtPoses:
    def test_camera_looks_at_origin(self):
        rng = np.random.RandomState(0)
        cams = rng.randn(32, 3)
        cams /= np.linalg.norm(cams, axis=1, keepdims=True)
        cams *= 0.8
        poses = look_at_poses(cams)
        assert poses.shape == (32, 3, 4)
        # origin maps to the +z optical axis at distance |cam|
        p = np.einsum("nij,j->ni", poses[:, :, :3], np.zeros(3)) + poses[:, :, 3]
        np.testing.assert_allclose(p[:, :2], 0.0, atol=1e-5)
        np.testing.assert_allclose(p[:, 2], 0.8, atol=1e-5)
        # valid rotations
        RtR = np.einsum("nij,nik->njk", poses[:, :, :3], poses[:, :, :3])
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                                   atol=1e-5)
        det = np.linalg.det(poses[:, :, :3])
        np.testing.assert_allclose(det, 1.0, atol=1e-5)

    def test_degenerate_poles(self):
        poses = look_at_poses(np.array([[0, 0, 1.0], [0, 0, -1.0]]))
        for rt in poses:
            np.testing.assert_allclose(
                rt[:, :3] @ rt[:, :3].T, np.eye(3), atol=1e-6
            )


class TestSampleViews:
    def test_full_sphere(self):
        views, level = sample_views(60, radius=0.5)
        assert len(views) >= 60 and len(level) == len(views)
        # every view keeps the object centered at distance 0.5
        t = views[:, :, 3]
        np.testing.assert_allclose(t[:, :2], 0.0, atol=1e-5)
        np.testing.assert_allclose(t[:, 2], 0.5, atol=1e-5)

    def test_upper_hemisphere_filter(self):
        views, _ = sample_views(60, radius=1.0, elev_range=(0.0, 0.5 * math.pi))
        # camera center in the object frame: c = -R^T t, must have z >= 0
        c = -np.einsum("nij,ni->nj", views[:, :, :3], views[:, :, 3])
        assert (c[:, 2] >= -1e-6).all()
        assert len(views) > 10


class TestCoU:
    def test_same_pose_zero(self):
        verts, faces, _ = make_synthetic_mesh(0)
        rt = look_at_poses(np.array([[0.0, 0.3, 0.4]]))[0]
        err = cou_pose_error(
            jnp.asarray(rt), jnp.asarray(rt), jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32), jnp.asarray(K), HW,
        )
        assert float(err) == 0.0

    def test_disjoint_pose_is_one(self):
        verts, faces, _ = make_synthetic_mesh(0)
        rt = look_at_poses(np.array([[0.0, 0.3, 0.4]]))[0]
        rt_far = rt.copy()
        rt_far[0, 3] += 10.0  # silhouettes cannot overlap
        err = cou_pose_error(
            jnp.asarray(rt), jnp.asarray(rt_far),
            jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32),
            jnp.asarray(K), HW,
        )
        assert float(err) == 1.0

    def test_small_shift_partial(self):
        verts, faces, _ = make_synthetic_mesh(0)
        rt = look_at_poses(np.array([[0.0, 0.3, 0.4]]))[0]
        rt_near = rt.copy()
        rt_near[0, 3] += 0.01
        err = float(
            cou_pose_error(
                jnp.asarray(rt), jnp.asarray(rt_near),
                jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32),
                jnp.asarray(K), HW,
            )
        )
        assert 0.0 < err < 1.0
