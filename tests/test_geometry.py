import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clean_pvnet_tpu.geometry import (
    angle_axis_to_matrix,
    compute_vertex_field,
    compute_vertex_field_np,
    farthest_point_sampling,
    matrix_to_angle_axis,
    project,
    rotation_geodesic_deg,
    transform_points,
)
from clean_pvnet_tpu.geometry.fps import farthest_point_sampling_np


def random_pose(rng):
    aa = rng.randn(3) * 0.8
    R = np.asarray(angle_axis_to_matrix(jnp.asarray(aa, jnp.float32)))
    t = np.array([0.05, -0.03, 0.6]) + rng.randn(3) * 0.05
    return np.concatenate([R, t[:, None]], -1).astype(np.float32)


K_LINEMOD = np.array(
    [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
    np.float32,
)


class TestRotations:
    def test_round_trip(self, rng):
        aa = jnp.asarray(rng.randn(16, 3), jnp.float32)
        R = angle_axis_to_matrix(aa)
        # orthonormality
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        aa2 = matrix_to_angle_axis(R)
        R2 = angle_axis_to_matrix(aa2)
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_small_angle(self):
        aa = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
        R = angle_axis_to_matrix(aa)
        np.testing.assert_allclose(R, np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)

    def test_geodesic(self, rng):
        R1 = angle_axis_to_matrix(jnp.asarray([0.0, 0.0, 0.0]))
        R2 = angle_axis_to_matrix(jnp.asarray([0.0, 0.0, np.pi / 6]))
        deg = rotation_geodesic_deg(R1, R2)
        np.testing.assert_allclose(deg, 30.0, atol=1e-3)


class TestProject:
    def test_matches_numpy_oracle(self, rng):
        # oracle mirrors ref pvnet_pose_utils.project (lib/utils/pvnet)
        xyz = rng.randn(50, 3).astype(np.float32) * 0.05
        rt = random_pose(rng)
        expect = (xyz @ rt[:, :3].T + rt[:, 3]) @ K_LINEMOD.T
        expect = expect[:, :2] / expect[:, 2:]
        got = project(jnp.asarray(xyz), jnp.asarray(K_LINEMOD), jnp.asarray(rt))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-3)

    def test_batched(self, rng):
        xyz = jnp.asarray(rng.randn(4, 9, 3), jnp.float32) * 0.05
        rt = jnp.stack([jnp.asarray(random_pose(rng)) for _ in range(4)])
        K = jnp.broadcast_to(jnp.asarray(K_LINEMOD), (4, 3, 3))
        out = project(xyz, K, rt)
        assert out.shape == (4, 9, 2)
        one = project(xyz[1], K[1], rt[1])
        np.testing.assert_allclose(out[1], one, atol=1e-5)

    def test_transform_points(self, rng):
        xyz = rng.randn(10, 3).astype(np.float32)
        rt = random_pose(rng)
        got = transform_points(jnp.asarray(xyz), jnp.asarray(rt))
        np.testing.assert_allclose(got, xyz @ rt[:, :3].T + rt[:, 3], atol=1e-5)


class TestVertexField:
    def test_np_matches_reference_semantics(self, rng):
        # oracle re-implements ref pvnet_data_utils.compute_vertex:30-44
        h, w, k = 24, 32, 4
        mask = (rng.rand(h, w) > 0.7).astype(np.uint8)
        kpt = (rng.rand(k, 2) * [w, h]).astype(np.float32)

        xy = np.argwhere(mask == 1)[:, [1, 0]]
        diff = kpt[None] - xy[:, None]
        norm = np.linalg.norm(diff, axis=2, keepdims=True)
        norm[norm < 1e-3] += 1e-3
        expect = np.zeros([h, w, k, 2], np.float32)
        expect[xy[:, 1], xy[:, 0]] = diff / norm
        expect = expect.reshape(h, w, k * 2)

        got = compute_vertex_field_np(mask, kpt)
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_jnp_matches_np(self, rng):
        h, w, k = 16, 20, 9
        mask = (rng.rand(h, w) > 0.5).astype(np.uint8)
        kpt = (rng.rand(k, 2) * [w, h]).astype(np.float32)
        a = compute_vertex_field_np(mask, kpt)
        b = compute_vertex_field(jnp.asarray(mask), jnp.asarray(kpt))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_unit_norm_on_foreground(self, rng):
        mask = np.ones((8, 8), np.uint8)
        kpt = np.array([[20.0, 20.0]], np.float32)
        v = compute_vertex_field_np(mask, kpt).reshape(8, 8, 1, 2)
        norms = np.linalg.norm(v, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestFPS:
    def test_matches_numpy_oracle(self, rng):
        pts = rng.randn(500, 3).astype(np.float32)
        a = farthest_point_sampling(jnp.asarray(pts), 8)
        b = farthest_point_sampling_np(pts, 8)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_init_center(self, rng):
        pts = rng.randn(200, 3).astype(np.float32)
        a = farthest_point_sampling(jnp.asarray(pts), 8, init_center=True)
        b = farthest_point_sampling_np(pts, 8, init_center=True)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_spread(self, rng):
        # FPS picks well-separated points on a cube
        corners = np.array(
            [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
            np.float32,
        )
        fill = rng.rand(400, 3).astype(np.float32) * 0.2 + 0.4
        pts = np.concatenate([corners, fill])
        rng.shuffle(pts)
        # 9 samples: the first is arbitrary (pts[0]), the rest must cover
        # all 8 corners
        out = np.asarray(farthest_point_sampling(jnp.asarray(pts), 9))
        d = np.linalg.norm(corners[:, None] - out[None], axis=-1).min(-1)
        assert (d < 0.35).all()
