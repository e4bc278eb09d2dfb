"""Distributed multi-instance refinement (parallel/refine_sharded.py):
the block-diagonal LM solve sharded over the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from clean_pvnet_tpu.parallel import make_mesh, make_sharded_refiner, refine_instances


def _scene(rng, n_inst, vn=9, noise=0.3):
    """n_inst instances with GT poses + noisy projected keypoints."""
    K = np.array(
        [[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32
    )
    kpt_3d = []
    kpt_2d = []
    poses = []
    for _ in range(n_inst):
        pts = rng.randn(vn, 3).astype(np.float32) * 0.05
        # random rotation via QR
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                      rng.uniform(0.5, 0.9)])
        cam = pts @ q.T + t
        proj = cam @ K.T
        uv = proj[:, :2] / proj[:, 2:]
        uv = uv + rng.randn(vn, 2) * noise
        kpt_3d.append(pts)
        kpt_2d.append(uv.astype(np.float32))
        poses.append(np.concatenate([q, t[:, None]], -1).astype(np.float32))
    covars = np.tile(np.eye(2, dtype=np.float32) * noise**2,
                     (n_inst, vn, 1, 1))
    Ks = np.tile(K, (n_inst, 1, 1))
    return (np.stack(kpt_3d), np.stack(kpt_2d), covars, Ks, np.stack(poses))


class TestRefineInstances:
    def test_recovers_poses(self, rng):
        k3, k2, cov, Ks, gt = _scene(rng, 8)
        valid = np.ones(8, bool)
        poses = np.asarray(refine_instances(
            jnp.asarray(k3), jnp.asarray(k2), jnp.asarray(cov),
            jnp.asarray(Ks), jnp.asarray(valid)
        ))
        t_err = np.linalg.norm(poses[:, :, 3] - gt[:, :, 3], axis=-1)
        assert t_err.max() < 0.02, t_err  # < 2 cm at ~0.7 m depth
        for p, g in zip(poses, gt):
            cos = (np.trace(p[:, :3].T @ g[:, :3]) - 1) / 2
            assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 5.0

    def test_invalid_slots_return_identity(self, rng):
        k3, k2, cov, Ks, _ = _scene(rng, 4)
        valid = np.array([True, False, True, False])
        poses = np.asarray(refine_instances(
            jnp.asarray(k3), jnp.asarray(k2), jnp.asarray(cov),
            jnp.asarray(Ks), jnp.asarray(valid)
        ))
        np.testing.assert_allclose(poses[1, :, :3], np.eye(3))
        np.testing.assert_allclose(poses[1, :, 3], 0.0)


class TestShardedRefiner:
    def test_matches_single_device_and_gt(self, rng):
        n = 16  # 2 instances per device on the 8-device mesh
        k3, k2, cov, Ks, gt = _scene(rng, n)
        valid = np.ones(n, bool)
        args = tuple(map(jnp.asarray, (k3, k2, cov, Ks, valid)))

        mesh = make_mesh(num_devices=8)
        sharded = make_sharded_refiner(mesh, iters=30)
        poses_s = np.asarray(sharded(*args))
        poses_1 = np.asarray(refine_instances(*args, iters=30))

        # identical math on identical blocks → near-bitwise agreement
        np.testing.assert_allclose(poses_s, poses_1, atol=1e-5)
        t_err = np.linalg.norm(poses_s[:, :, 3] - gt[:, :, 3], axis=-1)
        assert t_err.max() < 0.02, t_err

    def test_rejects_unpadded_counts(self, rng):
        k3, k2, cov, Ks, _ = _scene(rng, 6)
        mesh = make_mesh(num_devices=8)
        sharded = make_sharded_refiner(mesh)
        try:
            sharded(jnp.asarray(k3), jnp.asarray(k2), jnp.asarray(cov),
                    jnp.asarray(Ks), jnp.asarray(np.ones(6, bool)))
        except ValueError as e:
            assert "divide" in str(e)
        else:
            raise AssertionError("expected ValueError for 6 % 8 != 0")
