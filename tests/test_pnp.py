import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clean_pvnet_tpu.geometry import project, solve_pnp, solve_pnp_uncertainty
from clean_pvnet_tpu.geometry.pnp import dlt_init, inv_sqrtm_2x2
from clean_pvnet_tpu.geometry.transforms import (
    angle_axis_to_matrix,
    rotation_geodesic_deg,
)

K = jnp.asarray(
    [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
    jnp.float32,
)


def make_problem(rng, n=9, noise=0.0, spread=0.06):
    """Random non-planar keypoint set (like FPS points on an object) + pose."""
    pts3d = rng.randn(n, 3).astype(np.float32) * spread
    aa = rng.randn(3).astype(np.float32) * 0.9
    R = np.asarray(angle_axis_to_matrix(jnp.asarray(aa)))
    t = np.array([0.03, -0.02, 0.5], np.float32) + rng.randn(3).astype(np.float32) * 0.03
    rt = np.concatenate([R, t[:, None]], -1).astype(np.float32)
    pts2d = np.asarray(project(jnp.asarray(pts3d), K, jnp.asarray(rt)))
    pts2d = pts2d + rng.randn(n, 2).astype(np.float32) * noise
    return pts3d, pts2d, rt


def pose_errors(rt_pred, rt_gt):
    r_deg = float(rotation_geodesic_deg(jnp.asarray(rt_pred[:, :3]), jnp.asarray(rt_gt[:, :3])))
    t_err = float(np.linalg.norm(rt_pred[:, 3] - rt_gt[:, 3]))
    return r_deg, t_err


class TestDLTInit:
    def test_noise_free_recovery(self, rng):
        for _ in range(10):
            pts3d, pts2d, rt = make_problem(rng)
            rays = np.concatenate([pts2d, np.ones((9, 1), np.float32)], -1) @ np.asarray(
                jnp.linalg.inv(K)
            ).T
            R0, t0 = dlt_init(jnp.asarray(pts3d), jnp.asarray(rays[:, :2], jnp.float32))
            r_deg, t_err = pose_errors(
                np.concatenate([np.asarray(R0), np.asarray(t0)[:, None]], -1), rt
            )
            assert r_deg < 1.0, r_deg
            assert t_err < 0.01, t_err


class TestSolvePnP:
    def test_exact_recovery(self, rng):
        for _ in range(10):
            pts3d, pts2d, rt = make_problem(rng)
            pred = np.asarray(solve_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), K))
            r_deg, t_err = pose_errors(pred, rt)
            assert r_deg < 0.05, r_deg
            assert t_err < 5e-4, t_err

    def test_noisy_recovery(self, rng):
        # 1px keypoint noise → pose should still be close (ADD-level accuracy)
        errs = []
        for _ in range(10):
            pts3d, pts2d, rt = make_problem(rng, noise=1.0)
            pred = np.asarray(solve_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), K))
            errs.append(pose_errors(pred, rt))
        r = np.array([e[0] for e in errs])
        t = np.array([e[1] for e in errs])
        assert np.median(r) < 3.0, r
        assert np.median(t) < 0.02, t

    def test_reprojection_optimality(self, rng):
        # with noise, the refined pose must reproject better than ground truth
        pts3d, pts2d, rt = make_problem(rng, noise=2.0)
        pred = solve_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), K)
        err_pred = np.linalg.norm(
            np.asarray(project(jnp.asarray(pts3d), K, pred)) - pts2d, axis=-1
        ).mean()
        err_gt = np.linalg.norm(
            np.asarray(project(jnp.asarray(pts3d), K, jnp.asarray(rt))) - pts2d, axis=-1
        ).mean()
        assert err_pred <= err_gt + 1e-3

    def test_vmap_batch(self, rng):
        probs = [make_problem(rng) for _ in range(4)]
        p3 = jnp.stack([jnp.asarray(p[0]) for p in probs])
        p2 = jnp.stack([jnp.asarray(p[1]) for p in probs])
        batched = jax.vmap(lambda a, b: solve_pnp(a, b, K))(p3, p2)
        for i, (_, _, rt) in enumerate(probs):
            r_deg, t_err = pose_errors(np.asarray(batched[i]), rt)
            assert r_deg < 0.1 and t_err < 1e-3

    def test_far_pose(self, rng):
        pts3d, _, _ = make_problem(rng)
        R = np.asarray(angle_axis_to_matrix(jnp.asarray([0.3, -1.2, 0.4])))
        t = np.array([0.2, 0.1, 1.8], np.float32)
        rt = np.concatenate([R, t[:, None]], -1).astype(np.float32)
        pts2d = np.asarray(project(jnp.asarray(pts3d), K, jnp.asarray(rt)))
        pred = np.asarray(solve_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), K))
        r_deg, t_err = pose_errors(pred, rt)
        assert r_deg < 0.1 and t_err < 2e-3


class TestInvSqrtm:
    def test_matches_scipy(self, rng):
        import scipy.linalg

        for _ in range(20):
            A = rng.randn(2, 2)
            cov = (A @ A.T + 0.1 * np.eye(2)).astype(np.float32)
            got = np.asarray(inv_sqrtm_2x2(jnp.asarray(cov)))
            expect = np.linalg.inv(scipy.linalg.sqrtm(cov).real)
            np.testing.assert_allclose(got, expect, rtol=2e-3, atol=1e-4)


class TestUncertaintyPnP:
    def test_weights_downweight_bad_keypoints(self, rng):
        # corrupt 2 keypoints badly; give them huge covariance → the weighted
        # solve should stay accurate while the unweighted one degrades
        pts3d, pts2d, rt = make_problem(rng, n=9)
        pts2d_bad = pts2d.copy()
        pts2d_bad[0] += 40.0
        pts2d_bad[5] -= 35.0
        covars = np.tile(np.eye(2, dtype=np.float32) * 0.5, (9, 1, 1))
        covars[0] = np.eye(2) * 1e4
        covars[5] = np.eye(2) * 1e4

        pred_w = np.asarray(
            solve_pnp_uncertainty(
                jnp.asarray(pts3d), jnp.asarray(pts2d_bad), jnp.asarray(covars), K
            )
        )
        pred_u = np.asarray(solve_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d_bad), K))
        rw, tw = pose_errors(pred_w, rt)
        ru, tu = pose_errors(pred_u, rt)
        assert tw < tu
        assert rw < 2.0, rw
        assert tw < 0.01, tw

    def test_degenerate_covariances_zeroed(self, rng):
        pts3d, pts2d, rt = make_problem(rng)
        covars = np.tile(np.eye(2, dtype=np.float32), (9, 1, 1))
        covars[3] *= 0.0  # cov_xx < 1e-6 → weight zeroed (ref pvnet.py:120)
        pred = np.asarray(
            solve_pnp_uncertainty(
                jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(covars), K
            )
        )
        r_deg, t_err = pose_errors(pred, rt)
        assert r_deg < 0.1 and t_err < 1e-3

    def test_scalar_variant_downweights_bad_keypoints(self, rng):
        # uncertainty_pnp_v2 semantics (ref un_pnp_utils.py:60-121): weight
        # 1/λ_max per keypoint, zeroed when cov_xx < 1e-5
        from clean_pvnet_tpu.geometry import solve_pnp_uncertainty_scalar

        pts3d, pts2d, rt = make_problem(rng, n=9)
        pts2d_bad = pts2d.copy()
        pts2d_bad[2] += 50.0
        covars = np.tile(np.eye(2, dtype=np.float32) * 0.5, (9, 1, 1))
        covars[2] = np.eye(2) * 1e4
        covars[7] *= 0.0  # degenerate → weight 0

        pred = np.asarray(
            solve_pnp_uncertainty_scalar(
                jnp.asarray(pts3d), jnp.asarray(pts2d_bad), jnp.asarray(covars), K
            )
        )
        pred_u = np.asarray(
            solve_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d_bad), K)
        )
        rw, tw = pose_errors(pred, rt)
        _, tu = pose_errors(pred_u, rt)
        assert tw < tu
        assert rw < 2.0 and tw < 0.01, (rw, tw)

    def test_scalar_variant_anisotropic_cov_uses_worst_axis(self, rng):
        # λ_max of an anisotropic covariance dominates the weight: a keypoint
        # noisy along one axis is trusted as little as its worst axis
        from clean_pvnet_tpu.geometry import solve_pnp_uncertainty_scalar

        pts3d, pts2d, rt = make_problem(rng, n=9)
        covars = np.tile(np.eye(2, dtype=np.float32), (9, 1, 1))
        covars[4] = np.array([[1e4, 0.0], [0.0, 1e-2]], np.float32)
        pts2d_bad = pts2d.copy()
        pts2d_bad[4, 0] += 45.0  # corrupt along the noisy axis
        pred = np.asarray(
            solve_pnp_uncertainty_scalar(
                jnp.asarray(pts3d), jnp.asarray(pts2d_bad), jnp.asarray(covars), K
            )
        )
        rw, tw = pose_errors(pred, rt)
        assert rw < 2.0 and tw < 0.01, (rw, tw)


class TestOpenCVParity:
    """SURVEY.md §7 hard-part #2: LM convergence parity with OpenCV's
    SOLVEPNP_ITERATIVE (the reference's solver, ref pvnet_pose_utils.py:5-38)."""

    def test_matches_cv2_iterative(self, rng):
        cv2 = pytest.importorskip("cv2")
        worse = 0
        for _ in range(10):
            pts3d, pts2d, rt = make_problem(rng, noise=1.0)
            ours = np.asarray(solve_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), K))
            _, rvec, tvec = cv2.solvePnP(
                pts3d.astype(np.float64),
                pts2d.astype(np.float64),
                np.asarray(K, np.float64),
                None,
                flags=cv2.SOLVEPNP_ITERATIVE,
            )
            Rcv, _ = cv2.Rodrigues(rvec)
            cv = np.concatenate([Rcv, tvec], -1).astype(np.float32)

            def reproj_err(rt_):
                p = np.asarray(project(jnp.asarray(pts3d), K, jnp.asarray(rt_)))
                return float(np.linalg.norm(p - pts2d, axis=-1).mean())

            e_ours, e_cv = reproj_err(ours), reproj_err(cv)
            # ours must reach the same optimum (tolerance: 5% or 0.05 px)
            if e_ours > e_cv * 1.05 + 0.05:
                worse += 1
            r_deg, t_err = pose_errors(ours, cv)
            assert r_deg < 2.0, r_deg     # same basin as OpenCV
            assert t_err < 0.02, t_err
        assert worse == 0

    def test_matches_cv2_epnp_seeded_refine(self, rng):
        """Against cv2's EPnP+refine combo on clean data (tight bound)."""
        cv2 = pytest.importorskip("cv2")
        for _ in range(5):
            pts3d, pts2d, rt = make_problem(rng, noise=0.0)
            ours = np.asarray(solve_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), K))
            r_deg, t_err = pose_errors(ours, rt)
            assert r_deg < 0.1, r_deg
            assert t_err < 1e-3, t_err
