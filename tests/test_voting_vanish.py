import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clean_pvnet_tpu.geometry import compute_vertex_field_np
from clean_pvnet_tpu.ops.voting_vanish import (
    generate_hypotheses_projective,
    inlier_mask_projective,
    ransac_vote_projective,
)


def oracle_generate(direct, coords, idxs):
    """numpy oracle of ref ransac_voting_kernel.cu:171-229."""
    hn, vn, _ = idxs.shape
    out = np.zeros((hn, vn, 3), np.float32)
    for hi in range(hn):
        for vi in range(vn):
            i0, i1 = idxs[hi, vi]
            dx0, dy0 = direct[i0, vi]
            cx0, cy0 = coords[i0]
            dx1, dy1 = direct[i1, vi]
            cx1, cy1 = coords[i1]
            l0 = np.array([dy0, -dx0, cy0 * dx0 - cx0 * dy0])
            l1 = np.array([dy1, -dx1, cy1 * dx1 - cx1 * dy1])
            x = l0[1] * l1[2] - l0[2] * l1[1]
            y = l0[2] * l1[0] - l0[0] * l1[2]
            z = l0[0] * l1[1] - l0[1] * l1[0]
            vx0 = dx0 * (x - z * cx0)
            vx1 = dx1 * (x - z * cx1)
            vy0 = dy0 * (y - z * cy0)
            vy1 = dy1 * (y - z * cy1)
            if vx0 < 0 and vx1 < 0 and vy0 < 0 and vy1 < 0:
                x, y, z = -x, -y, -z
            if vx0 * vx1 < 0 or vy0 * vy1 < 0:
                x = y = z = 0.0
            out[hi, vi] = (x, y, z)
    return out


class TestProjectiveHypotheses:
    def test_matches_cuda_oracle(self, rng):
        tn, vn, hn = 30, 3, 12
        coords = (rng.rand(tn, 2) * 64).astype(np.float32)
        direct = rng.randn(tn, vn, 2).astype(np.float32)
        direct /= np.linalg.norm(direct, axis=-1, keepdims=True)
        idxs = rng.randint(0, tn, (hn, vn, 2)).astype(np.int32)
        expect = oracle_generate(direct, coords, idxs)
        got = np.asarray(
            generate_hypotheses_projective(
                jnp.asarray(direct), jnp.asarray(coords), jnp.asarray(idxs)
            )
        )
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-2)

    def test_in_image_keypoint_recovered(self, rng):
        # when the keypoint is inside the crop, normalizing by z must give it
        h = w = 64
        mask = np.zeros((h, w), np.uint8)
        mask[8:56, 8:56] = 1
        kpt = np.array([[40.0, 25.0]], np.float32)
        vertex = compute_vertex_field_np(mask, kpt).reshape(h, w, 1, 2)
        pts, ratio = ransac_vote_projective(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(0),
            num_hypotheses=128, max_pixels=256,
        )
        p = np.asarray(pts)[0]
        assert abs(p[2]) > 1e-8
        xy = p[:2] / p[2]
        np.testing.assert_allclose(xy, kpt[0], atol=0.5)
        assert float(ratio[0]) > 0.5

    def test_out_of_image_keypoint_recovered(self, rng):
        # truncation case: keypoint far outside the crop
        h = w = 64
        mask = np.zeros((h, w), np.uint8)
        mask[8:56, 8:56] = 1
        kpt = np.array([[200.0, -80.0]], np.float32)
        vertex = compute_vertex_field_np(mask, kpt).reshape(h, w, 1, 2)
        pts, ratio = ransac_vote_projective(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(1),
            num_hypotheses=256, max_pixels=256,
        )
        p = np.asarray(pts)[0]
        xy = p[:2] / p[2]
        np.testing.assert_allclose(xy, kpt[0], rtol=0.02, atol=2.0)


class TestProjectiveDecodePath:
    """decode_keypoints + PnP with voting.projective=true (the wiring the
    truncation_linemod config uses; the reference ships the kernels unwired,
    ref ransac_voting_kernel.cu:170-310)."""

    def _seg(self, mask):
        return np.stack([1.0 - 2 * mask, 2.0 * mask - 1.0], -1).astype(np.float32)

    def test_decode_mixed_in_and_out_of_crop(self, rng):
        from clean_pvnet_tpu.config import Config
        from clean_pvnet_tpu.models import decode_keypoints

        h = w = 64
        mask = np.zeros((h, w), np.uint8)
        mask[8:56, 8:56] = 1
        kpt = np.array(
            [[30.0, 30.0], [48.0, 20.0], [180.0, -70.0], [-90.0, 140.0]],
            np.float32,
        )
        vertex = compute_vertex_field_np(mask, kpt)
        cfg = Config().with_overrides(
            {"voting.projective": True, "voting.num_hypotheses": 256,
             "voting.max_pixels": 512}
        )
        out = decode_keypoints(
            jnp.asarray(self._seg(mask)[None]), jnp.asarray(vertex[None]),
            jax.random.PRNGKey(0), cfg,
        )
        assert bool(out["valid"][0])
        got = np.asarray(out["kpt_2d"][0])
        valid = np.asarray(out["kpt_valid"][0])
        assert valid.all()
        np.testing.assert_allclose(got[:2], kpt[:2], atol=1.0)
        # truncated keypoints recovered to within a couple px even far outside
        np.testing.assert_allclose(got[2:], kpt[2:], rtol=0.03, atol=3.0)

    def test_pnp_ignores_invalid_keypoints(self, rng):
        # weighted DLT + LM: a garbage (0,0) keypoint with zero weight must
        # not move the solution
        from clean_pvnet_tpu.geometry.pnp import solve_pnp
        from clean_pvnet_tpu.geometry.transforms import angle_axis_to_matrix

        n = 9
        pts3d = rng.randn(n, 3).astype(np.float32) * 0.1
        R = np.asarray(angle_axis_to_matrix(jnp.asarray([0.3, -0.2, 0.5])))
        t = np.array([0.02, -0.05, 0.6], np.float32)
        K = np.array([[520.0, 0, 64], [0, 520.0, 64], [0, 0, 1]], np.float32)
        cam = pts3d @ R.T + t
        proj = cam @ K.T
        pts2d = (proj[:, :2] / proj[:, 2:]).astype(np.float32)

        corrupt = pts2d.copy()
        corrupt[3] = 0.0  # voted to "invalid" — zero weight
        wgt = np.repeat(np.eye(2, dtype=np.float32)[None], n, 0)
        wgt[3] = 0.0
        pose = np.asarray(
            solve_pnp(jnp.asarray(pts3d), jnp.asarray(corrupt),
                      jnp.asarray(K), weights=jnp.asarray(wgt))
        )
        np.testing.assert_allclose(pose[:, :3], R, atol=1e-3)
        np.testing.assert_allclose(pose[:, 3], t, atol=1e-3)

    def test_projective_pipeline_jits(self, rng):
        # the full InferencePipeline under voting.projective compiles and
        # returns finite poses on random inputs
        from clean_pvnet_tpu.config import Config
        from clean_pvnet_tpu.eval import InferencePipeline
        from clean_pvnet_tpu.models import make_network

        cfg = Config().with_overrides(
            {"voting.projective": True, "voting.num_hypotheses": 32,
             "voting.max_pixels": 64}
        )
        model = make_network(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        kpt_3d = rng.randn(9, 3).astype(np.float32) * 0.05
        K = np.array([[520.0, 0, 16], [0, 520.0, 16], [0, 0, 1]], np.float32)
        pipe = InferencePipeline(cfg, model, kpt_3d)
        out = pipe(
            variables,
            jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)),
            jnp.asarray(np.tile(K, (2, 1, 1))),
            jax.random.PRNGKey(1),
        )
        assert out["pose"].shape == (2, 3, 4)
        assert np.isfinite(np.asarray(out["pose"])).all()

    def test_pnp_five_valid_keypoints(self, rng):
        # rank regression: with <6 valid correspondences a purely
        # zero-weighted DLT is rank-deficient and used to return garbage;
        # the floored init + zero-weight LM must still recover the pose
        from clean_pvnet_tpu.geometry.pnp import solve_pnp
        from clean_pvnet_tpu.geometry.transforms import angle_axis_to_matrix

        n = 9
        pts3d = rng.randn(n, 3).astype(np.float32) * 0.1
        R = np.asarray(angle_axis_to_matrix(jnp.asarray([-0.4, 0.25, 0.1])))
        t = np.array([-0.03, 0.04, 0.55], np.float32)
        K = np.array([[520.0, 0, 64], [0, 520.0, 64], [0, 0, 1]], np.float32)
        cam = pts3d @ R.T + t
        proj = cam @ K.T
        pts2d = (proj[:, :2] / proj[:, 2:]).astype(np.float32)

        corrupt = pts2d.copy()
        corrupt[5:] = 0.0
        wgt = np.repeat(np.eye(2, dtype=np.float32)[None], n, 0)
        wgt[5:] = 0.0
        pose = np.asarray(
            solve_pnp(jnp.asarray(pts3d), jnp.asarray(corrupt),
                      jnp.asarray(K), weights=jnp.asarray(wgt))
        )
        np.testing.assert_allclose(pose[:, :3], R, atol=2e-3)
        np.testing.assert_allclose(pose[:, 3], t, atol=2e-3)

    def test_refit_gives_subpixel_out_of_crop(self, rng):
        # with the winner refit, a finite out-of-crop keypoint is recovered
        # to subpixel despite the 2-ray hypotheses being pixel-noisy
        h = w = 64
        mask = np.zeros((h, w), np.uint8)
        mask[8:56, 8:56] = 1
        kpt = np.array([[150.0, -40.0]], np.float32)
        vertex = compute_vertex_field_np(mask, kpt).reshape(h, w, 1, 2)
        pts, ratio = ransac_vote_projective(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(2),
            num_hypotheses=128, max_pixels=256,
        )
        p = np.asarray(pts)[0]
        xy = p[:2] / p[2]
        np.testing.assert_allclose(xy, kpt[0], atol=0.2)
        assert float(ratio[0]) > 0.5
