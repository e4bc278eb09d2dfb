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
