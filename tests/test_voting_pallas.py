import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clean_pvnet_tpu.ops.voting import _inlier_mask
from clean_pvnet_tpu.ops.voting_pallas import count_inliers_pallas


class TestPallasCounts:
    def _problem(self, rng, tn, vn, hn):
        coords = (rng.rand(tn, 2) * 480).astype(np.float32)
        direct = rng.randn(tn, vn, 2).astype(np.float32)
        direct /= np.linalg.norm(direct, axis=-1, keepdims=True)
        hyp = (rng.rand(hn, vn, 2) * 480).astype(np.float32)
        valid = rng.rand(tn) > 0.2
        return (
            jnp.asarray(direct),
            jnp.asarray(coords),
            jnp.asarray(valid),
            jnp.asarray(hyp),
        )

    @pytest.mark.parametrize("tn,vn,hn", [(600, 9, 300), (512, 3, 256), (37, 2, 64)])
    def test_matches_jnp_dense(self, rng, tn, vn, hn):
        direct, coords, valid, hyp = self._problem(rng, tn, vn, hn)
        expect = jnp.sum(
            _inlier_mask(hyp, direct, coords, valid, 0.99), -1, dtype=jnp.int32
        )
        got = count_inliers_pallas(
            direct, coords, valid, hyp, 0.99,
            block_h=128, block_t=256, interpret=True,
        )
        # float rounding at the cos==thresh boundary may flip a rare vote
        # (the kernel folds thresh²·‖d‖² into the matmul operands, so its
        # boundary rounding differs from the oracle's by ≤1 count);
        # allow off-by-one on <0.4% of entries, exact elsewhere
        diff = np.abs(np.asarray(got) - np.asarray(expect))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 4e-3

    def test_zero_norm_directions_excluded(self, rng):
        direct, coords, valid, hyp = self._problem(rng, 128, 2, 64)
        direct = direct.at[5].set(0.0)  # zero-norm direction → never inlier
        expect = jnp.sum(
            _inlier_mask(hyp, direct, coords, valid, 0.9), -1, dtype=jnp.int32
        )
        got = count_inliers_pallas(
            direct, coords, valid, hyp, 0.9,
            block_h=128, block_t=128, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
