"""Decode-stack accuracy on a ground-truth vertex field at full resolution.

Separates decode correctness from training quality: if the network head
were perfect, the full voting decode (foreground sampling → rolled
hypothesis pairing → Pallas/XLA inlier counting → winner refit) must
recover the keypoints to sub-pixel accuracy. This is the decode-side half
of the reference's accuracy claim (ref lib/evaluators/linemod/pvnet.py:
207-227 reaches 92.4% ADD *through this decode*), checked without any
trained weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clean_pvnet_tpu.ops.voting import ransac_vote, ransac_vote_with_cov


def _gt_problem(hw=(240, 320), vn=9, seed=0):
    rng = np.random.RandomState(seed)
    h, w = hw
    # compact elliptical foreground blob, LINEMOD-like coverage (~5%)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = h * 0.55, w * 0.45
    mask = (((xx - cx) / (w * 0.11)) ** 2
            + ((yy - cy) / (h * 0.13)) ** 2 < 1.0).astype(np.float32)
    kpts = np.stack(
        [rng.uniform(w * 0.3, w * 0.7, vn), rng.uniform(h * 0.3, h * 0.7, vn)],
        -1,
    ).astype(np.float32)
    dirs = kpts[None, None] - np.stack([xx, yy], -1)[:, :, None, :]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-9
    return mask, dirs.astype(np.float32), kpts


class TestGtFieldDecode:
    def test_standard_decode_subpixel(self):
        mask, dirs, kpts = _gt_problem()
        res = ransac_vote(jnp.asarray(mask), jnp.asarray(dirs),
                          jax.random.PRNGKey(0))
        err = np.linalg.norm(np.asarray(res.kpt_2d) - kpts, axis=-1)
        assert bool(res.valid)
        assert err.max() < 0.5, err

    def test_covariance_decode_subpixel_and_tight(self):
        mask, dirs, kpts = _gt_problem(seed=1)
        res, cov = ransac_vote_with_cov(
            jnp.asarray(mask), jnp.asarray(dirs), jax.random.PRNGKey(1),
            max_pixels=2048, cov_hypotheses=1024,
        )
        err = np.linalg.norm(np.asarray(res.kpt_2d) - kpts, axis=-1)
        assert bool(res.valid)
        assert err.max() < 0.5, err
        # a perfect field concentrates the voting distribution: the
        # covariance eigenvalues stay within a few pixels^2
        eig = np.linalg.eigvalsh(np.asarray(cov))
        assert eig.max() < 25.0, eig.max()

    def test_approx_fg_decode_subpixel(self):
        mask, dirs, kpts = _gt_problem(seed=2)
        res = ransac_vote(jnp.asarray(mask), jnp.asarray(dirs),
                          jax.random.PRNGKey(2), approx_fg=True)
        err = np.linalg.norm(np.asarray(res.kpt_2d) - kpts, axis=-1)
        assert bool(res.valid)
        assert err.max() < 0.5, err
