import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clean_pvnet_tpu.geometry import compute_vertex_field_np
from clean_pvnet_tpu.ops.voting import (
    estimate_voting_distribution,
    generate_hypotheses,
    ransac_vote,
    select_foreground,
    _count_inliers_chunked,
    _inlier_mask,
)


def oracle_generate_hypothesis(direct, coords, idxs):
    """numpy re-implementation of ref ransac_voting_kernel.cu:11-49."""
    hn, vn, _ = idxs.shape
    out = np.zeros((hn, vn, 2), np.float32)
    for hi in range(hn):
        for vi in range(vn):
            t0, t1 = idxs[hi, vi]
            nx0, ny0 = direct[t0, vi, 1], -direct[t0, vi, 0]
            cx0, cy0 = coords[t0]
            nx1, ny1 = direct[t1, vi, 1], -direct[t1, vi, 0]
            cx1, cy1 = coords[t1]
            if abs(nx1 * ny0 - nx0 * ny1) < 1e-6:
                continue
            if abs(ny1 * nx0 - ny0 * nx1) < 1e-6:
                continue
            y = (nx1 * (nx0 * cx0 + ny0 * cy0) - nx0 * (nx1 * cx1 + ny1 * cy1)) / (
                nx1 * ny0 - nx0 * ny1
            )
            x = (ny1 * (nx0 * cx0 + ny0 * cy0) - ny0 * (nx1 * cx1 + ny1 * cy1)) / (
                ny1 * nx0 - ny0 * nx1
            )
            out[hi, vi] = (x, y)
    return out


def oracle_voting(direct, coords, hypo, thresh):
    """numpy re-implementation of ref ransac_voting_kernel.cu:88-126."""
    hn, vn, _ = hypo.shape
    tn = coords.shape[0]
    inl = np.zeros((hn, vn, tn), np.uint8)
    for hi in range(hn):
        for vi in range(vn):
            for ti in range(tn):
                cx, cy = coords[ti]
                hx, hy = hypo[hi, vi]
                nx, ny = direct[ti, vi]
                dx, dy = hx - cx, hy - cy
                n1 = np.sqrt(nx * nx + ny * ny)
                n2 = np.sqrt(dx * dx + dy * dy)
                if n1 < 1e-6 or n2 < 1e-6:
                    continue
                if (dx * nx + dy * ny) / (n1 * n2) > thresh:
                    inl[hi, vi, ti] = 1
    return inl


def make_scene(rng, h=64, w=64, vn=3, blob=20):
    """Synthetic mask + perfect vertex field toward known keypoints."""
    mask = np.zeros((h, w), np.uint8)
    mask[10 : 10 + blob, 14 : 14 + blob] = 1
    kpt = np.stack(
        [rng.rand(vn) * w * 0.8 + w * 0.1, rng.rand(vn) * h * 0.8 + h * 0.1], -1
    ).astype(np.float32)
    vertex = compute_vertex_field_np(mask, kpt).reshape(h, w, vn, 2)
    return mask, vertex, kpt


class TestSelectForeground:
    def test_selects_only_foreground(self, rng):
        mask = (rng.rand(32, 32) > 0.8).astype(np.uint8)
        coords, idx, valid = select_foreground(
            jnp.asarray(mask), jax.random.PRNGKey(0), 64
        )
        coords, valid = np.asarray(coords), np.asarray(valid)
        n_fg = int(mask.sum())
        assert valid.sum() == min(n_fg, 64)
        # valid entries front-packed and actually on the mask
        assert valid[: valid.sum()].all()
        for x, y in coords[valid]:
            assert mask[int(y), int(x)] == 1

    def test_budget_cap(self, rng):
        mask = np.ones((32, 32), np.uint8)
        _, _, valid = select_foreground(jnp.asarray(mask), jax.random.PRNGKey(1), 100)
        assert int(np.asarray(valid).sum()) == 100

    def test_strided_selects_only_foreground_one_per_block(self, rng):
        mask = (rng.rand(32, 32) > 0.8).astype(np.uint8)
        coords, idx, valid = select_foreground(
            jnp.asarray(mask), jax.random.PRNGKey(2), 64, stride_block=4
        )
        coords = np.asarray(coords)[np.asarray(valid)]
        idx = np.asarray(idx)[np.asarray(valid)]
        for x, y in coords:
            assert mask[int(y), int(x)] == 1
        # spatial stratification: at most one selected pixel per 4-block
        blocks = idx // 4
        assert len(blocks) == len(set(blocks.tolist()))
        # valid count = number of 4-blocks containing foreground (≤ budget)
        fg_blocks = (mask.reshape(-1).reshape(-1, 4).sum(-1) > 0).sum()
        assert len(idx) == min(int(fg_blocks), 64)

    def test_strided_full_mask_hits_budget(self, rng):
        mask = np.ones((32, 32), np.uint8)
        _, _, valid = select_foreground(
            jnp.asarray(mask), jax.random.PRNGKey(3), 100, stride_block=4
        )
        assert int(np.asarray(valid).sum()) == 100


class TestHypotheses:
    def test_matches_cuda_oracle(self, rng):
        tn, vn, hn = 40, 3, 16
        coords = (rng.rand(tn, 2) * 64).astype(np.float32)
        direct = rng.randn(tn, vn, 2).astype(np.float32)
        direct /= np.linalg.norm(direct, axis=-1, keepdims=True)
        idxs = rng.randint(0, tn, (hn, vn, 2)).astype(np.int32)
        expect = oracle_generate_hypothesis(direct, coords, idxs)
        got = np.asarray(
            generate_hypotheses(jnp.asarray(direct), jnp.asarray(coords), jnp.asarray(idxs))
        )
        np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-2)

    def test_perfect_field_intersects_at_keypoint(self, rng):
        mask, vertex, kpt = make_scene(rng)
        coords, idx, valid = select_foreground(
            jnp.asarray(mask), jax.random.PRNGKey(0), 128
        )
        direct = jnp.asarray(vertex).reshape(-1, 3, 2)[idx]
        idxs = rng.randint(0, int(np.asarray(valid).sum()), (32, 3, 2)).astype(np.int32)
        hyp = np.asarray(generate_hypotheses(direct, coords, jnp.asarray(idxs)))
        # non-degenerate hypotheses should be near the true keypoints
        for vi in range(3):
            good = np.abs(hyp[:, vi]).sum(-1) > 1e-6
            assert good.sum() > 10
            err = np.linalg.norm(hyp[good, vi] - kpt[vi], axis=-1)
            assert np.median(err) < 1.0


class TestInlierCounting:
    def test_matches_cuda_oracle(self, rng):
        tn, vn, hn = 30, 3, 8
        coords = (rng.rand(tn, 2) * 64).astype(np.float32)
        direct = rng.randn(tn, vn, 2).astype(np.float32)
        direct /= np.linalg.norm(direct, axis=-1, keepdims=True)
        hypo = (rng.rand(hn, vn, 2) * 64).astype(np.float32)
        expect = oracle_voting(direct, coords, hypo, 0.9)
        got = np.asarray(
            _inlier_mask(
                jnp.asarray(hypo),
                jnp.asarray(direct),
                jnp.asarray(coords),
                jnp.ones((tn,), bool),
                0.9,
            )
        )
        np.testing.assert_array_equal(got.astype(np.uint8), expect)

    def test_chunked_matches_dense(self, rng):
        tn, vn, hn = 50, 3, 32
        coords = (rng.rand(tn, 2) * 64).astype(np.float32)
        direct = rng.randn(tn, vn, 2).astype(np.float32)
        hypo = (rng.rand(hn, vn, 2) * 64).astype(np.float32)
        valid = jnp.asarray(rng.rand(tn) > 0.2)
        dense = jnp.sum(
            _inlier_mask(jnp.asarray(hypo), jnp.asarray(direct), jnp.asarray(coords), valid, 0.95),
            -1,
            dtype=jnp.int32,
        )
        chunked = _count_inliers_chunked(
            jnp.asarray(hypo), jnp.asarray(direct), jnp.asarray(coords), valid, 0.95, 8
        )
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(chunked))


class TestRansacVote:
    def test_recovers_keypoints_perfect_field(self, rng):
        mask, vertex, kpt = make_scene(rng, vn=9)
        res = ransac_vote(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(0),
            num_hypotheses=128, max_pixels=128,
        )
        assert bool(res.valid)
        err = np.linalg.norm(np.asarray(res.kpt_2d) - kpt, axis=-1)
        assert err.max() < 0.5, err

    def test_noisy_field(self, rng):
        mask, vertex, kpt = make_scene(rng, vn=9, blob=30)
        noisy = vertex + rng.randn(*vertex.shape).astype(np.float32) * 0.05
        noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True) + 1e-9
        noisy *= mask[..., None, None]
        res = ransac_vote(
            jnp.asarray(mask), jnp.asarray(noisy), jax.random.PRNGKey(0),
            num_hypotheses=256, max_pixels=256, inlier_thresh=0.99,
        )
        err = np.linalg.norm(np.asarray(res.kpt_2d) - kpt, axis=-1)
        assert np.median(err) < 2.0, err

    def test_outlier_pixels_rejected(self, rng):
        # corrupt 30% of foreground directions; RANSAC must still find kpts
        mask, vertex, kpt = make_scene(rng, vn=4, blob=30)
        bad = rng.rand(*mask.shape) < 0.3
        noise = rng.randn(*vertex.shape).astype(np.float32)
        noise /= np.linalg.norm(noise, axis=-1, keepdims=True)
        vertex = np.where((bad & (mask == 1))[..., None, None], noise, vertex)
        res = ransac_vote(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(3),
            num_hypotheses=256, max_pixels=256,
        )
        err = np.linalg.norm(np.asarray(res.kpt_2d) - kpt, axis=-1)
        assert err.max() < 1.5, err

    def test_empty_mask_returns_zeros(self, rng):
        mask = np.zeros((32, 32), np.uint8)
        vertex = np.zeros((32, 32, 9, 2), np.float32)
        res = ransac_vote(jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(0))
        assert not bool(res.valid)
        np.testing.assert_allclose(np.asarray(res.kpt_2d), 0.0)

    def test_tiny_mask_below_min(self, rng):
        mask = np.zeros((32, 32), np.uint8)
        mask[5, 5] = 1
        mask[6, 6] = 1
        vertex = np.zeros((32, 32, 9, 2), np.float32)
        res = ransac_vote(jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(0))
        assert not bool(res.valid)

    def test_adaptive_rounds_early_exit_on_easy_image(self, rng):
        # perfect field → round-1 winner ratio ≈ 1 → confidence met after one
        # round, so the num_rounds=20 while_loop must match num_rounds=1 bitwise
        mask, vertex, kpt = make_scene(rng, vn=9)
        args = (jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(0))
        one = ransac_vote(*args, num_hypotheses=64, max_pixels=128, num_rounds=1)
        many = ransac_vote(*args, num_hypotheses=64, max_pixels=128, num_rounds=20)
        np.testing.assert_array_equal(np.asarray(one.kpt_2d), np.asarray(many.kpt_2d))

    def test_adaptive_rounds_help_hard_image(self, rng):
        # 60% corrupted directions + tiny per-round budget: a single round of
        # 16 hypotheses often misses; 20 adaptive rounds must not be worse
        mask, vertex, kpt = make_scene(rng, vn=6, blob=30)
        bad = rng.rand(*mask.shape) < 0.6
        noise = rng.randn(*vertex.shape).astype(np.float32)
        noise /= np.linalg.norm(noise, axis=-1, keepdims=True)
        vertex = np.where((bad & (mask == 1))[..., None, None], noise, vertex)
        args = (jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(5))
        one = ransac_vote(*args, num_hypotheses=16, max_pixels=256, num_rounds=1)
        many = ransac_vote(*args, num_hypotheses=16, max_pixels=256, num_rounds=20)
        err1 = np.linalg.norm(np.asarray(one.kpt_2d) - kpt, axis=-1)
        err20 = np.linalg.norm(np.asarray(many.kpt_2d) - kpt, axis=-1)
        assert err20.max() < 1.5, (err1, err20)
        assert np.median(err20) <= np.median(err1) + 0.5

    def test_adaptive_rounds_vmap(self, rng):
        # the while_loop decode must stay correct under vmap (batched images
        # exit at different rounds)
        scenes = [make_scene(rng, vn=4) for _ in range(2)]
        masks = jnp.stack([jnp.asarray(s[0]) for s in scenes])
        verts = jnp.stack([jnp.asarray(s[1]) for s in scenes])
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        res = jax.vmap(
            lambda m, v, k: ransac_vote(
                m, v, k, num_hypotheses=64, max_pixels=128, num_rounds=8
            )
        )(masks, verts, keys)
        for i, (_, _, kpt) in enumerate(scenes):
            err = np.linalg.norm(np.asarray(res.kpt_2d[i]) - kpt, axis=-1)
            assert err.max() < 0.5

    def test_batch_vmap(self, rng):
        scenes = [make_scene(rng, vn=9) for _ in range(3)]
        masks = jnp.stack([jnp.asarray(s[0]) for s in scenes])
        verts = jnp.stack([jnp.asarray(s[1]) for s in scenes])
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        res = jax.vmap(
            lambda m, v, k: ransac_vote(m, v, k, num_hypotheses=128, max_pixels=128)
        )(masks, verts, keys)
        for i, (_, _, kpt) in enumerate(scenes):
            err = np.linalg.norm(np.asarray(res.kpt_2d[i]) - kpt, axis=-1)
            assert err.max() < 0.5


class TestFusedVoteWithCov:
    def test_recovers_keypoints_and_tight_cov_on_perfect_field(self, rng):
        from clean_pvnet_tpu.ops.voting import ransac_vote_with_cov

        mask, vertex, kpt = make_scene(rng, vn=4, blob=30)
        res, cov = ransac_vote_with_cov(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(0),
            num_hypotheses=128, max_pixels=512, cov_hypotheses=256,
        )
        assert bool(res.valid)
        err = np.linalg.norm(np.asarray(res.kpt_2d) - kpt, axis=-1)
        assert err.max() < 0.5, err
        # perfect field → hypothesis population is a point mass → tiny cov
        assert np.abs(np.asarray(cov)).max() < 0.5

    def test_cov_grows_with_noise(self, rng):
        from clean_pvnet_tpu.ops.voting import ransac_vote_with_cov

        mask, vertex, kpt = make_scene(rng, vn=2, blob=30)
        noisy = vertex + rng.randn(*vertex.shape).astype(np.float32) * 0.1
        noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True) + 1e-9
        noisy *= mask[..., None, None]
        args = (jnp.asarray(mask), jax.random.PRNGKey(1))
        _, cov_clean = ransac_vote_with_cov(
            args[0], jnp.asarray(vertex), args[1],
            num_hypotheses=128, max_pixels=512, cov_hypotheses=512,
        )
        _, cov_noisy = ransac_vote_with_cov(
            args[0], jnp.asarray(noisy), args[1],
            num_hypotheses=128, max_pixels=512, cov_hypotheses=512,
        )
        tr_clean = np.trace(np.asarray(cov_clean), axis1=-2, axis2=-1)
        tr_noisy = np.trace(np.asarray(cov_noisy), axis1=-2, axis2=-1)
        assert (tr_noisy > tr_clean).all(), (tr_clean, tr_noisy)

    def test_cov_pixel_subsample_matches_full(self, rng):
        # cov_pixels counts inliers over a uniform prefix subsample; the
        # ratio weights are unbiased, so the covariance should agree with
        # the full-pixel count within sampling noise (serving default 2048
        # of 8192 — here 128 of 512 on a noisy field).
        from clean_pvnet_tpu.ops.voting import ransac_vote_with_cov

        mask, vertex, kpt = make_scene(rng, vn=2, blob=30)
        noisy = vertex + rng.randn(*vertex.shape).astype(np.float32) * 0.08
        noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True) + 1e-9
        noisy *= mask[..., None, None]
        res_full, cov_full = ransac_vote_with_cov(
            jnp.asarray(mask), jnp.asarray(noisy), jax.random.PRNGKey(2),
            num_hypotheses=128, max_pixels=512, cov_hypotheses=512,
        )
        res_sub, cov_sub = ransac_vote_with_cov(
            jnp.asarray(mask), jnp.asarray(noisy), jax.random.PRNGKey(2),
            num_hypotheses=128, max_pixels=512, cov_hypotheses=512,
            cov_pixels=128,
        )
        # same vote stage (subsample touches only the cov weighting) — but
        # the two results come from two separately compiled programs
        # (cov_pixels is static), so allow fusion-level reassociation
        # differences rather than asserting bit-exactness (ADVICE r3 item 3)
        np.testing.assert_allclose(
            np.asarray(res_sub.kpt_2d), np.asarray(res_full.kpt_2d),
            rtol=1e-6, atol=1e-6)
        tr_full = np.trace(np.asarray(cov_full), axis1=-2, axis2=-1)
        tr_sub = np.trace(np.asarray(cov_sub), axis1=-2, axis2=-1)
        assert np.isfinite(tr_sub).all()
        # covariance magnitude agrees within a small factor
        ratio = tr_sub / np.maximum(tr_full, 1e-9)
        assert (ratio > 0.3).all() and (ratio < 3.0).all(), ratio


    def test_cov_reuse_matches_fresh_population(self, rng):
        # cov_reuse pools the vote rounds' own hypotheses/ratios instead of
        # generating a fresh cov population; same estimator, different (and
        # smaller) sample — vote result identical, covariance magnitude
        # within sampling noise of the fresh-population estimate.
        from clean_pvnet_tpu.ops.voting import ransac_vote_with_cov

        mask, vertex, kpt = make_scene(rng, vn=2, blob=30)
        noisy = vertex + rng.randn(*vertex.shape).astype(np.float32) * 0.08
        noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True) + 1e-9
        noisy *= mask[..., None, None]
        common = dict(num_hypotheses=256, num_rounds=4, max_pixels=512)
        res_fresh, cov_fresh = ransac_vote_with_cov(
            jnp.asarray(mask), jnp.asarray(noisy), jax.random.PRNGKey(3),
            cov_hypotheses=1024, **common,
        )
        res_reuse, cov_reuse_ = ransac_vote_with_cov(
            jnp.asarray(mask), jnp.asarray(noisy), jax.random.PRNGKey(3),
            cov_reuse=True, **common,
        )
        np.testing.assert_allclose(
            np.asarray(res_reuse.kpt_2d), np.asarray(res_fresh.kpt_2d),
            rtol=1e-6, atol=1e-6)
        tr_fresh = np.trace(np.asarray(cov_fresh), axis1=-2, axis2=-1)
        tr_reuse = np.trace(np.asarray(cov_reuse_), axis1=-2, axis2=-1)
        assert np.isfinite(tr_reuse).all()
        ratio = tr_reuse / np.maximum(tr_fresh, 1e-9)
        assert (ratio > 0.3).all() and (ratio < 3.0).all(), ratio

    def test_cov_reuse_early_stop_rounds_excluded(self, rng):
        # a perfect field converges in one round; the unwritten buffer
        # rounds must not drag the pooled covariance toward the zero
        # hypothesis at (0,0)
        from clean_pvnet_tpu.ops.voting import ransac_vote_with_cov

        mask, vertex, kpt = make_scene(rng, vn=3, blob=30)
        res, cov = ransac_vote_with_cov(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(4),
            num_hypotheses=128, num_rounds=8, max_pixels=512, cov_reuse=True,
        )
        assert bool(res.valid)
        err = np.linalg.norm(np.asarray(res.kpt_2d) - kpt, axis=-1)
        assert err.max() < 0.5, err
        # point-mass population → tiny cov (would be ~|kpt|^2 if the zero
        # rows leaked into the weight window)
        assert np.abs(np.asarray(cov)).max() < 0.5


class TestVotingDistribution:
    def test_covariance_reflects_noise(self, rng):
        mask, vertex, kpt = make_scene(rng, vn=2, blob=30)
        noisy = vertex + rng.randn(*vertex.shape).astype(np.float32) * 0.08
        noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True) + 1e-9
        noisy *= mask[..., None, None]
        res = ransac_vote(
            jnp.asarray(mask), jnp.asarray(noisy), jax.random.PRNGKey(0),
            num_hypotheses=512, max_pixels=512, inlier_thresh=0.99,
        )
        mean, cov = estimate_voting_distribution(
            jnp.asarray(mask), jnp.asarray(noisy), res.mean, jax.random.PRNGKey(1),
            num_hypotheses=1024, max_pixels=512, hyp_chunk=256,
        )
        cov = np.asarray(cov)
        # SPD-ish and finite
        assert np.isfinite(cov).all()
        for vi in range(2):
            eig = np.linalg.eigvalsh(cov[vi])
            assert (eig > -1e-3).all()
            assert eig.max() < 50.0  # hypotheses cluster near the keypoint

    def test_perfect_field_tiny_covariance(self, rng):
        mask, vertex, kpt = make_scene(rng, vn=2, blob=30)
        res = ransac_vote(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(0),
            num_hypotheses=128, max_pixels=256,
        )
        _, cov = estimate_voting_distribution(
            jnp.asarray(mask), jnp.asarray(vertex), res.mean, jax.random.PRNGKey(1),
            num_hypotheses=512, max_pixels=256, hyp_chunk=128,
        )
        assert float(np.abs(np.asarray(cov)).max()) < 1.0


class TestWeightedSelection:
    def test_weights_bias_and_exclude(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from clean_pvnet_tpu.ops.voting import select_foreground

        h, w = 32, 32
        mask = jnp.ones((h, w), jnp.float32)
        # left half weight 10, right half weight 0.1, one zero-weight pixel
        weights = np.full((h, w), 0.1, np.float32)
        weights[:, : w // 2] = 10.0
        weights[0, 0] = 0.0
        hits = np.zeros((h, w))
        for s in range(20):
            coords, idx, valid = select_foreground(
                mask, jax.random.PRNGKey(s), 64, weights=jnp.asarray(weights)
            )
            c = np.asarray(coords[np.asarray(valid)]).astype(int)
            hits[c[:, 1], c[:, 0]] += 1
        left = hits[:, : w // 2].sum()
        right = hits[:, w // 2:].sum()
        assert left > 3 * right, (left, right)   # strong bias to high weight
        assert hits[0, 0] == 0                   # zero weight never sampled

    def test_uniform_when_weights_none_matches_old_contract(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from clean_pvnet_tpu.ops.voting import select_foreground

        mask = jnp.zeros((16, 16), jnp.float32).at[4:8, 4:8].set(1.0)
        coords, idx, valid = select_foreground(mask, jax.random.PRNGKey(0), 32)
        assert int(np.asarray(valid).sum()) == 16  # all 16 fg pixels selected
