"""On-device augmentation (data/augment_device.py) vs the host pipeline.

The device path must express the same augmentation family as the host one
(itself verified against the reference's semantics): same warp geometry,
keypoints consistent with pixels, blur/jitter within rounding of the host
implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
from clean_pvnet_tpu.data.augment_device import (
    affine_sample_bilinear,
    affine_sample_nearest,
    augment_batch_device,
    color_jitter_device,
    gaussian_blur_device,
    randomize_background_device,
    sample_affine,
    warp_rgb_mask_packed,
    wide_photometric_device,
)
from clean_pvnet_tpu.utils.image import (
    gaussian_blur,
    rotation_matrix_2d,
    warp_affine,
)


def _invert(M):
    A = M[:, :2]
    b = M[:, 2]
    Ai = np.linalg.inv(A)
    return np.concatenate([Ai, -Ai @ b[:, None]], -1)


class TestAffineSample:
    def test_bilinear_matches_host_warp(self, rng):
        img = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
        M = rotation_matrix_2d((25.0, 18.0), 17.0)
        host = warp_affine(img, M, (40, 56), interp="linear").astype(np.float32)
        dev = np.asarray(
            affine_sample_bilinear(
                jnp.asarray(img, jnp.float32), jnp.asarray(_invert(M), jnp.float32),
                (40, 56),
            )
        )
        # host rounds to uint8; device stays float
        assert np.abs(dev - host).mean() < 0.6
        assert np.median(np.abs(dev - host)) <= 0.5

    def test_nearest_matches_host_warp(self, rng):
        mask = (rng.rand(40, 56) > 0.6).astype(np.uint8)
        M = rotation_matrix_2d((30.0, 20.0), -23.0)
        host = warp_affine(mask, M, (40, 56), interp="nearest")
        dev = np.asarray(
            affine_sample_nearest(
                jnp.asarray(mask, jnp.int32), jnp.asarray(_invert(M), jnp.float32),
                (40, 56),
            )
        )
        # rounding ties at half-pixels may differ on a sparse boundary set
        assert (dev != host).mean() < 0.02


class TestPackedWarp:
    def test_packed_matches_taps(self, rng):
        """The single-gather packed warp must reproduce the 4-tap bilinear
        formulation bit-exactly on the image and (up to .5-rounding ties)
        the nearest mask, including out-of-frame fill regions."""
        h, w = 48, 64
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        mask = (rng.rand(h, w) > 0.6).astype(np.uint8)
        for deg, sc, tx in ((17.0, 1.1, -9.0), (-31.0, 0.8, 20.0)):
            M = rotation_matrix_2d((w / 2, h / 2), deg)
            M[:, :2] *= sc
            M[0, 2] += tx
            Ai = jnp.asarray(_invert(M), jnp.float32)
            ref_img = affine_sample_bilinear(
                jnp.asarray(img, jnp.float32), Ai, (h, w))
            ref_m = affine_sample_nearest(jnp.asarray(mask, jnp.int32), Ai, (h, w))
            got_img, got_m = warp_rgb_mask_packed(
                jnp.asarray(img), jnp.asarray(mask), Ai, (h, w))
            np.testing.assert_array_equal(np.asarray(got_img), np.asarray(ref_img))
            assert (np.asarray(got_m) != np.asarray(ref_m)).mean() < 0.01


class TestDomainRandomization:
    def test_bg_replaces_only_background(self, rng):
        b, h, w = 4, 32, 48
        img = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.float32))
        mask = jnp.asarray((rng.rand(b, h, w) > 0.5).astype(np.int32))
        out = randomize_background_device(
            jax.random.PRNGKey(0), img, mask, p=1.0)
        fg = np.asarray(mask)[..., None].astype(bool)
        np.testing.assert_array_equal(
            np.asarray(out)[np.broadcast_to(fg, out.shape)],
            np.asarray(img)[np.broadcast_to(fg, img.shape)])
        # backgrounds actually changed for (almost) every sample
        bg_changed = [
            np.abs(np.asarray(out)[i][~fg[i, ..., 0]]
                   - np.asarray(img)[i][~fg[i, ..., 0]]).max() > 1.0
            for i in range(b)
        ]
        assert all(bg_changed), bg_changed

    def test_bg_p_zero_is_identity(self, rng):
        b, h, w = 2, 16, 24
        img = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.float32))
        mask = jnp.zeros((b, h, w), jnp.int32)
        out = randomize_background_device(
            jax.random.PRNGKey(1), img, mask, p=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_wide_photometric_range_and_identity(self, rng):
        b, h, w = 4, 16, 24
        img = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.float32))
        out = wide_photometric_device(jax.random.PRNGKey(2), img, p=1.0)
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 255.0
        assert np.abs(o - np.asarray(img)).mean() > 1.0  # actually shifted
        same = wide_photometric_device(jax.random.PRNGKey(2), img, p=0.0)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(img))

    def test_batch_augment_with_domain_flags(self, rng):
        from clean_pvnet_tpu.config import Config

        cfg = Config().with_overrides(
            {"train.bg_randomize": 0.5, "train.wide_photometric": 0.5}
        ).train
        b, h, w = 2, 64, 96
        img = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.uint8))
        mask = np.zeros((b, h, w), np.uint8)
        mask[:, 20:44, 30:66] = 1
        kpt = jnp.asarray((rng.rand(b, 9, 2) * 40 + 25).astype(np.float32))
        inp, m, k = augment_batch_device(
            jax.random.PRNGKey(3), img, jnp.asarray(mask), kpt, cfg)
        assert inp.shape == (b, h, w, 3) and m.shape == (b, h, w)
        assert np.isfinite(np.asarray(inp)).all()


class TestSampleAffine:
    def test_keypoints_ride_with_pixels(self, rng):
        # place bright dots at the keypoints; after augmentation the warped
        # image's brightest pixels must sit at the transformed keypoints
        h, w = 96, 128
        mask = np.zeros((h, w), np.uint8)
        mask[30:70, 40:90] = 1
        kpt = np.array([[55.0, 45.0], [80.0, 60.0]], np.float32)
        img = np.zeros((h, w, 3), np.uint8)
        for x, y in kpt.astype(int):
            img[y, x] = 255

        cfg = Config().with_overrides(
            {"train.rotate_min": -25.0, "train.rotate_max": 25.0}
        )
        A_fwd, A_inv = sample_affine(
            jax.random.PRNGKey(3), jnp.asarray(mask), (h, w), cfg.train
        )
        warped = np.asarray(
            affine_sample_bilinear(
                jnp.asarray(img, jnp.float32), A_inv, (h, w)
            )
        )[..., 0]
        kh = np.concatenate([kpt, np.ones((2, 1), np.float32)], -1)
        kw = kh @ np.asarray(A_fwd).T
        for gt in kw:
            # nearest bright blob to this transformed keypoint
            ys, xs = np.nonzero(warped > warped.max() * 0.2)
            d = np.sqrt((xs - gt[0]) ** 2 + (ys - gt[1]) ** 2).min()
            assert d < 1.5

    def test_overlap_constraint_keeps_instance(self, rng):
        # the crop must retain part of the instance (that is the point of
        # the overlap-constrained begin, ref augmentation.py:51-57)
        h, w = 96, 128
        mask = np.zeros((h, w), np.uint8)
        mask[40:60, 50:80] = 1
        cfg = Config()
        for i in range(8):
            _, A_inv = sample_affine(
                jax.random.PRNGKey(i), jnp.asarray(mask), (h, w), cfg.train
            )
            mw = np.asarray(
                affine_sample_nearest(jnp.asarray(mask, jnp.int32), A_inv, (h, w))
            )
            assert mw.sum() > 0, i

    def test_empty_mask_identity_scale(self):
        h, w = 64, 64
        mask = np.zeros((h, w), np.uint8)
        cfg = Config()
        A_fwd, _ = sample_affine(
            jax.random.PRNGKey(0), jnp.asarray(mask), (h, w), cfg.train
        )
        A = np.asarray(A_fwd)
        # no rotation, unit scale: linear part is the identity
        np.testing.assert_allclose(A[:, :2], np.eye(2), atol=1e-5)


class TestPhotometricDevice:
    def test_blur_matches_scipy(self, rng):
        img = (rng.rand(2, 48, 64, 3) * 255).astype(np.float32)
        # force blur on sample 0 by checking both branches statistically:
        out = np.asarray(gaussian_blur_device(jax.random.PRNGKey(0), jnp.asarray(img)))
        assert out.shape == img.shape
        # device blur with a fixed sigma equals scipy within rounding
        from clean_pvnet_tpu.data import augment_device as ad

        sigma = 5.0 / 3.0
        offs = np.arange(-ad._BLUR_RADIUS, ad._BLUR_RADIUS + 1, dtype=np.float32)
        win = np.abs(offs) <= 2.0 * sigma + 0.5
        kern = np.exp(-0.5 * (offs / sigma) ** 2) * win
        kern /= kern.sum()
        x = img[0]
        xp = np.pad(x, ((ad._BLUR_RADIUS,) * 2, (0, 0), (0, 0)), mode="symmetric")
        ref = sum(kern[i] * xp[i : i + 48] for i in range(13))
        xp = np.pad(ref, ((0, 0), (ad._BLUR_RADIUS,) * 2, (0, 0)), mode="symmetric")
        ref = sum(kern[i] * xp[:, i : i + 64] for i in range(13))
        scipy_out = gaussian_blur(img[0].astype(np.uint8), sigma).astype(np.float32)
        assert np.abs(ref - scipy_out).mean() < 1.0

    def test_jitter_stays_in_range_and_perturbs(self, rng):
        img = (rng.rand(3, 32, 32, 3) * 255).astype(np.float32)
        out = np.asarray(color_jitter_device(jax.random.PRNGKey(1), jnp.asarray(img)))
        assert out.min() >= 0.0 and out.max() <= 255.0
        assert not np.allclose(out, img)
        assert np.abs(out - img).mean() < 40.0  # mild jitter, not destruction


class TestFullDeviceAugment:
    def test_shapes_dtypes_and_vertex_consistency(self, rng):
        from clean_pvnet_tpu.geometry.vertex import compute_vertex_field

        h, w, k = 64, 80, 9
        imgs = (rng.rand(2, h, w, 3) * 255).astype(np.uint8)
        masks = np.zeros((2, h, w), np.uint8)
        masks[:, 20:50, 25:60] = 1
        kpts = np.stack(
            [rng.rand(2, k) * 30 + 25, rng.rand(2, k) * 25 + 20], -1
        ).astype(np.float32)

        cfg = Config()
        inp, mask_w, kpt_w = augment_batch_device(
            jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(masks),
            jnp.asarray(kpts), cfg.train,
        )
        assert inp.shape == (2, h, w, 3) and inp.dtype == jnp.float32
        assert mask_w.shape == (2, h, w)
        assert kpt_w.shape == (2, k, 2)
        # normalized stats: roughly ImageNet-unit range
        assert float(jnp.abs(inp).max()) < 6.0
        # vertex targets derivable (the step's next stage)
        v = jax.vmap(compute_vertex_field)(mask_w, kpt_w)
        assert v.shape == (2, h, w, 2 * k)
        assert bool(jnp.isfinite(v).all())

    def test_device_matches_host_distribution_geometry(self, rng):
        """With rotation/jitter/blur disabled and ratio pinned to 1, both
        paths are pure crops; device output must equal a host crop of the
        same geometry (sanity that conventions line up end-to-end)."""
        h, w = 48, 64
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[10:40, 15:50] = 1
        kpt = np.array([[30.0, 25.0]], np.float32)
        cfg = Config().with_overrides(
            {
                "train.rotate_min": 0.0, "train.rotate_max": 0.0,
                "train.resize_ratio_min": 1.0, "train.resize_ratio_max": 1.0,
            }
        )
        A_fwd, A_inv = sample_affine(
            jax.random.PRNGKey(7), jnp.asarray(mask), (h, w), cfg.train
        )
        A = np.asarray(A_fwd)
        np.testing.assert_allclose(A[:, :2], np.eye(2), atol=1e-5)
        # pure translation by (-wbeg, -hbeg); with t == full size the begin
        # collapses to 0 → identity
        np.testing.assert_allclose(A[:, 2], 0.0, atol=1e-4)
        out = np.asarray(
            affine_sample_bilinear(jnp.asarray(img, jnp.float32), A_inv, (h, w))
        )
        np.testing.assert_allclose(out, img.astype(np.float32), atol=0.51)
