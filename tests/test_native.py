"""Native hostops (C++/ctypes) vs numpy-oracle parity."""

import numpy as np
import pytest

from clean_pvnet_tpu import native
from clean_pvnet_tpu.utils.image import _invert_affine, rotation_matrix_2d
from clean_pvnet_tpu.geometry.fps import farthest_point_sampling_np

needs_native = pytest.mark.skipif(native.lib() is None, reason="no g++")


def numpy_warp_linear(img, Minv, out_hw, border=0.0):
    th, tw = out_hw
    xs, ys = np.meshgrid(np.arange(tw, dtype=np.float64),
                         np.arange(th, dtype=np.float64))
    sx = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    sy = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx, fy = sx - x0, sy - y0
    h, w = img.shape[:2]
    imgf = img.astype(np.float64)
    if imgf.ndim == 2:
        imgf = imgf[..., None]

    def sample(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        v = imgf[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
        return np.where(valid[..., None], v, border)

    out = (
        sample(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
        + sample(y0, x0 + 1) * (fx * (1 - fy))[..., None]
        + sample(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
        + sample(y0 + 1, x0 + 1) * (fx * fy)[..., None]
    )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


@needs_native
class TestNativeWarp:
    def test_bilinear_matches_numpy(self, rng):
        img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
        M = rotation_matrix_2d((26, 18), 23.0)
        Minv = _invert_affine(M)
        got = native.warp_affine_u8(img, Minv, (40, 50))
        expect = numpy_warp_linear(img, Minv, (40, 50))
        # rounding at .5 boundaries may differ by 1
        diff = np.abs(got.astype(int) - expect.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.02

    def test_nearest_matches_numpy(self, rng):
        mask = (rng.rand(30, 40) > 0.5).astype(np.uint8)
        M = rotation_matrix_2d((20, 15), -14.0)
        Minv = _invert_affine(M)
        got = native.warp_affine_nearest_u8(mask, Minv, (30, 40))
        xs, ys = np.meshgrid(np.arange(40, dtype=float), np.arange(30, dtype=float))
        sx = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
        sy = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
        xi = np.round(sx).astype(int)
        yi = np.round(sy).astype(int)
        valid = (xi >= 0) & (xi < 40) & (yi >= 0) & (yi < 30)
        expect = np.where(
            valid, mask[np.clip(yi, 0, 29), np.clip(xi, 0, 39)], 0
        ).astype(np.uint8)
        np.testing.assert_array_equal(got, expect)


@needs_native
class TestNativeVertex:
    def test_matches_numpy_oracle(self, rng):
        h, w, k = 48, 64, 9
        mask = (rng.rand(h, w) > 0.6).astype(np.uint8)
        kpt = (rng.rand(k, 2) * [w, h]).astype(np.float32)
        got = native.compute_vertex_f32(mask, kpt)

        xy = np.argwhere(mask == 1)[:, [1, 0]]
        diff = kpt[None] - xy[:, None]
        norm = np.linalg.norm(diff, axis=2, keepdims=True)
        norm[norm < 1e-3] += 1e-3
        expect = np.zeros([h, w, k, 2], np.float32)
        expect[xy[:, 1], xy[:, 0]] = diff / norm
        np.testing.assert_allclose(got, expect.reshape(h, w, k * 2), atol=1e-5)


@needs_native
class TestNativeFPS:
    def test_matches_numpy(self, rng):
        pts = rng.randn(800, 3).astype(np.float32)
        got = native.fps_f32(pts, 8)
        expect = farthest_point_sampling_np(pts, 8)
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_init_center(self, rng):
        pts = rng.randn(300, 3).astype(np.float32)
        got = native.fps_f32(pts, 6, init_center=True)
        expect = farthest_point_sampling_np(pts, 6, init_center=True)
        np.testing.assert_allclose(got, expect, atol=1e-6)
