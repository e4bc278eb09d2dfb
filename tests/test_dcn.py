import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clean_pvnet_tpu.ops.dcn import DCN, deform_conv2d, _bilinear_gather


class TestBilinearGather:
    def test_integer_coords_exact(self, rng):
        feat = jnp.asarray(rng.rand(8, 10, 4), jnp.float32)
        ys = jnp.asarray([0.0, 3.0, 7.0])
        xs = jnp.asarray([0.0, 5.0, 9.0])
        out = _bilinear_gather(feat, ys, xs)
        np.testing.assert_allclose(out[0], feat[0, 0], atol=1e-6)
        np.testing.assert_allclose(out[1], feat[3, 5], atol=1e-6)
        np.testing.assert_allclose(out[2], feat[7, 9], atol=1e-6)

    def test_midpoint_interpolation(self, rng):
        feat = jnp.asarray(rng.rand(4, 4, 2), jnp.float32)
        out = _bilinear_gather(feat, jnp.asarray([1.5]), jnp.asarray([2.5]))
        expect = (feat[1, 2] + feat[1, 3] + feat[2, 2] + feat[2, 3]) / 4
        np.testing.assert_allclose(out[0], expect, atol=1e-6)

    def test_out_of_range_zero(self, rng):
        feat = jnp.ones((4, 4, 1), jnp.float32)
        out = _bilinear_gather(feat, jnp.asarray([-5.0, 10.0]), jnp.asarray([0.0, 0.0]))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)


class TestDeformConv:
    def test_zero_offset_equals_regular_conv(self, rng):
        """The gradcheck-equivalence test the reference ships
        (ref lib/csrc/dcn_v2/test.py zero-offset check): with zero offsets
        and mask==1, DCNv2 must equal a standard conv."""
        b, h, w, c, cout, k = 2, 8, 8, 4, 6, 3
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        weight = jnp.asarray(rng.randn(k, k, c, cout) * 0.1, jnp.float32)
        offset = jnp.zeros((b, h, w, 2 * k * k))
        mask = jnp.ones((b, h, w, k * k))
        out = deform_conv2d(x, offset, mask, weight, padding=1)

        ref = jax.lax.conv_general_dilated(
            x, weight, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_integer_offset_shifts_sampling(self, rng):
        # a uniform (0, +1) offset on all taps == conv over x shifted left
        b, h, w, c, cout, k = 1, 10, 10, 2, 3, 3
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        weight = jnp.asarray(rng.randn(k, k, c, cout) * 0.1, jnp.float32)
        offset = jnp.zeros((b, h, w, k * k, 2)).at[..., 1].set(1.0).reshape(
            b, h, w, 2 * k * k
        )
        mask = jnp.ones((b, h, w, k * k))
        out = deform_conv2d(x, offset, mask, weight, padding=1)

        x_shift = jnp.concatenate([x[:, :, 1:], jnp.zeros((b, h, 1, c))], 2)
        ref = jax.lax.conv_general_dilated(
            x_shift, weight, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # interior matches exactly; border differs due to zero-padding overlap
        np.testing.assert_allclose(out[:, 1:-1, 1:-2], ref[:, 1:-1, 1:-2], atol=1e-4)

    def test_mask_scales_contribution(self, rng):
        b, h, w, c, cout, k = 1, 6, 6, 2, 2, 3
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        weight = jnp.asarray(rng.randn(k, k, c, cout) * 0.1, jnp.float32)
        offset = jnp.zeros((b, h, w, 2 * k * k))
        out_half = deform_conv2d(x, offset, jnp.full((b, h, w, k * k), 0.5), weight)
        out_full = deform_conv2d(x, offset, jnp.ones((b, h, w, k * k)), weight)
        np.testing.assert_allclose(out_half, out_full * 0.5, atol=1e-5)

    def test_gradients_flow(self, rng):
        b, h, w, c, cout, k = 1, 6, 6, 2, 2, 3
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        weight = jnp.asarray(rng.randn(k, k, c, cout) * 0.1, jnp.float32)
        offset = jnp.asarray(rng.randn(b, h, w, 2 * k * k) * 0.3, jnp.float32)
        mask = jnp.ones((b, h, w, k * k)) * 0.7

        def loss(x, offset, mask, weight):
            return jnp.sum(deform_conv2d(x, offset, mask, weight) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).max()) > 0

    def test_strided(self, rng):
        x = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
        weight = jnp.asarray(rng.randn(3, 3, 3, 4) * 0.1, jnp.float32)
        offset = jnp.zeros((1, 8, 8, 18))
        mask = jnp.ones((1, 8, 8, 9))
        out = deform_conv2d(x, offset, mask, weight, stride=2, padding=1)
        assert out.shape == (1, 4, 4, 4)


class TestDCNModule:
    def test_zero_init_equals_plain_conv_path(self, rng):
        """At init the offset/mask conv is zeroed (ref dcn_v2.py:115-117), so
        the layer behaves as a plain conv with sigmoid(0)=0.5 modulation."""
        x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
        layer = DCN(features=6)
        variables = layer.init(jax.random.PRNGKey(0), x)
        out = layer.apply(variables, x)
        w = variables["params"]["weight"]
        ref = (
            jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            * 0.5
            + variables["params"]["bias"]
        )
        np.testing.assert_allclose(out, ref, atol=1e-4)


def _psroi_oracle(feat, rois, trans, pooled, scale, spp, trans_std):
    """Literal numpy re-implementation of the reference CUDA kernel loop
    (ref dcn_v2_psroi_pooling_cuda.cu:78-146, group_size=1, one class)."""
    n = rois.shape[0]
    _, H, W, C = feat.shape
    out = np.zeros((n, pooled, pooled, C), np.float32)

    def round_c(x):  # C round(): half-away-from-zero, not Python/banker's
        return np.sign(x) * np.floor(np.abs(x) + 0.5)

    for i in range(n):
        b = int(rois[i, 0])
        sw = round_c(rois[i, 1]) * scale - 0.5
        sh = round_c(rois[i, 2]) * scale - 0.5
        ew = (round_c(rois[i, 3]) + 1.0) * scale - 0.5
        eh = (round_c(rois[i, 4]) + 1.0) * scale - 0.5
        rw = max(ew - sw, 0.1)
        rh = max(eh - sh, 0.1)
        bw, bh = rw / pooled, rh / pooled
        sbw, sbh = bw / spp, bh / spp
        for ph in range(pooled):
            for pw in range(pooled):
                tx = trans[i, 0, ph, pw] * trans_std
                ty = trans[i, 1, ph, pw] * trans_std
                ws = pw * bw + sw + tx * rw
                hs = ph * bh + sh + ty * rh
                acc = np.zeros(C, np.float32)
                cnt = 0
                for ih in range(spp):
                    for iw in range(spp):
                        w = ws + iw * sbw
                        h = hs + ih * sbh
                        if w < -0.5 or w > W - 0.5 or h < -0.5 or h > H - 0.5:
                            continue
                        w = min(max(w, 0.0), W - 1.0)
                        h = min(max(h, 0.0), H - 1.0)
                        x1, y1 = int(np.floor(w)), int(np.floor(h))
                        x2, y2 = int(np.ceil(w)), int(np.ceil(h))
                        dx, dy = w - x1, h - y1
                        acc += (
                            (1 - dx) * (1 - dy) * feat[b, y1, x1]
                            + (1 - dx) * dy * feat[b, y2, x1]
                            + dx * (1 - dy) * feat[b, y1, x2]
                            + dx * dy * feat[b, y2, x2]
                        )
                        cnt += 1
                out[i, ph, pw] = acc / cnt if cnt else 0.0
    return out


class TestDeformPSROIPool:
    @pytest.mark.parametrize("spp", [1, 4])
    def test_matches_cuda_oracle(self, rng, spp):
        from clean_pvnet_tpu.ops.dcn import deform_psroi_pool

        feat = rng.rand(2, 12, 16, 5).astype(np.float32)
        rois = np.array(
            [
                [0, 2.0, 3.0, 30.0, 20.0],    # image-coord box, scale 0.5
                [1, 0.0, 0.0, 10.0, 10.0],
                [0, 20.0, 12.0, 40.0, 28.0],  # extends past the right edge
                [1, 2.5, 3.5, 28.5, 19.5],    # .5 coords: C round() vs banker's
            ],
            np.float32,
        )
        trans = (rng.randn(4, 2, 3, 3) * 0.5).astype(np.float32)
        got = deform_psroi_pool(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(trans),
            pooled_size=3, spatial_scale=0.5, sample_per_part=spp,
            trans_std=0.2,
        )
        want = _psroi_oracle(feat, rois, trans, 3, 0.5, spp, 0.2)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_gradients_flow(self, rng):
        from clean_pvnet_tpu.ops.dcn import deform_psroi_pool

        feat = jnp.asarray(rng.rand(1, 8, 8, 3), jnp.float32)
        rois = jnp.asarray([[0, 1.0, 1.0, 6.0, 6.0]], jnp.float32)
        trans = jnp.asarray(rng.randn(1, 2, 2, 2) * 0.1, jnp.float32)

        def loss(f, t):
            return deform_psroi_pool(
                f, rois, t, pooled_size=2, spatial_scale=1.0,
                sample_per_part=2, trans_std=0.1,
            ).sum()

        gf, gt = jax.grad(loss, argnums=(0, 1))(feat, trans)
        assert np.isfinite(np.asarray(gf)).all()
        assert float(jnp.abs(gf).max()) > 0
        assert np.isfinite(np.asarray(gt)).all()


class TestDCNPoolingModule:
    def test_zero_init_is_masked_average_pool(self, rng):
        """At init the offset/mask head is zeroed (ref dcn_v2.py:256-257):
        offsets are 0 and mask is sigmoid(0)=0.5, so the module equals the
        plain no-trans pooling halved."""
        from clean_pvnet_tpu.ops.dcn import DCNPooling, deform_psroi_pool

        feat = jnp.asarray(rng.rand(1, 16, 16, 4), jnp.float32)
        rois = jnp.asarray([[0, 4.0, 4.0, 24.0, 24.0]], jnp.float32)
        layer = DCNPooling(pooled_size=3, spatial_scale=0.5, deform_fc_dim=32)
        variables = layer.init(jax.random.PRNGKey(0), feat, rois)
        out = layer.apply(variables, feat, rois)
        base = deform_psroi_pool(
            feat, rois, None, pooled_size=3, spatial_scale=0.5,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base) * 0.5, atol=1e-5
        )
