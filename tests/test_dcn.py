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
