import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models import PVNet, make_network, decode_keypoints
from clean_pvnet_tpu.geometry import compute_vertex_field_np


class TestPVNetModel:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = PVNet(ver_dim=18, seg_dim=2, fc_dim=64, s8_dim=32, s4_dim=16,
                      s2_dim=8, raw_dim=8)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
        )
        return model, variables

    def test_output_shapes(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((2, 64, 96, 3)), train=False)
        assert out["seg"].shape == (2, 64, 96, 2)
        assert out["vertex"].shape == (2, 64, 96, 18)
        assert out["seg"].dtype == jnp.float32

    def test_odd_input_sizes(self, model_and_vars):
        # generalization of the reference's 136->(135,180) fixup
        # (ref resnet18.py:83-84): any size must decode to full res
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((1, 135, 180, 3)), train=False)
        assert out["seg"].shape == (1, 135, 180, 2)

    def test_batch_stats_updated_in_train(self, model_and_vars):
        model, variables = model_and_vars
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        _, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )

    def test_registry_factory(self):
        cfg = Config()
        net = make_network(cfg)
        assert isinstance(net, PVNet)
        assert net.ver_dim == 18


class TestDecodeKeypoints:
    def test_decode_perfect_outputs(self, rng):
        # build seg logits + vertex field pointing at known keypoints and
        # check the full batched decode recovers them
        h, w, vn = 64, 64, 9
        mask = np.zeros((h, w), np.uint8)
        mask[12:44, 20:52] = 1
        kpt = np.stack(
            [rng.rand(vn) * w * 0.6 + w * 0.2, rng.rand(vn) * h * 0.6 + h * 0.2], -1
        ).astype(np.float32)
        vertex = compute_vertex_field_np(mask, kpt)  # [H, W, 18]
        seg = np.stack([1.0 - 2 * mask, 2.0 * mask - 1.0], -1).astype(np.float32)

        cfg = Config()
        out = decode_keypoints(
            jnp.asarray(seg[None]),
            jnp.asarray(vertex[None]),
            jax.random.PRNGKey(0),
            cfg,
        )
        assert out["mask"].shape == (1, h, w)
        assert bool(out["valid"][0])
        err = np.linalg.norm(np.asarray(out["kpt_2d"][0]) - kpt, axis=-1)
        assert err.max() < 0.5, err

    def test_decode_un_pnp_path(self, rng):
        h, w, vn = 48, 48, 9
        mask = np.zeros((h, w), np.uint8)
        mask[8:40, 8:40] = 1
        kpt = np.stack(
            [rng.rand(vn) * w * 0.5 + w * 0.25, rng.rand(vn) * h * 0.5 + h * 0.25],
            -1,
        ).astype(np.float32)
        vertex = compute_vertex_field_np(mask, kpt)
        seg = np.stack([1.0 - 2 * mask, 2.0 * mask - 1.0], -1).astype(np.float32)

        cfg = Config().with_overrides(
            {"voting.un_hypotheses": 128, "voting.un_max_pixels": 512,
             "voting.cov_hypotheses": 256}
        )
        out = decode_keypoints(
            jnp.asarray(seg[None]),
            jnp.asarray(vertex[None]),
            jax.random.PRNGKey(0),
            cfg,
            un_pnp=True,
        )
        assert out["var"].shape == (1, vn, 2, 2)
        err = np.linalg.norm(np.asarray(out["kpt_2d"][0]) - kpt, axis=-1)
        assert err.max() < 0.5
        assert np.isfinite(np.asarray(out["var"])).all()
