import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models.centernet import (
    CenterNet,
    ct_focal_loss,
    ct_wh_loss,
    decode_ct_heatmap,
)
from clean_pvnet_tpu.models.cascade import crop_bilinear
from clean_pvnet_tpu.models.dla import DLASeg


class TestDecode:
    def test_finds_planted_peaks(self):
        b, h, w, c = 1, 32, 32, 3
        hm = np.full((b, h, w, c), -8.0, np.float32)
        hm[0, 10, 20, 1] = 6.0
        hm[0, 25, 5, 0] = 4.0
        wh = np.zeros((b, h, w, 2), np.float32)
        wh[0, 10, 20] = [8, 6]
        wh[0, 25, 5] = [4, 4]
        out = decode_ct_heatmap(jnp.asarray(hm), jnp.asarray(wh), max_dets=4)
        xs = np.asarray(out["centers"][0, :2])
        assert {tuple(v) for v in xs.astype(int)} == {(20, 10), (5, 25)}
        assert int(out["classes"][0, 0]) == 1
        b0 = np.asarray(out["bboxes"][0, 0])
        np.testing.assert_allclose(b0, [16, 7, 24, 13], atol=1e-4)

    def test_nms_suppresses_neighbors(self):
        hm = np.full((1, 16, 16, 1), -8.0, np.float32)
        hm[0, 8, 8, 0] = 5.0
        hm[0, 8, 9, 0] = 4.0  # adjacent weaker peak must be NMS'd
        wh = np.zeros((1, 16, 16, 2), np.float32)
        out = decode_ct_heatmap(jnp.asarray(hm), jnp.asarray(wh), max_dets=4)
        scores = np.asarray(out["scores"][0])
        assert scores[0] > 0.9
        assert scores[1] < 0.1  # suppressed


class TestLosses:
    def test_focal_loss_decreases_with_better_pred(self):
        gt = np.zeros((1, 8, 8, 1), np.float32)
        gt[0, 4, 4, 0] = 1.0
        good = np.full((1, 8, 8, 1), -6.0, np.float32)
        good[0, 4, 4, 0] = 6.0
        bad = np.zeros((1, 8, 8, 1), np.float32)
        l_good = float(ct_focal_loss(jnp.asarray(good), jnp.asarray(gt)))
        l_bad = float(ct_focal_loss(jnp.asarray(bad), jnp.asarray(gt)))
        assert l_good < l_bad

    def test_wh_loss_indexes_centers(self):
        wh_pred = np.zeros((1, 8, 8, 2), np.float32)
        wh_pred[0, 2, 3] = [5, 5]
        ct_ind = np.array([[2 * 8 + 3]], np.int32)
        wh_gt = np.array([[[5.0, 5.0]]], np.float32)
        valid = np.ones((1, 1), bool)
        l = float(
            ct_wh_loss(jnp.asarray(wh_pred), jnp.asarray(ct_ind),
                       jnp.asarray(wh_gt), jnp.asarray(valid))
        )
        assert l < 1e-6


class TestDLASeg:
    @pytest.mark.slow
    def test_forward_shapes(self):
        model = DLASeg(heads={"ct_hm": 4, "wh": 2}, head_conv=32)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        out = model.apply(variables, x, train=False)
        assert out["ct_hm"].shape == (1, 16, 16, 4)
        assert out["wh"].shape == (1, 16, 16, 2)

    @pytest.mark.slow
    def test_train_step_learns(self, rng):
        # one gradient direction check: hm loss drops on a fixed batch
        import optax

        model = DLASeg(heads={"ct_hm": 2, "wh": 2}, head_conv=16)
        x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        gt_hm = np.zeros((2, 8, 8, 2), np.float32)
        gt_hm[:, 3, 4, 0] = 1.0
        gt_hm = jnp.asarray(gt_hm)
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        params, bs = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, bs, opt_state):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, x, train=True,
                    mutable=["batch_stats"],
                )
                return ct_focal_loss(out["ct_hm"], gt_hm), mut["batch_stats"]

            (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            upd, opt_state2 = tx.update(g, opt_state)
            return optax.apply_updates(params, upd), new_bs, opt_state2, loss

        losses = []
        for _ in range(8):
            params, bs, opt_state, loss = step(params, bs, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses


class TestCropBilinear:
    def test_identity_crop(self, rng):
        img = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
        out = crop_bilinear(img, jnp.asarray([8.0, 8.0]), jnp.asarray(16.0), 16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_zoom_center(self, rng):
        img = np.zeros((16, 16, 1), np.float32)
        img[8, 8] = 1.0
        out = crop_bilinear(jnp.asarray(img), jnp.asarray([8.5, 8.5]),
                            jnp.asarray(4.0), 8)
        # the bright pixel should appear near the crop center
        y, x = np.unravel_index(np.argmax(np.asarray(out)[..., 0]), (8, 8))
        assert abs(y - 3.5) <= 1.5 and abs(x - 3.5) <= 1.5

    def test_out_of_frame_zero(self, rng):
        img = jnp.ones((8, 8, 1), jnp.float32)
        out = crop_bilinear(img, jnp.asarray([-20.0, -20.0]), jnp.asarray(8.0), 4)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestResnetDcnBackbone:
    @pytest.mark.slow
    def test_forward_shapes_and_train_step(self):
        from clean_pvnet_tpu.models import make_network
        from clean_pvnet_tpu.registry import TRAINERS
        from clean_pvnet_tpu.train.state import create_train_state
        from clean_pvnet_tpu.train.optim import make_optimizer

        cfg = Config().with_overrides({
            "task": "ct",
            "network.name": "res18_dcn",
            "network.task": "ct",
            "network.ct_num_classes": 3,
            "network.ct_head_conv": 32,
            "network.use_bfloat16": False,
        })
        model = make_network(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        # stride-4 output grid, same head contract as DLASeg
        assert out["ct_hm"].shape == (1, 16, 16, 3)
        assert out["wh"].shape == (1, 16, 16, 2)

        # one ct train step runs and produces finite loss
        tx = make_optimizer(cfg.train, steps_per_epoch=1)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3))
        train_step, _ = TRAINERS.build("ct", cfg)
        hm = np.zeros((1, 16, 16, 3), np.float32)
        hm[0, 8, 8, 1] = 1.0
        batch = {
            "inp": np.zeros((1, 64, 64, 3), np.float32),
            "ct_hm": hm,
            "ct_ind": np.array([[8 * 16 + 8]], np.int32),
            "wh": np.array([[[4.0, 4.0]]], np.float32),
            "ct_valid": np.ones((1, 1), bool),
        }
        state2, stats = jax.jit(train_step)(state, batch)
        assert np.isfinite(float(stats["loss"]))
