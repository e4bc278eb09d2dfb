"""Cascade (detector → crop → PVNet) pipeline integration test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models import PVNet
from clean_pvnet_tpu.models.cascade import CascadePipeline
from clean_pvnet_tpu.models.dla import DLASeg


class TinyDetector:
    """Deterministic stand-in detector: emits a fixed box via heatmap logits
    so the cascade's decode → crop → vote path is exercised without
    training. Mimics the DLASeg output contract."""

    def __init__(self, center, size, hw, down_ratio=4):
        self.center = center
        self.size = size
        self.hw = hw
        self.down = down_ratio

    def apply(self, variables, x, train=False):
        b = x.shape[0]
        oh, ow = self.hw[0] // self.down, self.hw[1] // self.down
        hm = jnp.full((b, oh, ow, 1), -10.0)
        cx, cy = self.center[0] // self.down, self.center[1] // self.down
        hm = hm.at[:, cy, cx, 0].set(8.0)
        wh = jnp.zeros((b, oh, ow, 2))
        wh = wh.at[:, cy, cx].set(
            jnp.asarray([self.size / self.down, self.size / self.down])
        )
        return {"ct_hm": hm, "wh": wh}


class TestCascade:
    @pytest.mark.slow
    def test_end_to_end_shapes_and_crop_location(self, rng):
        from clean_pvnet_tpu.geometry import compute_vertex_field_np

        h, w = 96, 128
        cfg = Config().with_overrides(
            {"voting.max_pixels": 256, "voting.num_hypotheses": 64}
        )
        # scene: object blob at a known location
        center = (80, 48)
        img = np.zeros((1, h, w, 3), np.float32)
        img[0, 32:64, 64:96] = 1.0

        detector = TinyDetector(center=center, size=32, hw=(h, w))
        pvnet = PVNet(ver_dim=18, seg_dim=2, fc_dim=32, s8_dim=16, s4_dim=8,
                      s2_dim=8, raw_dim=8)
        pvnet_vars = pvnet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )

        pipe = CascadePipeline(
            cfg, detector, pvnet, max_dets=4, crop_size=64, score_thresh=0.5
        )
        out = pipe(None, pvnet_vars, jnp.asarray(img), jax.random.PRNGKey(0))

        assert out["kpt_2d"].shape == (1, 4, 9, 2)
        assert out["bboxes"].shape == (1, 4, 4)
        assert bool(out["scores"][0, 0] > 0.5)
        # top detection box centered at the planted peak
        box = np.asarray(out["bboxes"][0, 0])
        np.testing.assert_allclose(
            [(box[0] + box[2]) / 2, (box[1] + box[3]) / 2], center, atol=4
        )
        # only the planted detection survives the score threshold
        n_valid_scores = int(np.asarray(out["scores"][0] > 0.5).sum())
        assert n_valid_scores == 1

    @pytest.mark.slow
    def test_with_real_dla(self, rng):
        """DLASeg + PVNet cascade compiles and runs end to end."""
        cfg = Config().with_overrides(
            {"voting.max_pixels": 128, "voting.num_hypotheses": 32}
        )
        detector = DLASeg(heads={"ct_hm": 2, "wh": 2}, head_conv=16)
        det_vars = detector.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
        )
        pvnet = PVNet(ver_dim=18, seg_dim=2, fc_dim=16, s8_dim=8, s4_dim=8,
                      s2_dim=8, raw_dim=8)
        pvnet_vars = pvnet.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), train=False
        )
        pipe = CascadePipeline(cfg, detector, pvnet, max_dets=2, crop_size=32)
        x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
        out = pipe(det_vars, pvnet_vars, x, jax.random.PRNGKey(2))
        assert out["kpt_2d"].shape == (1, 2, 9, 2)
        assert np.isfinite(np.asarray(out["kpt_2d"])).all()
