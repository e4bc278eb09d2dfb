import numpy as np
import jax
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models import PVNet
from clean_pvnet_tpu.serving import PoseEstimator


class TestPoseEstimator:
    def test_uint8_predict_shapes(self, rng):
        cfg = Config().with_overrides(
            {"voting.max_pixels": 64, "voting.num_hypotheses": 32,
             "network.use_bfloat16": False}
        )
        model = PVNet(ver_dim=18, seg_dim=2, fc_dim=16, s8_dim=8, s4_dim=8,
                      s2_dim=8, raw_dim=8)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32),
            train=False,
        )
        K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
        kpt_3d = rng.randn(9, 3).astype(np.float32) * 0.05
        est = PoseEstimator(cfg, model, variables, kpt_3d, K)
        est.warmup(2, (64, 64))
        frames = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
        out = est.predict(frames)
        assert out["pose"].shape == (2, 3, 4)
        assert out["kpt_2d"].shape == (2, 9, 2)
        assert out["mask"].shape == (2, 64, 64)
        assert np.isfinite(out["pose"]).all()

    def test_async_submit_returns_immediately(self, rng):
        cfg = Config().with_overrides(
            {"voting.max_pixels": 64, "voting.num_hypotheses": 32,
             "network.use_bfloat16": False}
        )
        model = PVNet(ver_dim=18, seg_dim=2, fc_dim=16, s8_dim=8, s4_dim=8,
                      s2_dim=8, raw_dim=8)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32),
            train=False,
        )
        K = np.eye(3, dtype=np.float32) * 100
        est = PoseEstimator(cfg, model, variables,
                            rng.randn(9, 3).astype(np.float32) * 0.05, K)
        est.warmup(1, (32, 32))
        handle = est.submit(np.zeros((1, 32, 32, 3), np.uint8))
        # device arrays, not yet host-transferred
        assert hasattr(handle["pose"], "devices")
        jax.block_until_ready(handle["pose"])


class TestChunkedPipeline:
    def test_chunked_matches_unchunked(self, rng):
        """lax.map-chunked serving pipeline (batch-HBM ceiling fix): same
        compact outputs as the monolithic program, identical values given
        the same per-chunk keys structure is deterministic."""
        from clean_pvnet_tpu.eval import InferencePipeline

        cfg = Config().with_overrides(
            {"voting.max_pixels": 64, "voting.num_hypotheses": 32,
             "voting.un_hypotheses": 64, "voting.cov_hypotheses": 64,
             "voting.un_max_pixels": 64,
             "network.use_bfloat16": False}
        )
        model = PVNet(ver_dim=18, seg_dim=2, fc_dim=16, s8_dim=8, s4_dim=8,
                      s2_dim=8, raw_dim=8)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32),
            train=False,
        )
        kpt_3d = rng.randn(9, 3).astype(np.float32) * 0.05
        K = np.tile(
            np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32),
            (4, 1, 1),
        )
        inp = rng.rand(4, 64, 64, 3).astype(np.float32)

        chunked = InferencePipeline(cfg, model, kpt_3d, un_pnp=True, chunk=2)
        out = chunked(variables, inp, K, jax.random.PRNGKey(7))
        # compact outputs only, full batch leading dim, finite poses
        assert "seg" not in out and "vertex" not in out
        assert out["pose"].shape == (4, 3, 4)
        assert out["var"].shape == (4, 9, 2, 2)
        assert out["mask"].shape == (4, 64, 64)
        assert np.isfinite(np.asarray(out["pose"])).all()

        # batch <= chunk falls back to the monolithic program (with seg)
        small = chunked(variables, inp[:2], K[:2], jax.random.PRNGKey(7))
        assert small["pose"].shape == (2, 3, 4)

    def test_cov_pixels_config_threads_through_pipeline(self, rng):
        """voting.cov_pixels (covariance-count subsample) reaches the
        un_pnp decode from the serving config and yields finite covs."""
        from clean_pvnet_tpu.eval import InferencePipeline

        cfg = Config().with_overrides(
            {"voting.max_pixels": 64, "voting.num_hypotheses": 32,
             "voting.un_hypotheses": 64, "voting.cov_hypotheses": 64,
             "voting.un_max_pixels": 64, "voting.cov_pixels": 16,
             "network.use_bfloat16": False}
        )
        model = PVNet(ver_dim=18, seg_dim=2, fc_dim=16, s8_dim=8, s4_dim=8,
                      s2_dim=8, raw_dim=8)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32),
            train=False,
        )
        kpt_3d = rng.randn(9, 3).astype(np.float32) * 0.05
        K = np.tile(
            np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32),
            (2, 1, 1),
        )
        inp = rng.rand(2, 64, 64, 3).astype(np.float32)
        pipe = InferencePipeline(cfg, model, kpt_3d, un_pnp=True)
        out = pipe(variables, inp, K, jax.random.PRNGKey(3))
        assert out["var"].shape == (2, 9, 2, 2)
        assert np.isfinite(np.asarray(out["var"])).all()
