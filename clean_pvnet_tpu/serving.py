"""Production serving wrapper around the inference pipeline.

The reference has no serving story (research repo: per-image Python loops,
host round trips). This wraps eval/pipeline.InferencePipeline into a
throughput-oriented estimator:

  * raw uint8 frames in, poses out — normalization fused on device
  * async dispatch: `submit` enqueues a batch and returns a handle without
    blocking; XLA's async dispatch overlaps host→device transfer of batch
    N+1 with compute of batch N (double buffering without explicit DMA
    management)
  * fixed shapes: one compiled program per (batch, H, W) bucket
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.eval.pipeline import InferencePipeline


class PoseEstimator:
    def __init__(
        self,
        cfg: Config,
        model,
        variables,
        kpt_3d: np.ndarray,
        K: np.ndarray,
        un_pnp: bool = False,
    ):
        self.cfg = cfg
        self.variables = variables
        self.pipeline = InferencePipeline(
            cfg, model, kpt_3d, un_pnp=un_pnp, accept_uint8=True
        )
        self.K = jnp.asarray(K, jnp.float32)
        self._step = 0

    def warmup(self, batch_size: int, hw: tuple[int, int]):
        frames = np.zeros((batch_size, hw[0], hw[1], 3), np.uint8)
        out = self.submit(frames)
        jax.block_until_ready(out["pose"])

    def submit(self, frames_uint8: np.ndarray) -> dict[str, Any]:
        """Enqueue one batch; returns device arrays immediately (async).
        Call np.asarray / block_until_ready on results to synchronize."""
        b = frames_uint8.shape[0]
        K = jnp.broadcast_to(self.K, (b, 3, 3))
        key = jax.random.PRNGKey(self._step)
        self._step += 1
        return self.pipeline(
            self.variables, jnp.asarray(frames_uint8), K, key
        )

    def predict(self, frames_uint8: np.ndarray) -> dict[str, np.ndarray]:
        """Blocking convenience wrapper: returns numpy poses/keypoints."""
        out = self.submit(frames_uint8)
        return {
            "pose": np.asarray(out["pose"]),
            "kpt_2d": np.asarray(out["kpt_2d"]),
            "mask": np.asarray(out["mask"]),
            "valid": np.asarray(out["valid"]),
        }
