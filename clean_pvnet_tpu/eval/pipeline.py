"""End-to-end jitted inference: image → network → voting → PnP → pose.

This is the frames/s-critical path. Where the reference bounces per image
between the network (GPU), RANSAC CUDA kernels, host OpenCV/Ceres PnP, and
numpy metrics (ref run.py:75-79, lib/evaluators/linemod/pvnet.py:175-205),
here the whole batch stays on-device inside ONE jitted program — the only
host transfer is the final small pose/metric tensors.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.geometry.pnp import solve_pnp, solve_pnp_uncertainty
from clean_pvnet_tpu.models.pvnet import decode_keypoints


class InferencePipeline:
    """network.apply + voting decode + (uncertainty) PnP, one jit."""

    def __init__(self, cfg: Config, model, kpt_3d, un_pnp: bool | None = None):
        self.cfg = cfg
        self.model = model
        self.kpt_3d = jnp.asarray(kpt_3d, jnp.float32)
        self.un_pnp = cfg.test.un_pnp if un_pnp is None else un_pnp
        self._run = jax.jit(self._build())

    def _build(self):
        cfg = self.cfg
        un_pnp = self.un_pnp
        kpt_3d = self.kpt_3d
        lm_iters = cfg.pnp.lm_iters

        def run(variables, inp, K, key):
            out = self.model.apply(variables, inp, train=False)
            dec = decode_keypoints(out["seg"], out["vertex"], key, cfg, un_pnp=un_pnp)
            if un_pnp:
                pose = jax.vmap(
                    lambda k2, var, k: solve_pnp_uncertainty(
                        kpt_3d, k2, var, k, iters=lm_iters
                    )
                )(dec["kpt_2d"], dec["var"], K)
            else:
                pose = jax.vmap(
                    lambda k2, k: solve_pnp(kpt_3d, k2, k, iters=lm_iters)
                )(dec["kpt_2d"], K)
            return {**out, **dec, "pose": pose}

        return run

    def __call__(self, variables, inp, K, key) -> dict[str, Any]:
        """inp [B,H,W,3] float32 (normalized), K [B,3,3] → outputs dict."""
        return self._run(variables, inp, K, key)
