"""Residual-MLP keypoints→quaternion regressor.

Behavioral counterpart of reference lib/networks/linear_model.py:9-87
(a Martinez-style residual MLP mapping 8 2D keypoints to a pose
quaternion; shipped disabled in the reference factory, registered and
working here). Dense layers map directly onto the MXU; dropout threads a
flax 'dropout' RNG.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.registry import NETWORKS


class ResidualLinearBlock(nn.Module):
    """x + MLP(x) with two dense+BN+relu+dropout stages
    (ref linear_model.py:9-36)."""

    size: int
    p_dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        for i in range(2):
            y = nn.Dense(self.size, dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train,
                             param_dtype=jnp.float32, dtype=self.dtype)(y)
            y = nn.relu(y)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
        return x + y


class LinearModel(nn.Module):
    """[B, input_size] (flattened 2D keypoints) → {'quat': [B, 4]}
    (ref linear_model.py:39-83)."""

    linear_size: int = 1024
    num_stage: int = 2
    p_dropout: float = 0.5
    input_size: int = 16   # 8 keypoints × 2
    output_size: int = 4   # quaternion
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        y = nn.Dense(self.linear_size, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train,
                         param_dtype=jnp.float32, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
        for _ in range(self.num_stage):
            y = ResidualLinearBlock(self.linear_size, self.p_dropout,
                                    dtype=self.dtype)(y, train)
        quat = nn.Dense(self.output_size, dtype=self.dtype)(y)
        return {"quat": quat.astype(jnp.float32)}


@NETWORKS.register("linear")
def build_linear_model(cfg: Config) -> LinearModel:
    return LinearModel(
        dtype=jnp.bfloat16 if cfg.network.use_bfloat16 else jnp.float32,
    )
