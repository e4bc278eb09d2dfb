"""Stacked-hourglass backbone (CenterNet alternative head network).

Behavioral counterpart of reference lib/networks/ct/hourglass.py:130-315
(kp module / large hourglass): pre-layer downsample to stride 4, N stacked
recursive hourglass modules with intermediate supervision heads. Present in
the reference but disabled in its factory (ref make_network.py:2-17); here
it is a registered, working alternative (`network.name: hourglass`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Residual(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = bn("bn2")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=self.dtype)(x)
            x = bn("bn_skip")(x)
        return nn.relu(y + x)


class HourglassModule(nn.Module):
    """Recursive hourglass (ref hourglass.py kp_module)."""

    depth: int
    features: Sequence[int]  # per recursion level
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f_cur = self.features[0]
        f_next = self.features[1] if len(self.features) > 1 else f_cur
        up1 = Residual(f_cur, dtype=self.dtype, name="up1")(x, train)
        low1 = nn.max_pool(x, (2, 2), strides=(2, 2))
        low1 = Residual(f_next, dtype=self.dtype, name="low1")(low1, train)
        if self.depth > 1:
            low2 = HourglassModule(
                self.depth - 1, self.features[1:], dtype=self.dtype,
                name="inner",
            )(low1, train)
        else:
            low2 = Residual(f_next, dtype=self.dtype, name="low2")(low1, train)
        low3 = Residual(f_cur, dtype=self.dtype, name="low3")(low2, train)
        up2 = jax.image.resize(
            low3, (low3.shape[0], up1.shape[1], up1.shape[2], low3.shape[3]),
            "nearest",
        )
        return up1 + up2


class StackedHourglass(nn.Module):
    """N-stack hourglass with per-stack heads; returns the last stack's
    head outputs (intermediate heads train via `all_outputs=True`)."""

    heads: dict
    num_stacks: int = 2
    depth: int = 4
    features: Sequence[int] = (256, 256, 384, 384, 512)
    head_conv: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, all_outputs: bool = False):
        # pre: stride-4 stem (ref hourglass.py pre)
        y = nn.Conv(128, (7, 7), (2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = Residual(self.features[0], stride=2, dtype=self.dtype)(y, train)

        outputs = []
        inter = y
        for s in range(self.num_stacks):
            hg = HourglassModule(self.depth, self.features, dtype=self.dtype,
                                 name=f"hg_{s}")(inter, train)
            feat = Residual(self.features[0], dtype=self.dtype,
                            name=f"feat_{s}")(hg, train)
            outs = {}
            for head, num_out in sorted(self.heads.items()):
                h = nn.Conv(self.head_conv, (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"s{s}_{head}_conv")(feat)
                h = nn.relu(h)
                bias_init = (
                    nn.initializers.constant(-2.19) if "hm" in head
                    else nn.initializers.zeros
                )
                outs[head] = nn.Conv(
                    num_out, (1, 1), bias_init=bias_init, dtype=self.dtype,
                    name=f"s{s}_{head}",
                )(h).astype(jnp.float32)
            outputs.append(outs)
            if s < self.num_stacks - 1:
                inter = inter + Residual(
                    self.features[0], dtype=self.dtype, name=f"inter_{s}"
                )(feat, train)
        return outputs if all_outputs else outputs[-1]


from clean_pvnet_tpu.config import Config  # noqa: E402
from clean_pvnet_tpu.registry import NETWORKS  # noqa: E402


@NETWORKS.register("hourglass")
def build_hourglass(cfg: Config) -> StackedHourglass:
    return StackedHourglass(
        heads={"ct_hm": cfg.network.ct_num_classes, "wh": 2},
        dtype=jnp.bfloat16 if cfg.network.use_bfloat16 else jnp.float32,
    )
