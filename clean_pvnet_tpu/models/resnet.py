"""Dilated fully-convolutional ResNet backbone in flax (NHWC).

Behavioral counterpart of reference lib/networks/pvnet/resnet.py:166-220:
ResNet-18 whose stride-16/32 stages are replaced by dilation so the deepest
features stay at output-stride 8, returning every intermediate scale for the
skip-fusion decoder.

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), optional
bfloat16 activations with float32 params/batch-norm statistics, and a
`sync_bn` axis hook for cross-replica statistics under SPMD (the reference's
DataParallel computes per-replica stats; per-device is the default here too).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        bn = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.bn_axis_name,
        )
        residual = x
        y = conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
        )(x)
        y = bn()(y)
        y = nn.relu(y)
        y = conv(
            self.features,
            (3, 3),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
        )(y)
        y = bn()(y)
        if self.downsample:
            residual = conv(self.features, (1, 1), strides=(self.stride, self.stride))(x)
            residual = bn()(residual)
        return nn.relu(y + residual)


class ResNetStride8(nn.Module):
    """ResNet-{18,34} trunk with output stride 8 via dilation.

    Returns (x2s, x4s, x8s, x16s, x32s, xfc) like the reference forward
    (ref lib/networks/pvnet/resnet.py:200-220); spatial scales are
    H/2, H/4, H/8, H/8, H/8, H/8 (deeper stages dilated, not strided).
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # resnet18
    fc_dim: int = 256
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.bn_axis_name,
        )
        block = partial(
            BasicBlock,
            dtype=self.dtype,
            bn_momentum=self.bn_momentum,
            bn_axis_name=self.bn_axis_name,
        )

        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        y = bn()(y)
        x2s = nn.relu(y)
        y = nn.max_pool(x2s, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # (features, stride, dilation) per stage; stride replaced by dilation
        # beyond output-stride 8 (ref resnet.py:166-199 _make_layer logic)
        plan = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        feats = []
        for (f, s, d), n_blocks in zip(plan, self.stage_sizes):
            # projection shortcut only when shape changes (ref resnet.py:168-189;
            # stage 1 of ResNet-18 keeps the identity residual)
            need_proj = s != 1 or y.shape[-1] != f
            y = block(features=f, stride=s, dilation=d, downsample=need_proj)(y, train)
            for _ in range(n_blocks - 1):
                y = block(features=f, dilation=d)(y, train)
            feats.append(y)
        x4s, x8s, x16s, x32s = feats

        # fc head as 3x3 conv (ref resnet18.py:24-28)
        y = nn.Conv(self.fc_dim, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x32s)
        y = bn()(y)
        xfc = nn.relu(y)
        return x2s, x4s, x8s, x16s, x32s, xfc
