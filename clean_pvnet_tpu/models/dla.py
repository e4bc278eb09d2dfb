"""DLA-34 backbone with deformable-conv upsampling (flax, NHWC).

Behavioral counterpart of reference lib/networks/ct/dla_dcn.py:
  DLA-34 trunk (BasicBlock Trees, levels [1,1,1,2,2,1], channels
  [16,32,64,128,256,512], ref :225-317), DeformConv nodes (:346-358),
  IDAUp (:361-383) and DLAUp (:386-412) aggregation, DLASeg head (:425+)
  producing stride-4 feature maps for CenterNet-style heads.

The up-sampling transposed convs use bilinear-init weights like the
reference's fill_up_weights (:33-42); deformable nodes use ops/dcn.DCN.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clean_pvnet_tpu.ops.dcn import DCN


def _bilinear_kernel(k: int, channels: int) -> np.ndarray:
    """Depthwise bilinear upsample weights (ref dla_dcn.py:33-42)."""
    f = int(np.ceil(k / 2.0))
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((k, k), np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    # depthwise layout for feature_group_count=C: [kh, kw, 1, C]
    out = np.zeros((k, k, 1, channels), np.float32)
    for ch in range(channels):
        out[:, :, 0, ch] = w
    return out


class ConvBnRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.dilation * (self.kernel - 1) // 2
        y = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32)(y)
        return nn.relu(y) if self.relu else y


class DlaBasic(nn.Module):
    """DLA BasicBlock (ref dla_dcn.py:46-70)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        y = ConvBnRelu(self.features, 3, self.stride, dtype=self.dtype)(x, train)
        y = ConvBnRelu(self.features, 3, 1, dtype=self.dtype, relu=False)(y, train)
        return nn.relu(y + residual)


class Root(nn.Module):
    """Tree-root aggregation node (ref dla_dcn.py:154-172)."""

    features: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jax.Array], train: bool = False):
        x = jnp.concatenate(children, -1)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32)(y)
        if self.residual:
            y = y + children[0]
        return nn.relu(y)


class Tree(nn.Module):
    """Hierarchical deep aggregation tree (ref dla_dcn.py:175-222)."""

    levels: int
    features: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        children = list(children) if children else []
        bottom = (
            nn.max_pool(x, (self.stride, self.stride),
                        strides=(self.stride, self.stride))
            if self.stride > 1
            else x
        )
        if x.shape[-1] != self.features:
            project = ConvBnRelu(self.features, 1, 1, dtype=self.dtype,
                                 relu=False)(bottom, train)
        else:
            project = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = DlaBasic(self.features, self.stride, dtype=self.dtype)(
                x, residual=project, train=train
            )
            x2 = DlaBasic(self.features, 1, dtype=self.dtype)(x1, train=train)
            return Root(self.features, self.root_residual, dtype=self.dtype)(
                [x2, x1] + children, train
            )
        x1 = Tree(self.levels - 1, self.features, self.stride,
                  root_residual=self.root_residual, dtype=self.dtype)(
            x, residual=project, train=train
        )
        return Tree(self.levels - 1, self.features, 1,
                    root_residual=self.root_residual, dtype=self.dtype)(
            x1, children=children + [x1], train=train
        )


class DLA34(nn.Module):
    """Trunk returning all 6 scale levels (ref dla_dcn.py:225-287)."""

    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        y = ConvBnRelu(ch[0], 7, 1, dtype=self.dtype)(x, train)
        level0 = ConvBnRelu(ch[0], 3, 1, dtype=self.dtype)(y, train)
        level1 = ConvBnRelu(ch[1], 3, 2, dtype=self.dtype)(level0, train)
        level2 = Tree(1, ch[2], 2, level_root=False, dtype=self.dtype)(level1, train=train)
        level3 = Tree(2, ch[3], 2, level_root=True, dtype=self.dtype)(level2, train=train)
        level4 = Tree(2, ch[4], 2, level_root=True, dtype=self.dtype)(level3, train=train)
        level5 = Tree(1, ch[5], 2, level_root=True, dtype=self.dtype)(level4, train=train)
        return [level0, level1, level2, level3, level4, level5]


class DeformNode(nn.Module):
    """DCN + BN + ReLU node (ref dla_dcn.py:346-358 DeformConv)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = DCN(self.features, dtype=self.dtype, name="dcn")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32)(y)
        return nn.relu(y)


class _Upsample(nn.Module):
    """Grouped transposed conv with fixed bilinear weights
    (ref dla_dcn.py:33-42 fill_up_weights + IDAUp's ConvTranspose2d)."""

    features: int
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        if f <= 1:
            return x
        kernel = self.param(
            "up_kernel", lambda key: jnp.asarray(_bilinear_kernel(f * 2, self.features))
        )
        # transposed conv as lhs-dilated conv (jax.lax.conv_transpose has no
        # grouping in this version): insert f-1 zeros between samples, pad by
        # kernel-1-pad, then a grouped regular conv — identical arithmetic
        p = 2 * f - 1 - f // 2
        return jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=[(p, p), (p, p)],
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.features,
        )


class IDAUp(nn.Module):
    """Iterative deep aggregation: layers[i] = node(up(proj(layers[i])) +
    layers[i-1]) (ref dla_dcn.py:361-383)."""

    features: int
    up_factors: Sequence[int]  # per layer; up_factors[0] unused
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: list, train: bool = False):
        layers = list(layers)
        for i in range(1, len(layers)):
            y = DeformNode(self.features, dtype=self.dtype,
                           name=f"proj_{i}")(layers[i], train)
            y = _Upsample(self.features, int(self.up_factors[i]),
                          dtype=self.dtype, name=f"up_{i}")(y)
            prev = layers[i - 1]
            y = y[:, : prev.shape[1], : prev.shape[2]]
            layers[i] = DeformNode(self.features, dtype=self.dtype,
                                   name=f"node_{i}")(y + prev, train)
        return layers


class DLAUp(nn.Module):
    """Full upsample pyramid over trunk levels (ref dla_dcn.py:386-412):
    repeatedly IDAUp the deepest remaining levels, collecting the aggregate
    at each scale."""

    channels: Sequence[int]  # channels of input levels, e.g. (64,128,256,512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: list, train: bool = False):
        layers = list(layers)
        n = len(layers)
        scales = [2**i for i in range(n)]
        out = [layers[-1]]
        for i in range(n - 1):
            j = n - i - 2
            factors = [s // scales[j] for s in scales[j:]]
            merged = IDAUp(self.channels[j], factors, dtype=self.dtype,
                           name=f"ida_{i}")(layers[j:], train)
            layers[j:] = merged
            for t in range(j + 1, n):
                scales[t] = scales[j]
            out.insert(0, layers[-1])
        return out


class DLASeg(nn.Module):
    """DLA-34 + DLAUp decoder to stride-4 features + conv heads
    (ref dla_dcn.py:425-490; heads {'ct_hm': C, 'wh': 2} per
    ref lib/config/config.py:111)."""

    heads: dict
    down_ratio: int = 4
    last_level: int = 5
    head_conv: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = (16, 32, 64, 128, 256, 512)
        levels = DLA34(channels=channels, dtype=self.dtype)(x, train)
        first = int(np.log2(self.down_ratio))  # 2 → start at stride 4

        pyramid = DLAUp(channels[first:], dtype=self.dtype,
                        name="dla_up")(levels[first:], train)

        y = list(pyramid[: self.last_level - first])
        factors = [2**i for i in range(len(y))]
        y = IDAUp(channels[first], factors, dtype=self.dtype,
                  name="ida_up")(y, train)
        feat = y[-1]

        outputs = {}
        for head, num_out in sorted(self.heads.items()):
            h = nn.Conv(self.head_conv, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"head_{head}_conv")(feat)
            h = nn.relu(h)
            # focal-loss prior init for heatmap heads (ref dla_dcn fill -2.19)
            bias_init = (
                nn.initializers.constant(-2.19)
                if "hm" in head
                else nn.initializers.zeros
            )
            h = nn.Conv(num_out, (1, 1), bias_init=bias_init,
                        dtype=self.dtype, name=f"head_{head}")(h)
            outputs[head] = h.astype(jnp.float32)
        return outputs
