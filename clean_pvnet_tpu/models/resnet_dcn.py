"""ResNet-18 + DCN-deconv CenterNet backbone.

Working TPU counterpart of the reference's `lib/networks/resnet_dcn.py`
(290 LoC, present but disabled in its factory, ref
lib/networks/make_network.py:2-17): a standard stride-32 ResNet trunk
followed by three (DCN → BN → ReLU → 2× bilinear upsample) stages back to
stride 4, with the same {ct_hm, wh} conv heads as DLASeg. Registered as
`network.name: res18_dcn` for the `ct` task.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models.dla import DeformNode, _Upsample
from clean_pvnet_tpu.models.resnet import BasicBlock
from clean_pvnet_tpu.registry import NETWORKS


class ResNetStride32(nn.Module):
    """Plain (non-dilated) ResNet-{18,34} trunk to stride 32."""

    stage_blocks: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda *a, **k: nn.Conv(*a, use_bias=False, dtype=self.dtype,
                                       param_dtype=jnp.float32, **k)
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype,
                                    param_dtype=jnp.float32)
        y = conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)])(x)
        y = nn.relu(norm()(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for (f, s), n in zip(((64, 1), (128, 2), (256, 2), (512, 2)),
                             self.stage_blocks):
            y = BasicBlock(features=f, stride=s, downsample=True)(y, train)
            for _ in range(n - 1):
                y = BasicBlock(features=f)(y, train)
        return y  # [B, H/32, W/32, 512]


class ResNetDcnSeg(nn.Module):
    """Trunk + 3 DCN-deconv stages (256→128→64) + conv heads
    (ref resnet_dcn.py PoseResNet: _make_deconv_layer(3, [256,128,64], [4,4,4]))."""

    heads: dict
    head_conv: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ResNetStride32(dtype=self.dtype, name="trunk")(x, train)
        for i, f in enumerate((256, 128, 64)):
            y = DeformNode(f, dtype=self.dtype, name=f"deconv_dcn_{i}")(y, train)
            y = _Upsample(f, 2, dtype=self.dtype, name=f"deconv_up_{i}")(y)

        outputs = {}
        for head, num_out in sorted(self.heads.items()):
            h = nn.Conv(self.head_conv, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"head_{head}_conv")(y)
            h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(-2.19)
                if "hm" in head
                else nn.initializers.zeros
            )
            h = nn.Conv(num_out, (1, 1), bias_init=bias_init,
                        dtype=self.dtype, name=f"head_{head}")(h)
            outputs[head] = h.astype(jnp.float32)
        return outputs


@NETWORKS.register("res18_dcn")
def build_resnet_dcn(cfg: Config) -> ResNetDcnSeg:
    return ResNetDcnSeg(
        heads={"ct_hm": cfg.network.ct_num_classes, "wh": 2},
        head_conv=cfg.network.ct_head_conv,
        dtype=jnp.bfloat16 if cfg.network.use_bfloat16 else jnp.float32,
    )
