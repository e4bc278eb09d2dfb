"""Modulated deformable convolution v2 (DCNv2), TPU-native.

Replaces the reference's CUDA extension (ref lib/csrc/dcn_v2/src/
dcn_v2_im2col_cuda.cu:1-401 bilinear im2col, dcn_v2_cuda.cu forward/backward,
and the autograd wrapper lib/networks/dcn_v2.py:16-128) with a pure-JAX
formulation that maps to TPU strengths:

  * the bilinear-sampled im2col is expressed as 4 dynamic gathers per kernel
    tap (vectorized over the whole feature map), and
  * the convolution itself becomes ONE [B·H·W, k·k·C] × [k·k·C, Cout]
    matmul that rides the MXU.

Backward comes from JAX autodiff (gather ↔ scatter-add transpose), matching
the hand-written CUDA col2im gradients. The `DCN` flax module mirrors the
reference's module that predicts offsets+mask from a regular conv
(ref lib/networks/dcn_v2.py:103-128), including the zero-init of the
offset/mask conv (:115-117) so training starts as a plain conv.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """feat [H, W, C]; ys/xs [N] float sample locations → [N, C].

    Out-of-range samples contribute zero (matches the CUDA sampler's border
    handling, ref dcn_v2_im2col_cuda.cu dmcn_im2col_bilinear)."""
    h, w, _ = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    flat = feat.reshape(h * w, -1)

    def tap(yi, xi, wgt):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w + jnp.clip(
            xi, 0, w - 1
        ).astype(jnp.int32)
        return flat[idx] * (wgt * inb)[:, None]

    return (
        tap(y0, x0, (1 - wy1) * (1 - wx1))
        + tap(y0, x0 + 1, (1 - wy1) * wx1)
        + tap(y0 + 1, x0, wy1 * (1 - wx1))
        + tap(y0 + 1, x0 + 1, wy1 * wx1)
    )


def deform_conv2d(
    x: jax.Array,        # [B, H, W, C]
    offset: jax.Array,   # [B, H, W, 2*kh*kw]  (dy, dx per tap)
    mask: jax.Array,     # [B, H, W, kh*kw]    modulation (post-sigmoid)
    weight: jax.Array,   # [kh, kw, C, Cout]
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """Forward modulated deformable conv (NHWC). Output [B, Ho, Wo, Cout]."""
    b, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 0) * stride - padding
    base_x = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 1) * stride - padding

    offset = offset.reshape(b, h, w, kh * kw, 2)
    # offsets/mask are defined on the output grid; when stride == 1 and the
    # spatial dims match this is the identity slice
    offset = offset[:, :ho, :wo]
    mask = mask[:, :ho, :wo]

    def one_image(xi, offs, msk):
        cols = []
        for ki in range(kh):
            for kj in range(kw):
                t = ki * kw + kj
                ys = (base_y + ki * dilation + offs[..., t, 0]).reshape(-1)
                xs = (base_x + kj * dilation + offs[..., t, 1]).reshape(-1)
                sampled = _bilinear_gather(xi, ys, xs)  # [ho*wo, C]
                cols.append(sampled * msk[..., t].reshape(-1, 1))
        return jnp.concatenate(cols, -1)  # [ho*wo, kh*kw*C]

    cols = jax.vmap(one_image)(x, offset, mask)  # [B, ho*wo, kh*kw*C]
    wmat = weight.transpose(0, 1, 2, 3).reshape(kh * kw * c, cout)
    out = jnp.einsum("bnk,kc->bnc", cols, wmat)  # MXU
    if bias is not None:
        out = out + bias
    return out.reshape(b, ho, wo, cout)


class DCN(nn.Module):
    """DCNv2 layer predicting its own offsets and modulation masks from a
    regular conv over the input (ref lib/networks/dcn_v2.py:103-128)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        # offset/mask conv zero-initialized (ref dcn_v2.py:115-117 reset_parameters)
        om = nn.Conv(
            3 * k * k,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset_mask",
        )(x)
        o1, o2, m = jnp.split(om, 3, axis=-1)
        # o1 = per-tap dy, o2 = per-tap dx (ref dcn_v2.py:94-99 chunk+cat)
        offset = jnp.stack([o1, o2], -1).reshape(*o1.shape[:-1], 2 * k * k)
        mask = nn.sigmoid(m)
        weight = self.param(
            "weight",
            nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x32 = x.astype(jnp.float32)
        out = deform_conv2d(
            x32,
            offset.astype(jnp.float32),
            mask.astype(jnp.float32),
            weight,
            bias,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
        )
        return out.astype(self.dtype)
