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
    """Forward modulated deformable conv (NHWC). Output [B, Ho, Wo, Cout].

    Gather-engine layout: the TPU gather unit retires ~one ROW per cycle
    regardless of row width (measured ~8 ns/row, ROUND4.md item 8), so the
    naive 4-corner bilinear sampler costs kh·kw·4 gathers of Ho·Wo rows
    each. Instead we precompute a packed NEIGHBOR TABLE T[r, c] =
    (f[r,c], f[r,c+1], f[r+1,c], f[r+1,c+1]) with contiguous
    pad/slice/concat ops, and each tap issues ONE row gather of width 4C —
    a 4× cut in gathered rows, the same restructuring that halved the
    train step's augmentation warp (augment_device.warp_rgb_mask_packed).
    Zero-padding the table reproduces the CUDA sampler's border handling
    (out-of-range corners contribute zero) bit-exactly; fully-outside
    samples are masked by `valid`.
    """
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

    # packed neighbor table over a zero-padded (+1 left/top, +2 right/
    # bottom) grid: row index r = y0+1 ∈ [0, h+2), col c = x0+1 ∈ [0, w+2).
    # The table keeps x's dtype: with a bf16 feature map the gather moves
    # HALF the bytes (the gather engine is the DCN bottleneck); coordinate
    # and weight math below stays fp32, and rows upcast at the weighted sum.
    fp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    tbl = jnp.concatenate(
        [fp[:, :-1, :-1], fp[:, :-1, 1:], fp[:, 1:, :-1], fp[:, 1:, 1:]], -1
    )  # [B, h+2, w+2, 4C]
    tbl = tbl.reshape(b, (h + 2) * (w + 2), 4 * c)

    def one_image(tbl_i, offs, msk):
        cols = []
        for ki in range(kh):
            for kj in range(kw):
                t = ki * kw + kj
                ys = (base_y + ki * dilation + offs[..., t, 0]).reshape(-1)
                xs = (base_x + kj * dilation + offs[..., t, 1]).reshape(-1)
                y0 = jnp.floor(ys)
                x0 = jnp.floor(xs)
                wy1 = ys - y0
                wx1 = xs - x0
                valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
                r = jnp.clip(y0, -1, h).astype(jnp.int32) + 1
                ccol = jnp.clip(x0, -1, w).astype(jnp.int32) + 1
                rows = tbl_i[r * (w + 2) + ccol]          # [N, 4C] one gather
                wgt = (
                    jnp.stack(
                        [
                            (1 - wy1) * (1 - wx1),
                            (1 - wy1) * wx1,
                            wy1 * (1 - wx1),
                            wy1 * wx1,
                        ],
                        -1,
                    )
                    * (valid * msk[..., t].reshape(-1))[:, None]
                )  # [N, 4]
                sampled = jnp.einsum(
                    "nkc,nk->nc",
                    rows.reshape(-1, 4, c).astype(jnp.float32), wgt,
                )
                cols.append(sampled)
        return jnp.concatenate(cols, -1)  # [ho*wo, kh*kw*C]

    cols = jax.vmap(one_image)(tbl, offset, mask)  # [B, ho*wo, kh*kw*C]
    wmat = weight.transpose(0, 1, 2, 3).reshape(kh * kw * c, cout)
    out = jnp.einsum("bnk,kc->bnc", cols, wmat)  # MXU
    if bias is not None:
        out = out + bias
    return out.reshape(b, ho, wo, cout)


def deform_psroi_pool(
    feat: jax.Array,          # [B, H, W, C]
    rois: jax.Array,          # [N, 5] (batch_idx, x1, y1, x2, y2) image coords
    trans: jax.Array | None,  # [N, 2, P, P] per-part (dx, dy), or None
    *,
    pooled_size: int,
    spatial_scale: float,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
) -> jax.Array:
    """Deformable position-sensitive ROI pooling forward (NHWC).

    TPU-native counterpart of the reference's second dcn_v2 kernel
    (ref lib/csrc/dcn_v2/src/cuda/dcn_v2_psroi_pooling_cuda.cu:58-146
    DeformablePSROIPoolForwardKernel) in the configuration its Python
    wrapper uses (group_size=1, part_size=pooled_size, one class —
    ref lib/networks/dcn_v2.py:187-220): each pooled bin is shifted by a
    per-part normalized offset, sampled at sample_per_part² bilinear taps,
    and averaged over the in-bounds taps. Backward comes from autodiff
    (the gather transposes to the CUDA scatter-add backward kernel).

    Gradient-semantics note: for taps in the clamp zones (ws in [-0.5, 0) or
    (W-1, W-0.5], likewise hs) autodiff flows through jnp.clip and yields a
    zero gradient w.r.t. `trans`, whereas the CUDA backward computes a
    nonzero bilinear-diff gradient at the clamped coordinate. The JAX value
    is the true derivative of this forward; the divergence only affects
    parts sitting exactly at ROI/image edges.

    Returns [N, pooled_size, pooled_size, C].
    """
    _, hgt, wid, _ = feat.shape
    p = pooled_size
    s = sample_per_part
    rois = rois.astype(jnp.float32)

    iy = jax.lax.broadcasted_iota(jnp.float32, (p, p), 0)   # ph
    ix = jax.lax.broadcasted_iota(jnp.float32, (p, p), 1)   # pw

    def one_roi(roi, tr):
        b_idx = roi[0].astype(jnp.int32)
        # round + half-pixel shift exactly as the kernel (:90-93). C round()
        # is half-away-from-zero, NOT numpy/jnp half-to-even — a .5 ROI coord
        # must land on the same pixel as the CUDA kernel.
        def _round_c(x):
            return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)

        start_w = _round_c(roi[1]) * spatial_scale - 0.5
        start_h = _round_c(roi[2]) * spatial_scale - 0.5
        end_w = (_round_c(roi[3]) + 1.0) * spatial_scale - 0.5
        end_h = (_round_c(roi[4]) + 1.0) * spatial_scale - 0.5
        roi_w = jnp.maximum(end_w - start_w, 0.1)
        roi_h = jnp.maximum(end_h - start_h, 0.1)
        bin_w = roi_w / p
        bin_h = roi_h / p
        sub_w = bin_w / s
        sub_h = bin_h / s

        trans_x = tr[0] * trans_std * roi_w   # [P, P]
        trans_y = tr[1] * trans_std * roi_h

        wstart = ix * bin_w + start_w + trans_x
        hstart = iy * bin_h + start_h + trans_y

        off = (jnp.arange(s, dtype=jnp.float32))
        shape = (p, p, s, s)
        ws = jnp.broadcast_to(
            wstart[..., None, None] + off[None, None, None, :] * sub_w, shape
        )
        hs = jnp.broadcast_to(
            hstart[..., None, None] + off[None, None, :, None] * sub_h, shape
        )
        valid = (
            (ws >= -0.5) & (ws <= wid - 0.5) & (hs >= -0.5) & (hs <= hgt - 0.5)
        )
        wc = jnp.clip(ws, 0.0, wid - 1.0).reshape(-1)
        hc = jnp.clip(hs, 0.0, hgt - 1.0).reshape(-1)
        vals = _bilinear_gather(jnp.take(feat, b_idx, axis=0), hc, wc)
        vals = vals.reshape(p, p, s, s, -1) * valid[..., None]
        cnt = valid.sum((-1, -2)).astype(feat.dtype)            # [P, P]
        total = vals.sum((2, 3))                                 # [P, P, C]
        return jnp.where(cnt[..., None] > 0, total / jnp.maximum(cnt, 1.0)[..., None], 0.0)

    if trans is None:
        trans = jnp.zeros((rois.shape[0], 2, p, p), jnp.float32)
    return jax.vmap(one_roi)(rois, trans.astype(jnp.float32))


class DCNPooling(nn.Module):
    """Deformable ROI pooling that predicts its own part offsets and
    modulation masks from a first non-deformable pooling pass through a
    3-layer MLP with zero-initialized head, so training starts as plain
    position-sensitive average pooling (ref lib/networks/dcn_v2.py:223-289
    DCNPooling: roi_align → offset_mask_fc → deformable pool × sigmoid mask).

    Deliberate deviation: trans_std defaults to 0.1 here vs the reference
    class default of 0.0 — a 0.0 std makes the predicted offsets inert, so
    the deformable path would be a no-op out of the box. Pass trans_std=0.0
    to reproduce the reference default exactly.
    """

    pooled_size: int
    spatial_scale: float
    no_trans: bool = False
    sample_per_part: int = 4
    trans_std: float = 0.1
    deform_fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, rois):
        p = self.pooled_size
        feat32 = feat.astype(jnp.float32)
        base = deform_psroi_pool(
            feat32, rois, None,
            pooled_size=p, spatial_scale=self.spatial_scale,
            sample_per_part=self.sample_per_part, trans_std=self.trans_std,
        )
        if self.no_trans:
            return base.astype(self.dtype)
        n = rois.shape[0]
        x = base.reshape(n, -1)
        x = nn.relu(nn.Dense(self.deform_fc_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.deform_fc_dim, name="fc2")(x))
        om = nn.Dense(
            3 * p * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="offset_mask",
        )(x).reshape(n, 3, p, p)
        trans = om[:, :2]                         # (dx, dy) per part
        mask = nn.sigmoid(om[:, 2])               # [n, P, P]
        out = deform_psroi_pool(
            feat32, rois, trans,
            pooled_size=p, spatial_scale=self.spatial_scale,
            sample_per_part=self.sample_per_part, trans_std=self.trans_std,
        )
        return (out * mask[..., None]).astype(self.dtype)


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
        # keep x in the module dtype: the bilinear gather moves half the
        # bytes in bf16 and deform_conv2d upcasts rows at the weighted sum;
        # offsets/mask stay fp32 (position math needs the mantissa)
        out = deform_conv2d(
            x,
            offset.astype(jnp.float32),
            mask.astype(jnp.float32),
            weight,
            bias,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
        )
        return out.astype(self.dtype)
