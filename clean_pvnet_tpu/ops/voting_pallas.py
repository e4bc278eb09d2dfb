"""Pallas TPU kernel for RANSAC inlier counting.

TPU-native rebuild of the reference's `voting_for_hypothesis` CUDA kernel +
host-side sum (ref lib/csrc/ransac_voting/src/ransac_voting_kernel.cu:88-126
and ransac_voting_gpu.py:155-156): instead of materializing the
[hn, vn, tn] inlier byte tensor in HBM (up to 512·9·30000 ≈ 138M elements)
and reducing it afterwards, the kernel tiles hypotheses × pixels into VMEM,
evaluates the cos-angle test on the VPU, and accumulates per-hypothesis
inlier *counts* in place — the 3-tensor never exists.

Grid: (vn, HN/block_h, T/block_t); the T axis accumulates into the same
output block (revisited-block accumulation, initialized at t==0).

Layout notes: arrays are pre-split into planar [vn, N] / [1, N] float32
buffers so every BlockSpec has a 128-aligned lane dimension; callers pad
HN and T to multiples of the block sizes (padding pixels carry valid=0 and
padded hypotheses simply produce counts that are ignored).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _count_kernel(dirx_ref, diry_ref, cx_ref, cy_ref, valid_ref,
                  hx_ref, hy_ref, thresh_ref, out_ref):
    ti = pl.program_id(2)

    @pl.when(ti == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dirx = dirx_ref[0, 0, :]          # [BT]
    diry = diry_ref[0, 0, :]
    cx = cx_ref[0, 0, :]
    cy = cy_ref[0, 0, :]
    valid = valid_ref[0, 0, :]
    hx = hx_ref[0, 0, :]              # [BH]
    hy = hy_ref[0, 0, :]
    thresh = thresh_ref[0]

    # sqrt/div-free inlier test: for thresh > 0,
    #   cos = num / (|d| · |delta|) > thresh
    #   ⟺  num > 0  ∧  num² > thresh² · |d|² · |delta|²
    # — pure mul/add on the VPU (no rsqrt/div pipeline stalls); the cos is
    # never materialized. Same accept region as the CUDA kernel's
    # cos-angle test (ref ransac_voting_kernel.cu:105-125) up to one ulp
    # at the decision boundary.
    n1sq = dirx * dirx + diry * diry          # [BT]
    t2n1 = (thresh * thresh) * n1sq           # [BT]
    okv = (n1sq >= 1e-12) & (valid > 0)       # [BT]
    dx = hx[:, None] - cx[None, :]            # [BH, BT]
    dy = hy[:, None] - cy[None, :]
    num = dx * dirx[None, :] + dy * diry[None, :]
    n2sq = dx * dx + dy * dy                  # [BH, BT]
    inlier = (
        okv[None, :]
        & (n2sq >= 1e-12)
        & (num > 0.0)
        & (num * num > t2n1[None, :] * n2sq)
    )
    out_ref[0, 0, :] += jnp.sum(inlier.astype(jnp.float32), axis=1)


def _count_kernel_mxu(p_ref, q_ref, out_ref):
    """MXU variant: num and the *threshold-scaled* ‖delta‖² as K=4 matmuls,
    with pixels on SUBLANES and hypotheses on LANES.

    For hypothesis q=(hx,hy) and pixel p=(cx,cy) with direction d and the
    per-pixel scale s = thresh²·‖d‖² (zeroed for invalid/degenerate pixels):
      num    = d·(q-p)      = [dirx, diry, -(p·d), 0]   · [hx, hy, 1, 0]
      s·n2sq = s·‖q-p‖²     = [s·cx, s·cy, s, s·‖p‖²]  · [-2hx, -2hy, ‖q‖², 1]
    so each [BT, BH] tile is two [BT,4]×[4,BH] MXU passes. Folding s into
    the operands removes the per-element threshold multiply, and the tile
    orientation makes the pixel reduction a sublane (not cross-lane)
    reduction — the accumulate runs at VPU row speed. The inlier test
      cos > thresh  ⟺  num > 0 ∧ num² > s·n2sq     (thresh > 0)
    and the CUDA guards ‖d‖ ≥ 1e-6, ‖delta‖ ≥ 1e-6 become s·n2sq > s·1e-12
    (s ≡ row 6 of P). Callers mean-center coordinates to keep the expanded
    ‖q-p‖² from cancelling in f32.
    """
    ti = pl.program_id(2)

    @pl.when(ti == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    P = p_ref[0]                      # [8, BT]  (8 on sublanes: layout-friendly)
    Q = q_ref[0]                      # [8, BH]

    # contract the K=8 sublane axis of both operands: lhs-transposed matmul
    dn = (((0,), (0,)), ((), ()))
    num = jax.lax.dot_general(P[:4, :], Q[:4, :], dn,
                              preferred_element_type=jnp.float32)   # [BT, BH]
    sn2 = jax.lax.dot_general(P[4:, :], Q[4:, :], dn,
                              preferred_element_type=jnp.float32)   # [BT, BH]
    eps = P[6:7, :].T * 1e-12         # [BT, 1] = s·1e-12
    inlier = (sn2 > eps) & (num > 0.0) & (num * num > sn2)
    out_ref[0, 0, :] += jnp.sum(inlier.astype(jnp.float32), axis=0)


@partial(
    jax.jit,
    static_argnames=("block_h", "block_t", "interpret", "mxu"),
)
def count_inliers_pallas(
    direct: jax.Array,   # [T, vn, 2]
    coords: jax.Array,   # [T, 2]
    valid: jax.Array,    # [T] bool
    hyp: jax.Array,      # [HN, vn, 2]
    inlier_thresh: float | jax.Array,
    block_h: int = 512,
    block_t: int = 2048,
    interpret: bool = False,
    mxu: bool = True,
) -> jax.Array:
    """Returns counts [HN, vn] int32 — same contract as the jnp
    `_count_inliers_chunked` (ops/voting.py) and the CUDA kernel + sum.

    Requires inlier_thresh > 0 (the kernel squares the threshold; the
    voting configs use 0.99/0.999, ref ransac_voting_gpu.py:112,202).

    mxu=True (default) uses the matmul formulation (`_count_kernel_mxu`);
    mxu=False keeps the pure-VPU broadcast kernel."""
    if isinstance(inlier_thresh, (int, float)) and inlier_thresh <= 0:
        raise ValueError(f"inlier_thresh must be > 0, got {inlier_thresh}")
    t, vn, _ = direct.shape
    hn = hyp.shape[0]

    pad_t = (-t) % block_t
    pad_h = (-hn) % block_h
    tp = t + pad_t
    hp = hn + pad_h
    thresh = jnp.asarray([inlier_thresh], jnp.float32)
    grid = (vn, hp // block_h, tp // block_t)

    if mxu:
        # mean-center both coordinate sets (translation-invariant test) so
        # the expanded ‖q-p‖² keeps ~4 extra bits of f32 precision
        mu = jnp.sum(
            jnp.where(valid[:, None], coords, 0.0), 0
        ) / jnp.maximum(jnp.sum(valid), 1)
        c = coords - mu[None, :]
        q = hyp - mu[None, None, :]
        d = direct * valid.astype(direct.dtype)[:, None, None]

        # P [vn, 8, TP]: per-pixel columns
        #   [dirx, diry, -(p·d), 0, s·cx, s·cy, s, s·‖p‖²],  s = thresh²·‖d‖²
        # (pixels on the lane axis so HBM layout pads nothing)
        dirx, diry = d[:, :, 0].T, d[:, :, 1].T          # [vn, T]
        cx, cy = c[:, 0], c[:, 1]                        # [T]
        pd = dirx * cx[None, :] + diry * cy[None, :]     # [vn, T]
        csq = cx * cx + cy * cy                          # [T]
        n1sq = dirx * dirx + diry * diry                 # [vn, T]
        thr2 = jnp.square(jnp.asarray(inlier_thresh, jnp.float32))
        s = jnp.where(n1sq >= 1e-12, thr2 * n1sq, 0.0)   # [vn, T]
        P = jnp.stack(
            [dirx, diry, -pd, jnp.zeros((vn, t), jnp.float32),
             s * cx[None, :], s * cy[None, :], s, s * csq[None, :]],
            axis=1,
        )                                                # [vn, 8, T]
        P = jnp.pad(P, ((0, 0), (0, 0), (0, pad_t)))

        # Q [vn, 8, HP]: per-hypothesis cols [hx, hy, 1, 0, -2hx, -2hy, ‖q‖², 1]
        hx, hy = q[:, :, 0].T, q[:, :, 1].T              # [vn, HN]
        onesH = jnp.ones((vn, hn), jnp.float32)
        Q = jnp.stack(
            [hx, hy, onesH, jnp.zeros((vn, hn), jnp.float32),
             -2.0 * hx, -2.0 * hy, hx * hx + hy * hy, onesH],
            axis=1,
        )                                                # [vn, 8, HN]
        Q = jnp.pad(Q, ((0, 0), (0, 0), (0, pad_h)))

        counts = pl.pallas_call(
            _count_kernel_mxu,
            out_shape=jax.ShapeDtypeStruct((vn, 1, hp), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 8, block_t), lambda v, h, t: (v, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, block_h), lambda v, h, t: (v, 0, h),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, block_h), lambda v, h, t: (v, 0, h),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(P, Q)
        return counts[:, 0, :hn].T.astype(jnp.int32)  # [HN, vn]

    # [vn, 1, TP] / [1, 1, TP] layouts: the singleton sublane dim satisfies
    # the TPU block-shape rule (block sublane == full array dim)
    dirx = jnp.pad(direct[:, :, 0].T, ((0, 0), (0, pad_t)))[:, None, :]
    diry = jnp.pad(direct[:, :, 1].T, ((0, 0), (0, pad_t)))[:, None, :]
    cx = jnp.pad(coords[:, 0], (0, pad_t))[None, None, :]
    cy = jnp.pad(coords[:, 1], (0, pad_t))[None, None, :]
    val = jnp.pad(valid.astype(jnp.float32), (0, pad_t))[None, None, :]
    hx = jnp.pad(hyp[:, :, 0].T, ((0, 0), (0, pad_h)))[:, None, :]
    hy = jnp.pad(hyp[:, :, 1].T, ((0, 0), (0, pad_h)))[:, None, :]

    counts = pl.pallas_call(
        _count_kernel,
        out_shape=jax.ShapeDtypeStruct((vn, 1, hp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_t), lambda v, h, t: (v, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t), lambda v, h, t: (v, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t), lambda v, h, t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t), lambda v, h, t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t), lambda v, h, t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_h), lambda v, h, t: (v, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_h), lambda v, h, t: (v, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_h), lambda v, h, t: (v, 0, h),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dirx, diry, cx, cy, val, hx, hy, thresh)

    return counts[:, 0, :hn].T.astype(jnp.int32)  # [HN, vn]
