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

    dx = hx[:, None] - cx[None, :]          # [BH, BT]
    dy = hy[:, None] - cy[None, :]
    num = dx * dirx[None, :] + dy * diry[None, :]
    n1 = jnp.sqrt(dirx * dirx + diry * diry)  # [BT]
    n2sq = dx * dx + dy * dy                  # [BH, BT]
    ok = (n1[None, :] >= 1e-6) & (n2sq >= 1e-12) & (valid[None, :] > 0)
    cos = num / jnp.where(ok, n1[None, :] * jnp.sqrt(n2sq), 1.0)
    inlier = ok & (cos > thresh)
    out_ref[0, 0, :] += jnp.sum(inlier.astype(jnp.float32), axis=1)


@partial(
    jax.jit,
    static_argnames=("block_h", "block_t", "interpret"),
)
def count_inliers_pallas(
    direct: jax.Array,   # [T, vn, 2]
    coords: jax.Array,   # [T, 2]
    valid: jax.Array,    # [T] bool
    hyp: jax.Array,      # [HN, vn, 2]
    inlier_thresh: float | jax.Array,
    block_h: int = 256,
    block_t: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns counts [HN, vn] int32 — same contract as the jnp
    `_count_inliers_chunked` (ops/voting.py) and the CUDA kernel + sum."""
    t, vn, _ = direct.shape
    hn = hyp.shape[0]

    pad_t = (-t) % block_t
    pad_h = (-hn) % block_h
    tp = t + pad_t
    hp = hn + pad_h

    # [vn, 1, TP] / [1, 1, TP] layouts: the singleton sublane dim satisfies
    # the TPU block-shape rule (block sublane == full array dim)
    dirx = jnp.pad(direct[:, :, 0].T, ((0, 0), (0, pad_t)))[:, None, :]
    diry = jnp.pad(direct[:, :, 1].T, ((0, 0), (0, pad_t)))[:, None, :]
    cx = jnp.pad(coords[:, 0], (0, pad_t))[None, None, :]
    cy = jnp.pad(coords[:, 1], (0, pad_t))[None, None, :]
    val = jnp.pad(valid.astype(jnp.float32), (0, pad_t))[None, None, :]
    hx = jnp.pad(hyp[:, :, 0].T, ((0, 0), (0, pad_h)))[:, None, :]
    hy = jnp.pad(hyp[:, :, 1].T, ((0, 0), (0, pad_h)))[:, None, :]
    thresh = jnp.asarray([inlier_thresh], jnp.float32)

    grid = (vn, hp // block_h, tp // block_t)

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
