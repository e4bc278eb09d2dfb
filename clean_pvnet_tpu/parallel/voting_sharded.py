"""Hypothesis-sharded RANSAC voting over a device mesh.

The BASELINE.json north star calls for "per-keypoint voting hypotheses
sharded and reduced via psum/all-gather collectives". This module runs the
voting decode of ops/voting.py under `shard_map` over the mesh's `hyp`
axis: every device generates and scores its own slice of the hypothesis
population against the (replicated) pixel set, the per-device winners are
`all_gather`ed and reduced, and the final least-squares refit — identical
on every device — happens replicated so no broadcast is needed.

Use case: the uncertainty path's large populations (4096+ hypotheses ×
30k pixels, ref ransac_voting_gpu.py:202-274) and batch-1 latency-critical
serving where a single image can fan out across a slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from clean_pvnet_tpu.ops.voting import (
    _count_inliers_chunked,
    _inlier_mask,
    _refit,
    generate_hypotheses_rolled,
    select_foreground,
)


def make_sharded_vote(
    mesh: Mesh,
    hyp_axis: str = "hyp",
    num_hypotheses: int = 1024,
    inlier_thresh: float = 0.99,
    max_pixels: int = 4096,
    min_pixels: int = 5,
    hyp_chunk: int = 0,
):
    """Returns a jitted fn (mask [H,W], vertex [H,W,vn,2], key) → (kpt [vn,2],
    ratio [vn]). `num_hypotheses` is the GLOBAL population; each device
    scores num_hypotheses / axis_size of it."""
    n_shards = mesh.shape[hyp_axis]
    assert num_hypotheses % n_shards == 0, (num_hypotheses, n_shards)
    local_hn = num_hypotheses // n_shards

    def body(mask, vertex, key):
        vn = vertex.shape[2]
        shard_id = jax.lax.axis_index(hyp_axis)
        k_sel, k_hyp = jax.random.split(key)
        # pixel selection uses the SHARED key → identical on every shard
        coords, flat_idx, valid = select_foreground(mask, k_sel, max_pixels)
        tv = jnp.sum(valid)
        enough = tv >= min_pixels
        direct = vertex.reshape(-1, vn, 2)[flat_idx] * valid[:, None, None]

        # per-shard hypothesis slice: continue the global rolled i0 sequence
        # (shard s covers [s·local_hn, (s+1)·local_hn) of arange(hn) mod tv)
        k_local = jax.random.fold_in(k_hyp, shard_id)
        hyp = generate_hypotheses_rolled(
            direct, coords, tv, k_local, local_hn, start=shard_id * local_hn
        )
        if hyp_chunk and local_hn > hyp_chunk:
            counts = _count_inliers_chunked(
                hyp, direct, coords, valid, inlier_thresh, hyp_chunk
            )
        else:
            counts = jnp.sum(
                _inlier_mask(hyp, direct, coords, valid, inlier_thresh),
                -1,
                dtype=jnp.int32,
            )

        # local winner per keypoint, then global reduction over the axis
        win_idx = jnp.argmax(counts, 0)
        win_counts = jnp.take_along_axis(counts, win_idx[None], 0)[0]  # [vn]
        win_pts = hyp[win_idx, jnp.arange(vn)]  # [vn, 2]

        all_counts = jax.lax.all_gather(win_counts, hyp_axis)  # [S, vn]
        all_pts = jax.lax.all_gather(win_pts, hyp_axis)  # [S, vn, 2]
        best_shard = jnp.argmax(all_counts, 0)  # [vn]
        global_pts = all_pts[best_shard, jnp.arange(vn)]

        # refit on the replicated pixel set — identical on every shard
        refined, ratio = _refit(global_pts, direct, coords, valid, inlier_thresh)
        refined = jnp.where(enough, refined, 0.0)
        ratio = jnp.where(enough, ratio, 0.0)
        return refined, ratio

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
