"""Projective (vanishing-point) RANSAC voting for truncated objects.

Behavioral counterpart of the reference's 3-component hypothesis kernels
(ref lib/csrc/ransac_voting/src/ransac_voting_kernel.cu:170-310):
keypoints of truncated objects can lie far outside (or at infinity of) the
crop, so hypotheses are homogeneous points — the cross product of the two
pixel rays' lines — with a direction-consistency check, and voting uses
|cos| with a same-side test instead of signed cos.

Used by the Truncation-LINEMOD evaluation path (the reference ships the
dataset test-only, ref TRUNCATION_LINEMOD.md:1-10).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from clean_pvnet_tpu.ops.voting import refit_ls, select_foreground


def generate_hypotheses_projective(
    direct: jax.Array, coords: jax.Array, idx_pairs: jax.Array
) -> jax.Array:
    """[T,vn,2], [T,2], [hn,vn,2] int → homogeneous hypotheses [hn,vn,3].

    (ref ransac_voting_kernel.cu:171-229: line through each pixel along its
    predicted direction, intersection = line cross product; zeroed when the
    two rays are inconsistent, sign-flipped so both rays point toward it.)
    """
    vn = idx_pairs.shape[1]
    varange = jnp.arange(vn)
    d0 = direct[idx_pairs[..., 0], varange[None, :], :]
    d1 = direct[idx_pairs[..., 1], varange[None, :], :]
    c0 = coords[idx_pairs[..., 0]]
    c1 = coords[idx_pairs[..., 1]]

    def line(d, c):
        return jnp.stack(
            [d[..., 1], -d[..., 0], c[..., 1] * d[..., 0] - c[..., 0] * d[..., 1]],
            -1,
        )

    l0 = line(d0, c0)
    l1 = line(d1, c1)
    p = jnp.cross(l0, l1)  # [hn, vn, 3] = (x, y, z)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]

    val_x0 = d0[..., 0] * (x - z * c0[..., 0])
    val_x1 = d1[..., 0] * (x - z * c1[..., 0])
    val_y0 = d0[..., 1] * (y - z * c0[..., 1])
    val_y1 = d1[..., 1] * (y - z * c1[..., 1])

    flip = (val_x0 < 0) & (val_x1 < 0) & (val_y0 < 0) & (val_y1 < 0)
    p = jnp.where(flip[..., None], -p, p)
    bad = (val_x0 * val_x1 < 0) | (val_y0 * val_y1 < 0)
    return jnp.where(bad[..., None], 0.0, p)


def inlier_mask_projective(
    hyp: jax.Array, direct: jax.Array, coords: jax.Array, valid: jax.Array,
    inlier_thresh: float,
) -> jax.Array:
    """[hn,vn,3] hypotheses → bool [hn,vn,T]
    (ref ransac_voting_kernel.cu:270-310)."""
    hz = hyp[..., 2][:, :, None]  # [hn, vn, 1]
    diff_x = hyp[..., 0][:, :, None] - coords[None, None, :, 0] * hz
    diff_y = hyp[..., 1][:, :, None] - coords[None, None, :, 1] * hz
    dx = jnp.swapaxes(direct[..., 0], 0, 1)[None]  # [1, vn, T]
    dy = jnp.swapaxes(direct[..., 1], 0, 1)[None]
    n1 = jnp.sqrt(dx * dx + dy * dy)
    n2 = jnp.sqrt(diff_x * diff_x + diff_y * diff_y)
    ok = (n1 >= 1e-6) & (n2 >= 1e-6) & valid[None, None, :]
    cos = (dx * diff_x + dy * diff_y) / jnp.where(ok, n1 * n2, 1.0)
    same_side = (diff_x * dx >= 0) & (diff_y * dy >= 0)
    return ok & same_side & (jnp.abs(cos) > inlier_thresh)


@partial(
    jax.jit,
    static_argnames=("num_hypotheses", "max_pixels", "min_pixels"),
)
def ransac_vote_projective(
    mask: jax.Array,
    vertex: jax.Array,
    key: jax.Array,
    num_hypotheses: int = 256,
    inlier_thresh: float = 0.99,
    max_pixels: int = 1024,
    min_pixels: int = 5,
):
    """Truncation-tolerant decode: returns homogeneous keypoints [vn, 3]
    (normalize by z when z≠0; z≈0 encodes a vanishing direction) plus the
    winning inlier ratio [vn]."""
    vn = vertex.shape[2]
    k_sel, k_hyp = jax.random.split(key)
    coords, flat_idx, valid = select_foreground(mask, k_sel, max_pixels)
    tv = jnp.sum(valid)
    enough = tv >= min_pixels
    direct = vertex.reshape(-1, vn, 2)[flat_idx] * valid[:, None, None]

    u = jax.random.uniform(k_hyp, (num_hypotheses, vn, 2))
    idx_pairs = jnp.clip(
        jnp.floor(u * jnp.maximum(tv, 1)).astype(jnp.int32), 0, max_pixels - 1
    )
    hyp = generate_hypotheses_projective(direct, coords, idx_pairs)
    inl = inlier_mask_projective(hyp, direct, coords, valid, inlier_thresh)
    counts = jnp.sum(inl, -1)
    win = jnp.argmax(counts, 0)
    win_pts = hyp[win, jnp.arange(vn)]
    ratio = counts[win, jnp.arange(vn)].astype(jnp.float32) / jnp.maximum(tv, 1)

    # subpixel refit on the winner's inliers for FINITE winners (same LS
    # ray-intersection as the standard path's _refit); near-vanishing
    # winners (|z|≈0) have no finite intersection and keep the raw
    # hypothesis. Without this, keypoint accuracy is capped at the best
    # random pixel-pair intersection.
    w = inlier_mask_projective(
        win_pts[None], direct, coords, valid, inlier_thresh
    )[0].astype(jnp.float32)
    refined, ok = refit_ls(w, direct, coords)
    z = win_pts[..., 2]
    finite = jnp.abs(z) > 1e-6 * jnp.maximum(
        jnp.max(jnp.abs(win_pts[..., :2]), -1), 1.0
    )
    use = finite & ok
    hom_refined = jnp.concatenate(
        [refined, jnp.ones_like(refined[..., :1])], -1
    )
    win_pts = jnp.where(use[:, None], hom_refined, win_pts)

    win_pts = jnp.where(enough, win_pts, 0.0)
    return win_pts, jnp.where(enough, ratio, 0.0)
