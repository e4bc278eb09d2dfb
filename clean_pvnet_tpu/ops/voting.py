"""Fixed-shape RANSAC keypoint voting, fully on-device.

TPU-native re-design of the reference CUDA voting stack
(ref lib/csrc/ransac_voting/src/ransac_voting_kernel.cu:11-126 kernels and
ref lib/csrc/ransac_voting/ransac_voting_gpu.py:112-274 host drivers).

Key departures from the reference, imposed by XLA (see SURVEY.md §7):
  * `torch.nonzero`/`masked_select` (dynamic pixel count) → uniform
    sampling-without-replacement of a *static* pixel budget via randomized
    top-k (`select_foreground`), with validity masks.
  * the data-dependent adaptive RANSAC round loop
    (ransac_voting_gpu.py:150-174) → a `lax.while_loop` with a *static*
    round bound (`num_rounds`) and the reference's confidence stop
    `1-(1-r²)^N > confidence` as the dynamic condition. XLA compiles one
    round body; easy images exit after round 1, occluded/low-inlier images
    spend up to num_rounds×num_hypotheses — the reference's adaptive
    budget, without dynamic shapes.
  * the per-image Python loop over the batch → `jax.vmap`.
  * the [hn, vn, tn] inlier tensor (up to 512·9·30000 elements,
    ransac_voting_gpu.py:155) is never materialized for large budgets:
    inlier counts are reduced per hypothesis-chunk inside a `lax.scan`
    (`_count_inliers_chunked`), and a Pallas kernel covers the hot shape
    (see ops/voting_pallas.py).

Math parity with the CUDA kernels:
  * hypothesis = intersection of two pixel rays via their normals
    n = (d.y, -d.x)          (ref ransac_voting_kernel.cu:31-47)
  * inlier     = cos angle between d and (hyp - pixel) > inlier_thresh
                                           (ref ransac_voting_kernel.cu:105-125)
  * refit      = weighted least-squares ray intersection over winner inliers,
    solving the per-keypoint 2×2 normal equations
                                           (ref ransac_voting_gpu.py:177-198)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class VoteResult(NamedTuple):
    kpt_2d: jax.Array        # [vn, 2]  refined keypoint locations (pixels)
    inlier_ratio: jax.Array  # [vn]     winning hypothesis inlier ratio
    valid: jax.Array         # []       bool: enough foreground pixels voted
    mean: jax.Array          # [vn, 2]  winner refit mean (same as kpt_2d)


def select_foreground(
    mask: jax.Array, key: jax.Array, max_pixels: int, approx: bool = False,
    weights: jax.Array | None = None, stride_block: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sample up to `max_pixels` foreground pixels uniformly w/o replacement.

    Replaces the reference's dynamic nonzero + Bernoulli downsample
    (ref ransac_voting_gpu.py:128-143) with a static-shape randomized top-k.

    `approx=True` uses the TPU-optimized `lax.approx_max_k` instead of the
    exact sort-based top-k. Because the priorities are iid uniform, every
    foreground pixel is exchangeable, so any value-based (even approximate)
    selection still yields a uniformly random foreground subset — the only
    effect is that for images with more foreground than `max_pixels` a few
    slots may fall to lower-priority pixels (still uniform), and for sparse
    masks a small fraction (~1-recall) of foreground pixels may be missed.

    Optional `weights` [H, W] bias the sample toward confident pixels
    (e.g. softmax segmentation probability) while staying a true sample
    without replacement — the reference always samples uniformly.

    mask [H, W] -> (coords [T, 2] float (x, y), flat_idx [T] int32, valid [T]).
    Valid entries are contiguous at the front (top-k sorts descending).
    """
    h, w = mask.shape
    fg = mask > 0
    u = jax.random.uniform(key, (h, w), minval=1e-6, maxval=1.0)
    if weights is not None:
        # Efraimidis–Spirakis keys in LOG space: top-k of log(u)/w is the
        # same weighted sample without replacement as top-k of u^(1/w)
        # (neural-guided-RANSAC-style, arXiv:1905.04132) but never
        # underflows — u^(1/w) hits exactly 0 in fp32 for w ≲ 0.01, which
        # silently dropped small-weight pixels from the valid set.
        # log(u) ∈ (-13.8, 0); keys are finite for any weight > 0.
        pri = jnp.log(u) / jnp.maximum(weights, 1e-6)
        pri = jnp.where(fg & (weights > 0), pri, -jnp.inf)
        floor = jnp.float32(-1e30)  # any finite key beats this
    else:
        pri = jnp.where(fg, u, -jnp.inf)
        floor = jnp.float32(0.0)
    if stride_block > 1:
        # Block-stratified selection: the top-k sort network — not HBM —
        # dominates the serving decode's selection stage (28.8 ms of a
        # 91.7 ms decode at batch 64; data/logs/profile_voting_r05.log),
        # so shrink the SORT: reduce each run of `stride_block` consecutive
        # pixels to its max-priority element, sort only the block maxima,
        # and recover the winner's position from an in-block argmax. At
        # most one pixel per block is selectable, so the sample is
        # SPATIALLY STRATIFIED rather than iid-uniform over the foreground
        # — still uniform WITHIN each block, and accuracy-validated as a
        # serving option (ablation fg_strided row) like approx_fg.
        B = stride_block
        n = h * w
        pf = pri.reshape(-1)
        if n % B:
            pf = jnp.pad(pf, (0, B - n % B), constant_values=-jnp.inf)
        blocks = pf.reshape(-1, B)
        bmax = jnp.max(blocks, -1)
        barg = jnp.argmax(blocks, -1).astype(jnp.int32)
        vals, bidx = jax.lax.top_k(bmax, max_pixels)
        idx = bidx * B + barg[bidx]
    elif approx:
        vals, idx = jax.lax.approx_max_k(
            pri.reshape(-1), max_pixels, recall_target=0.95,
            aggregate_to_topk=True,
        )
    else:
        vals, idx = jax.lax.top_k(pri.reshape(-1), max_pixels)
    # validity by finiteness of the key, not positivity — stable for any
    # positive weight (ADVICE r2)
    valid = vals > floor if weights is None else jnp.isfinite(vals)
    xs = (idx % w).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    coords = jnp.stack([xs, ys], -1)
    return coords, idx.astype(jnp.int32), valid


def generate_hypotheses(
    direct: jax.Array, coords: jax.Array, idx_pairs: jax.Array
) -> jax.Array:
    """Intersect pairs of pixel rays. (ref ransac_voting_kernel.cu:11-49)

    direct [T, vn, 2], coords [T, 2], idx_pairs [hn, vn, 2] int -> [hn, vn, 2].
    Near-parallel pairs produce (0, 0), matching the CUDA kernel's behavior of
    leaving the zero-initialized output untouched.
    """
    vn = idx_pairs.shape[1]
    varange = jnp.arange(vn)
    d0 = direct[idx_pairs[..., 0], varange[None, :], :]  # [hn, vn, 2]
    d1 = direct[idx_pairs[..., 1], varange[None, :], :]
    c0 = coords[idx_pairs[..., 0]]  # [hn, vn, 2]
    c1 = coords[idx_pairs[..., 1]]

    nx0, ny0 = d0[..., 1], -d0[..., 0]
    nx1, ny1 = d1[..., 1], -d1[..., 0]
    cx0, cy0 = c0[..., 0], c0[..., 1]
    cx1, cy1 = c1[..., 0], c1[..., 1]

    denom = nx1 * ny0 - nx0 * ny1
    ok = jnp.abs(denom) >= 1e-6
    safe = jnp.where(ok, denom, 1.0)
    b0 = nx0 * cx0 + ny0 * cy0
    b1 = nx1 * cx1 + ny1 * cy1
    y = (nx1 * b0 - nx0 * b1) / safe
    x = -(ny1 * b0 - ny0 * b1) / safe
    hyp = jnp.stack([x, y], -1)
    return jnp.where(ok[..., None], hyp, 0.0)


def generate_hypotheses_rolled(
    direct: jax.Array,       # [T, vn, 2]
    coords: jax.Array,       # [T, 2]
    valid_count: jax.Array,  # [] int — tv valid front-packed pixels
    key: jax.Array,
    num_hypotheses: int,
    start: int | jax.Array = 0,
) -> jax.Array:
    """Gather-light hypothesis generation: pixel i0 = (start + h) mod tv
    pairs with i1 = (i0 + random offset) mod tv, offset uniform in [1, tv).
    `start` lets hypothesis-sharded callers continue the global i0 sequence
    (shard s passes start = s · local_hn).

    Because `select_foreground` orders pixels by an iid-uniform priority,
    (i0, i1) is a uniform random ordered pair of *distinct* foreground
    pixels — the same distribution the reference draws with iid indices
    (ref ransac_voting_gpu.py:151-153) minus its i0==i1 degenerate draws —
    but it needs two [hn]-row gathers instead of hn·vn·2 element gathers,
    and shares the pixel pair across keypoints (each keypoint still gets an
    independent ray intersection from its own direction field).

    Interaction with weighted sampling (ADVICE r2): when the caller selected
    pixels with `weights`, the front-packed order is sorted by descending
    E-S key, so the deterministic i0 = arange(hn) % tv walks the hn most
    *confident* pixels first rather than a weighted random draw (i1 stays a
    uniform random partner). This bias toward confident first-ray pixels is
    intentional — it is the neural-guided-RANSAC behavior the weighting
    exists for — but callers wanting an unbiased weighted pair should pass a
    random `start` offset.
    Returns hyp [hn, vn, 2]; near-parallel pairs produce (0, 0).
    """
    tv = jnp.maximum(valid_count, 1).astype(jnp.int32)
    hn = num_hypotheses
    i0 = (jnp.int32(start) + jnp.arange(hn, dtype=jnp.int32)) % tv
    u = jax.random.uniform(key, (hn,))
    offs = 1 + jnp.floor(u * jnp.maximum(tv - 1, 1)).astype(jnp.int32)
    i1 = (i0 + offs) % tv
    d0, d1 = direct[i0], direct[i1]      # [hn, vn, 2]
    c0, c1 = coords[i0], coords[i1]      # [hn, 2]

    nx0, ny0 = d0[..., 1], -d0[..., 0]
    nx1, ny1 = d1[..., 1], -d1[..., 0]
    b0 = nx0 * c0[:, None, 0] + ny0 * c0[:, None, 1]
    b1 = nx1 * c1[:, None, 0] + ny1 * c1[:, None, 1]
    denom = nx1 * ny0 - nx0 * ny1
    ok = jnp.abs(denom) >= 1e-6
    safe = jnp.where(ok, denom, 1.0)
    y = (nx1 * b0 - nx0 * b1) / safe
    x = -(ny1 * b0 - ny0 * b1) / safe
    return jnp.where(ok[..., None], jnp.stack([x, y], -1), 0.0)


def _inlier_mask(hyp, direct, coords, valid, inlier_thresh):
    """Dense inlier test. hyp [hn, vn, 2] -> bool [hn, vn, T].

    (ref ransac_voting_kernel.cu:88-126; not-inlier when either norm < 1e-6.)
    """
    delta = hyp[:, :, None, :] - coords[None, None, :, :]  # [hn, vn, T, 2]
    num = jnp.sum(delta * jnp.swapaxes(direct, 0, 1)[None], -1)  # [hn, vn, T]
    n1 = jnp.linalg.norm(direct, axis=-1)  # [T, vn]
    n2 = jnp.linalg.norm(delta, axis=-1)  # [hn, vn, T]
    ok = (n1.T[None] >= 1e-6) & (n2 >= 1e-6) & valid[None, None, :]
    cos = num / jnp.where(ok, n1.T[None] * n2, 1.0)
    return ok & (cos > inlier_thresh)


def _count_inliers_chunked(hyp, direct, coords, valid, inlier_thresh, chunk):
    """Inlier counts without materializing [hn, vn, T]: scan over hyp chunks.

    The inner test is phrased so the pixel axis reduces immediately
    (the SURVEY.md §5.7 'long axis'); peak memory is [chunk, vn, T].
    Returns counts [hn, vn] int32.
    """
    hn = hyp.shape[0]
    assert hn % chunk == 0, (hn, chunk)
    hyp_chunks = hyp.reshape(hn // chunk, chunk, *hyp.shape[1:])

    def body(carry, hyp_c):
        inl = _inlier_mask(hyp_c, direct, coords, valid, inlier_thresh)
        return carry, jnp.sum(inl, -1, dtype=jnp.int32)

    _, counts = jax.lax.scan(body, None, hyp_chunks)
    return counts.reshape(hn, -1)


def _count_inliers(hyp, direct, coords, valid, inlier_thresh, hyp_chunk):
    """Inlier counts [hn, vn]: route to the Pallas TPU kernel for large
    hypothesis×pixel workloads (measured ~2.3× over the XLA scan at the
    uncertainty-PnP shapes, incl. under vmap), else the jnp paths."""
    hn, t = hyp.shape[0], coords.shape[0]
    if jax.default_backend() == "tpu" and hn * t >= (1 << 20):
        from clean_pvnet_tpu.ops.voting_pallas import count_inliers_pallas

        return count_inliers_pallas(direct, coords, valid, hyp, inlier_thresh)
    if hyp_chunk and hn > hyp_chunk:
        return _count_inliers_chunked(
            hyp, direct, coords, valid, inlier_thresh, hyp_chunk
        )
    return jnp.sum(
        _inlier_mask(hyp, direct, coords, valid, inlier_thresh),
        -1,
        dtype=jnp.int32,
    )


def refit_ls(w, direct, coords):
    """Weighted LS ray-intersection: minimize Σ w·d_perp² over the rays.

    w [vn, T] per-ray weights, direct [T, vn, 2], coords [T, 2] →
    (points [vn, 2], ok [vn]) — `ok` false where the 2×2 normal equations
    are degenerate. The solve at the heart of the reference's winner refit
    (ref ransac_voting_gpu.py:177-198)."""
    normal = jnp.stack(
        [jnp.swapaxes(direct[..., 1], 0, 1), -jnp.swapaxes(direct[..., 0], 0, 1)], -1
    )  # [vn, T, 2]
    normal = normal * w[..., None]
    b = jnp.sum(normal * coords[None], -1)  # [vn, T]
    ATA = jnp.einsum("vti,vtj->vij", normal, normal)  # [vn, 2, 2]
    ATb = jnp.sum(normal * b[..., None], 1)  # [vn, 2]
    det = ATA[:, 0, 0] * ATA[:, 1, 1] - ATA[:, 0, 1] * ATA[:, 1, 0]
    ok = jnp.abs(det) > 1e-9
    safe_det = jnp.where(ok, det, 1.0)
    inv = (
        jnp.stack(
            [
                jnp.stack([ATA[:, 1, 1], -ATA[:, 0, 1]], -1),
                jnp.stack([-ATA[:, 1, 0], ATA[:, 0, 0]], -1),
            ],
            -2,
        )
        / safe_det[:, None, None]
    )
    return jnp.einsum("vij,vj->vi", inv, ATb), ok


def _refit(win_pts, direct, coords, valid, inlier_thresh):
    """Winner refit on its inliers (ref ransac_voting_gpu.py:177-198).
    win_pts [vn, 2] -> ([vn, 2], [vn])."""
    inl = _inlier_mask(win_pts[None], direct, coords, valid, inlier_thresh)[0]
    w = inl.astype(jnp.float32)  # [vn, T]
    refined, ok = refit_ls(w, direct, coords)
    refined = jnp.where(ok[:, None], refined, win_pts)
    ratio = jnp.sum(w, -1) / jnp.maximum(jnp.sum(valid), 1)
    return refined, ratio


@partial(
    jax.jit,
    static_argnames=(
        "num_hypotheses",
        "num_rounds",
        "max_pixels",
        "min_pixels",
        "hyp_chunk",
        "approx_fg",
        "strided_fg",
    ),
)
def ransac_vote(
    mask: jax.Array,
    vertex: jax.Array,
    key: jax.Array,
    num_hypotheses: int = 128,
    num_rounds: int = 1,
    inlier_thresh: float = 0.99,
    max_pixels: int = 128,
    min_pixels: int = 5,
    hyp_chunk: int = 0,
    confidence: float = 0.99,
    approx_fg: bool = False,
    fg_weights: jax.Array | None = None,
    strided_fg: int = 0,
) -> VoteResult:
    """Single-image RANSAC voting decode. Use jax.vmap for batches.

    mask [H, W], vertex [H, W, vn, 2] -> VoteResult with kpt_2d [vn, 2].

    Behavioral counterpart of ransac_voting_layer_v3
    (ref ransac_voting_gpu.py:112-199): per round generate `num_hypotheses`
    2-ray intersections per keypoint, count angular inliers over the sampled
    pixels, keep the per-keypoint winner across rounds, then refit on the
    winner's inliers. Rounds run inside a `lax.while_loop` bounded by
    `num_rounds`, with the reference's adaptive stop (ref :150-174): after
    N cumulative hypotheses a keypoint with winner inlier ratio r is
    confident once `1-(1-r²)^N > confidence`; the loop exits when every
    keypoint is confident. Images with < min_pixels foreground return zeros
    (ref :128-132).
    """
    vn = vertex.shape[2]
    k_sel, k_hyp = jax.random.split(key)
    coords, flat_idx, valid = select_foreground(
        mask, k_sel, max_pixels, approx_fg, weights=fg_weights,
        stride_block=strided_fg,
    )
    tv = jnp.sum(valid)
    enough = tv >= min_pixels

    # gather first, then upcast: the full-res field may be stored bf16
    # (PVNet cast_output=False); only the T selected rows need fp32.
    direct = vertex.reshape(-1, vn, 2)[flat_idx].astype(jnp.float32)  # [T, vn, 2]
    direct = direct * valid[:, None, None]

    def one_round(key_r):
        # sample among the first tv entries (valid pixels are front-packed)
        hyp = generate_hypotheses_rolled(
            direct, coords, tv, key_r, num_hypotheses
        )
        counts = _count_inliers(
            hyp, direct, coords, valid, inlier_thresh, hyp_chunk
        )
        win_idx = jnp.argmax(counts, 0)  # [vn]
        win_counts = jnp.take_along_axis(counts, win_idx[None], 0)[0]
        win_pts = hyp[win_idx, jnp.arange(vn)]
        return win_pts, win_counts.astype(jnp.float32) / jnp.maximum(tv, 1)

    def cond_fn(carry):
        i, _, ratios = carry
        # confidence that the true keypoint was hit at least once in the
        # i·num_hypotheses samples so far (ref ransac_voting_gpu.py:168-171);
        # at i=0 this is 0 → the loop always runs at least one round.
        conf = 1.0 - (1.0 - jnp.square(ratios)) ** (i * num_hypotheses)
        return (i < num_rounds) & (jnp.min(conf) < confidence)

    def body_fn(carry):
        i, pts, ratios = carry
        new_pts, new_ratios = one_round(jax.random.fold_in(k_hyp, i))
        better = new_ratios > ratios  # per-keypoint winner carry-over
        return (
            i + 1,
            jnp.where(better[:, None], new_pts, pts),
            jnp.maximum(new_ratios, ratios),
        )

    _, win_pts, _ = jax.lax.while_loop(
        cond_fn,
        body_fn,
        (jnp.int32(0), jnp.zeros((vn, 2), jnp.float32), jnp.zeros((vn,), jnp.float32)),
    )

    refined, ratio = _refit(win_pts, direct, coords, valid, inlier_thresh)
    refined = jnp.where(enough, refined, 0.0)
    ratio = jnp.where(enough, ratio, 0.0)
    return VoteResult(kpt_2d=refined, inlier_ratio=ratio, valid=enough, mean=refined)


def _cov_around_mean(direct, coords, valid, tv, enough, mean, key,
                     num_hypotheses, inlier_thresh, max_pixels, hyp_chunk,
                     cov_pixels=0):
    """Weighted voting covariance around `mean` over an already-selected
    pixel set (the tail of ref ransac_voting_gpu.py:202-274): generate a
    fresh hypothesis population, weight by inlier ratio, keep ratios within
    0.1 of the per-keypoint max, return [vn, 2, 2].

    `cov_pixels > 0` counts inliers over only the first `cov_pixels` of the
    selected set. The counts here are used *only* as hypothesis weights
    (ratios), so a subsampled count is an unbiased ratio estimate with
    relative noise ~sqrt((1-r)/(r·cov_pixels)) — ~2% at r=0.5, n=2048 —
    far below the 0.1 ratio-window the weighting applies. Because uniform
    selection front-packs pixels in iid-priority order, the prefix IS a
    uniform subsample; with weighted_fg it is the most-confident prefix
    (documented bias, same as the rolled-pair interaction). This is the
    dominant un_pnp decode stage (hn·T drops 4× at cov_pixels=2048)."""
    if cov_pixels and cov_pixels < coords.shape[0]:
        direct = direct[:cov_pixels]
        coords = coords[:cov_pixels]
        valid = valid[:cov_pixels]
        tv = jnp.sum(valid)
    hyp = generate_hypotheses_rolled(
        direct, coords, tv, key, num_hypotheses
    )  # [hn, vn, 2]
    counts = _count_inliers(hyp, direct, coords, valid, inlier_thresh, hyp_chunk)
    ratio = counts.astype(jnp.float32) / jnp.maximum(tv, 1)  # [hn, vn]
    return _weighted_cov(hyp, ratio, mean, enough)


def _weighted_cov(hyp, ratio, mean, enough):
    """Inlier-ratio-weighted scatter of a hypothesis population around
    `mean`, keeping ratios within 0.1 of the per-keypoint max (the tail of
    ref ransac_voting_gpu.py:240-266). hyp [hn, vn, 2], ratio [hn, vn] ->
    cov [vn, 2, 2]."""
    ratio_v = ratio.T  # [vn, hn]
    hyp_v = jnp.swapaxes(hyp, 0, 1)  # [vn, hn, 2]
    thresh = jnp.max(ratio_v, -1, keepdims=True) - 0.1
    w = jnp.where(ratio_v < thresh, 0.0, ratio_v)  # [vn, hn]
    diff = hyp_v - mean[:, None, :]  # [vn, hn, 2]
    cov = jnp.einsum("vhi,vhj->vij", diff * w[..., None], diff)
    cov = cov / (jnp.sum(w, -1)[:, None, None] + 1e-3)
    return jnp.where(enough, cov, jnp.eye(2)[None] * 0.0)


@partial(
    jax.jit,
    static_argnames=(
        "num_hypotheses",
        "num_rounds",
        "max_pixels",
        "min_pixels",
        "hyp_chunk",
        "cov_hypotheses",
        "approx_fg",
        "cov_pixels",
        "cov_reuse",
        "strided_fg",
    ),
)
def ransac_vote_with_cov(
    mask: jax.Array,
    vertex: jax.Array,
    key: jax.Array,
    num_hypotheses: int = 512,
    num_rounds: int = 1,
    inlier_thresh: float = 0.99,
    max_pixels: int = 8192,
    min_pixels: int = 5,
    hyp_chunk: int = 0,
    confidence: float = 0.99,
    cov_hypotheses: int = 4096,
    approx_fg: bool = False,
    fg_weights: jax.Array | None = None,
    cov_pixels: int = 0,
    cov_reuse: bool = False,
    strided_fg: int = 0,
) -> tuple[VoteResult, jax.Array]:
    """Fused uncertainty decode: RANSAC vote + covariance in ONE program.

    Counterpart of the reference's un_pnp sequence (ransac_voting_layer_v3
    with 512 hyps, then estimate_voting_distribution_with_mean, ref
    resnet18.py:71-73) — but the foreground selection (top-k over H·W) and
    the [T, vn, 2] gather run ONCE and feed both stages, instead of the two
    standalone entry points each re-selecting. Returns (VoteResult,
    cov [vn, 2, 2]).

    `cov_reuse=True` skips the fresh covariance population entirely and
    pools the vote rounds' own hypotheses + inlier ratios (which the
    reference discards, ref ransac_voting_gpu.py:202-210 regenerates) into
    the weighted-scatter estimate. The pooled pairs are drawn from the same
    uniform pair distribution the fresh stage would draw, so the estimator
    is unchanged; only its sample count differs — rounds actually run ×
    num_hypotheses instead of cov_hypotheses. On the serving shapes this
    removes the two dominant decode stages (hypothesis generation ~32 ms +
    inlier counting 18–70 ms at batch 64). Accuracy-validated in the r4
    ablation (un_pnp_reuse row). `cov_hypotheses`/`cov_pixels` are ignored
    when set.
    """
    vn = vertex.shape[2]
    if fg_weights is not None:
        # Under weighted_fg the selection is front-packed in confidence
        # order, so a cov_pixels prefix would be the most-confident pixels
        # — a biased (agreement-heavy) covariance sample. Count over the
        # full selection instead (ADVICE r3 item 1).
        cov_pixels = 0
    k_sel, k_hyp, k_cov = jax.random.split(key, 3)
    coords, flat_idx, valid = select_foreground(
        mask, k_sel, max_pixels, approx_fg, weights=fg_weights,
        stride_block=strided_fg,
    )
    tv = jnp.sum(valid)
    enough = tv >= min_pixels

    direct = vertex.reshape(-1, vn, 2)[flat_idx].astype(jnp.float32)
    direct = direct * valid[:, None, None]

    def one_round(key_r):
        hyp = generate_hypotheses_rolled(
            direct, coords, tv, key_r, num_hypotheses
        )
        counts = _count_inliers(
            hyp, direct, coords, valid, inlier_thresh, hyp_chunk
        )
        hyp_ratio = counts.astype(jnp.float32) / jnp.maximum(tv, 1)
        win_idx = jnp.argmax(counts, 0)
        win_ratio = jnp.take_along_axis(hyp_ratio, win_idx[None], 0)[0]
        win_pts = hyp[win_idx, jnp.arange(vn)]
        return win_pts, win_ratio, hyp, hyp_ratio

    def cond_fn(carry):
        i, _, ratios = carry[:3]
        conf = 1.0 - (1.0 - jnp.square(ratios)) ** (i * num_hypotheses)
        return (i < num_rounds) & (jnp.min(conf) < confidence)

    def body_fn(carry):
        i, pts, ratios = carry[:3]
        new_pts, new_ratios, hyp, hyp_ratio = one_round(
            jax.random.fold_in(k_hyp, i)
        )
        better = new_ratios > ratios
        out = (
            i + 1,
            jnp.where(better[:, None], new_pts, pts),
            jnp.maximum(new_ratios, ratios),
        )
        if cov_reuse:
            # pool this round's population; unwritten rounds stay at
            # ratio 0 and fall outside the 0.1 weight window
            buf_h = lax.dynamic_update_slice(
                carry[3], hyp, (i * num_hypotheses, 0, 0))
            buf_r = lax.dynamic_update_slice(
                carry[4], hyp_ratio, (i * num_hypotheses, 0))
            out = out + (buf_h, buf_r)
        return out

    init = (
        jnp.int32(0),
        jnp.zeros((vn, 2), jnp.float32),
        jnp.zeros((vn,), jnp.float32),
    )
    if cov_reuse:
        init = init + (
            jnp.zeros((num_rounds * num_hypotheses, vn, 2), jnp.float32),
            jnp.zeros((num_rounds * num_hypotheses, vn), jnp.float32),
        )
    carry = jax.lax.while_loop(cond_fn, body_fn, init)
    win_pts = carry[1]

    refined, ratio = _refit(win_pts, direct, coords, valid, inlier_thresh)
    refined = jnp.where(enough, refined, 0.0)
    ratio = jnp.where(enough, ratio, 0.0)
    if cov_reuse:
        cov = _weighted_cov(carry[3], carry[4], refined, enough)
    else:
        cov = _cov_around_mean(
            direct, coords, valid, tv, enough, refined, k_cov,
            cov_hypotheses, inlier_thresh, max_pixels, hyp_chunk,
            cov_pixels=cov_pixels,
        )
    res = VoteResult(kpt_2d=refined, inlier_ratio=ratio, valid=enough,
                     mean=refined)
    return res, cov


@partial(
    jax.jit,
    static_argnames=("num_hypotheses", "max_pixels", "min_pixels", "hyp_chunk",
                     "approx_fg"),
)
def estimate_voting_distribution(
    mask: jax.Array,
    vertex: jax.Array,
    mean: jax.Array,
    key: jax.Array,
    num_hypotheses: int = 4096,
    inlier_thresh: float = 0.99,
    max_pixels: int = 8192,
    min_pixels: int = 5,
    hyp_chunk: int = 256,
    approx_fg: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Per-keypoint voting covariance around a given mean.

    Counterpart of estimate_voting_distribution_with_mean
    (ref ransac_voting_gpu.py:202-274): generate a large hypothesis
    population, weight each by its inlier ratio, keep ratios within 0.1 of
    the per-keypoint max, and compute the weighted covariance around `mean`.

    mask [H, W], vertex [H, W, vn, 2], mean [vn, 2] -> (mean, cov [vn, 2, 2]).
    """
    vn = vertex.shape[2]
    k_sel, k_hyp = jax.random.split(key)
    coords, flat_idx, valid = select_foreground(mask, k_sel, max_pixels, approx_fg)
    tv = jnp.sum(valid)
    enough = tv >= min_pixels

    direct = vertex.reshape(-1, vn, 2)[flat_idx].astype(jnp.float32)
    direct = direct * valid[:, None, None]

    cov = _cov_around_mean(
        direct, coords, valid, tv, enough, mean, k_hyp,
        num_hypotheses, inlier_thresh, max_pixels, hyp_chunk,
    )
    return mean, cov
