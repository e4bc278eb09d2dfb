"""Micro-profile of the un_pnp voting decode sub-stages on the chip.

Times, per batch of B images at the un_pnp shapes (T=8192 px, 512 vote +
4096 cov hypotheses, vn=9):
  * select_foreground        (randomized top-k over H*W)
  * count_inliers 512x8192   (Pallas)
  * count_inliers 4096x8192  (Pallas)
  * full ransac_vote_with_cov
so kernel tuning targets the real hotspot rather than the aggregate.

  python tools/profile_voting_stages.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from clean_pvnet_tpu.ops.voting import (
    generate_hypotheses_rolled,
    generate_hypotheses,
    ransac_vote_with_cov,
    select_foreground,
)
from clean_pvnet_tpu.ops.voting_pallas import count_inliers_pallas
from clean_pvnet_tpu.utils.cache import enable_compilation_cache


def timeit(fn, *args, iters=10, warmup=2):
    """Dependency-chained slope timing (see bench.py): each iteration's
    first array argument is perturbed by the previous output so the chain
    executes serially on device; (t_long - t_short) cancels dispatch and
    transfer fixed costs — plain block_until_ready loops under-measure on
    the RPC-tunneled TPU."""

    def first_leaf(tree):
        return jax.tree_util.tree_leaves(tree)[0]

    def chain(n):
        x0 = args[0]
        out = None
        for _ in range(n):
            out = fn(x0, *args[1:])
            eps = (jnp.ravel(first_leaf(out))[0] * 0).astype(x0.dtype)
            x0 = x0 + eps
        return out

    np.asarray(first_leaf(chain(max(warmup, 1))))
    n1 = max(1, iters // 5)
    t0 = time.perf_counter()
    np.asarray(first_leaf(chain(n1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(first_leaf(chain(iters)))
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / (iters - n1) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--max_pixels", type=int, default=8192)
    ap.add_argument("--vn", type=int, default=9)
    ap.add_argument("--block_h", type=int, default=512)
    ap.add_argument("--block_t", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    enable_compilation_cache()

    b, (h, w), t, vn = args.batch, args.hw, args.max_pixels, args.vn
    rng = np.random.RandomState(0)
    mask = jnp.asarray(rng.rand(b, h, w) > 0.9, jnp.float32)
    vertex = jnp.asarray(rng.randn(b, h, w, vn, 2).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), b)

    out = {"batch": b, "T": t, "vn": vn,
           "block_h": args.block_h, "block_t": args.block_t}

    sel = jax.jit(jax.vmap(partial(select_foreground, max_pixels=t)))
    out["select_fg_ms"] = round(timeit(sel, mask, keys, iters=args.iters), 2)

    coords, flat_idx, valid = sel(mask, keys)
    direct = jnp.take_along_axis(
        vertex.reshape(b, -1, vn, 2), flat_idx[..., None, None], 1
    ).astype(jnp.float32)

    for hn in (512, 4096):
        hyp = jnp.asarray(rng.randn(b, hn, vn, 2).astype(np.float32)) * 50.0
        f = jax.jit(jax.vmap(partial(
            count_inliers_pallas, inlier_thresh=0.99,
            block_h=min(args.block_h, hn), block_t=args.block_t)))
        out[f"pallas_{hn}x{t}_ms"] = round(
            timeit(f, direct, coords, valid, hyp, iters=args.iters), 2)
        f2 = jax.jit(jax.vmap(partial(
            count_inliers_pallas, inlier_thresh=0.99, mxu=False,
            block_h=min(args.block_h, hn), block_t=args.block_t)))
        out[f"pallas_vpu_{hn}x{t}_ms"] = round(
            timeit(f2, direct, coords, valid, hyp, iters=args.iters), 2)

    gen = jax.jit(jax.vmap(generate_hypotheses))
    idx_pairs = jnp.asarray(
        rng.randint(0, t, size=(b, 4096, vn, 2)).astype(np.int32))
    out["gen_hyp_4096_ms"] = round(
        timeit(gen, direct, coords, idx_pairs, iters=args.iters), 2)

    tvs = jnp.sum(valid, -1).astype(jnp.int32)
    genr = jax.jit(jax.vmap(partial(generate_hypotheses_rolled,
                                    num_hypotheses=4096)))
    out["gen_hyp_rolled_4096_ms"] = round(
        timeit(genr, direct, coords, tvs, keys, iters=args.iters), 2)

    full = jax.jit(jax.vmap(partial(ransac_vote_with_cov)))
    out["full_cov_decode_ms"] = round(
        timeit(full, mask, vertex, keys, iters=max(2, args.iters // 2)), 2)

    full_sub = jax.jit(jax.vmap(partial(ransac_vote_with_cov,
                                        cov_pixels=2048)))
    out["full_cov_decode_covpix2048_ms"] = round(
        timeit(full_sub, mask, vertex, keys, iters=max(2, args.iters // 2)), 2)

    # r4 serving fast path: pooled vote-round covariance (no fresh
    # population) + approx_max_k foreground selection
    full_reuse = jax.jit(jax.vmap(partial(
        ransac_vote_with_cov, cov_reuse=True, num_rounds=20)))
    out["full_cov_decode_reuse_ms"] = round(
        timeit(full_reuse, mask, vertex, keys, iters=max(2, args.iters // 2)),
        2)
    full_srv = jax.jit(jax.vmap(partial(
        ransac_vote_with_cov, cov_reuse=True, num_rounds=20, approx_fg=True)))
    out["full_cov_decode_serving_r4_ms"] = round(
        timeit(full_srv, mask, vertex, keys, iters=max(2, args.iters // 2)),
        2)

    # ---- serving-path remainder (un_pnp roofline, VERDICT r4 item 5) ----
    # after cov_reuse the program is: select_fg + R vote rounds (rolled
    # gen 512 + count 512×T) + refit + pooled-cov einsum + weighted LM.
    # Profile each piece at the exact serving shapes so the remaining ms
    # can be checked against hardware bounds stage by stage.
    from clean_pvnet_tpu.geometry.pnp import solve_pnp_uncertainty
    from clean_pvnet_tpu.ops.voting import (
        _count_inliers,
        _refit,
        _weighted_cov,
    )

    sel_a = jax.jit(jax.vmap(partial(select_foreground, max_pixels=t,
                                     approx=True)))
    out["select_fg_approx_ms"] = round(
        timeit(sel_a, mask, keys, iters=args.iters), 2)

    hyp512 = jnp.asarray(rng.randn(b, 512, vn, 2).astype(np.float32)) * 50.0
    cnt = jax.jit(jax.vmap(lambda d, c, v, hh: _count_inliers(
        hh, d, c, v, 0.99, 0)))
    out["count_512_ms"] = round(
        timeit(cnt, direct, coords, valid, hyp512, iters=args.iters), 2)

    tvs_b = jnp.sum(valid, -1).astype(jnp.int32)
    gen512 = jax.jit(jax.vmap(partial(generate_hypotheses_rolled,
                                      num_hypotheses=512)))
    out["gen_hyp_rolled_512_ms"] = round(
        timeit(gen512, direct, coords, tvs_b, keys, iters=args.iters), 2)

    win = jnp.asarray(rng.rand(b, vn, 2).astype(np.float32)) * 100.0
    reft = jax.jit(jax.vmap(lambda d, c, v, wp: _refit(wp, d, c, v, 0.99)))
    out["refit_ms"] = round(
        timeit(reft, direct, coords, valid, win, iters=args.iters), 2)

    pooled_h = jnp.asarray(
        rng.randn(b, 20 * 512, vn, 2).astype(np.float32)) * 50.0
    pooled_r = jnp.asarray(rng.rand(b, 20 * 512, vn).astype(np.float32))
    wcov = jax.jit(jax.vmap(lambda hh, rr, mm: _weighted_cov(
        hh, rr, mm, jnp.bool_(True))))
    out["pooled_cov_10240_ms"] = round(
        timeit(wcov, pooled_h, pooled_r, win, iters=args.iters), 2)

    pts3d = jnp.asarray(rng.randn(vn, 3).astype(np.float32) * 0.05)
    Kmat = jnp.asarray(np.array([[572.4, 0, 320], [0, 573.6, 240],
                                 [0, 0, 1]], np.float32))
    covs = jnp.broadcast_to(jnp.eye(2) * 4.0, (b, vn, 2, 2))
    pnp = jax.jit(jax.vmap(lambda p2, cv: solve_pnp_uncertainty(
        pts3d, p2, cv, Kmat)))
    out["lm_pnp_30it_ms"] = round(
        timeit(pnp, win * 4.0, covs, iters=args.iters), 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
