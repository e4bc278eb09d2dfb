"""Inference cost breakdown: network vs voting decode vs PnP.

Times three jitted programs over the same batch — (a) network forward only,
(b) network + voting decode, (c) the full serving pipeline (network + voting
+ PnP) — so each stage's share of the frame budget is the difference. The
reference has no such attribution (its stages run in different runtimes:
torch / CUDA kernels / OpenCV+Ceres on host); here all three are slices of
one XLA program (eval/pipeline.py).

  python tools/profile_inference.py [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(run, inp, iters, warmup):
    """Dependency-chained slope timing (see bench.py): `run(x)` must return
    one array; each iteration's input is perturbed by the previous output so
    the chain executes serially, and (t_long - t_short) cancels dispatch and
    transfer fixed costs — plain block_until_ready loops under-measure on
    the RPC-tunneled TPU."""

    def chain(n):
        x = inp
        out = None
        for _ in range(n):
            out = run(x)
            x = inp + (jnp.ravel(out)[0] * 0).astype(inp.dtype)
        return out

    np.asarray(chain(max(warmup, 1)))
    n1 = max(1, iters // 5)
    t0 = time.perf_counter()
    np.asarray(chain(n1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chain(iters))
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / (iters - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--un_pnp", action="store_true",
                    help="profile the covariance decode + uncertainty PnP")
    args = ap.parse_args()

    from clean_pvnet_tpu.config import Config
    from clean_pvnet_tpu.geometry.pnp import solve_pnp
    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.models.pvnet import decode_keypoints
    from clean_pvnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config()
    model = make_network(cfg)
    if getattr(model, "cast_output", None) is True:
        model = model.clone(cast_output=False)
    rng = np.random.RandomState(0)
    b, (h, w) = args.batch, args.hw
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    kpt_3d = jnp.asarray(rng.randn(9, 3).astype(np.float32) * 0.05)
    K = np.array(
        [[572.4114, 0, 325.2611], [0, 573.57043, 242.04899], [0, 0, 1]],
        np.float32,
    )
    inp = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    Kb = jnp.asarray(np.tile(K, (b, 1, 1)))
    key = jax.random.PRNGKey(0)
    lm_iters = cfg.pnp.lm_iters

    un_pnp = args.un_pnp
    if un_pnp:
        from clean_pvnet_tpu.geometry.pnp import solve_pnp_uncertainty

    @jax.jit
    def net_only(x):
        return model.apply(variables, x, train=False)["seg"]

    @jax.jit
    def net_vote(x):
        out = model.apply(variables, x, train=False)
        dec = decode_keypoints(out["seg"], out["vertex"], key, cfg,
                               un_pnp=un_pnp)
        # touch every decode output so nothing is dead-code eliminated
        extra = dec["var"].sum() if un_pnp else dec["inlier_ratio"].sum()
        return dec["kpt_2d"] + extra * 0

    @jax.jit
    def full(x):
        out = model.apply(variables, x, train=False)
        dec = decode_keypoints(out["seg"], out["vertex"], key, cfg,
                               un_pnp=un_pnp)
        if un_pnp:
            pose = jax.vmap(
                lambda k2, var, kk: solve_pnp_uncertainty(
                    kpt_3d, k2, var, kk, iters=lm_iters
                )
            )(dec["kpt_2d"], dec["var"], Kb)
        else:
            pose = jax.vmap(
                lambda k2, kk: solve_pnp(kpt_3d, k2, kk, iters=lm_iters)
            )(dec["kpt_2d"], Kb)
        return pose

    t_net = _time(net_only, inp, args.iters, args.warmup)
    t_vote = _time(net_vote, inp, args.iters, args.warmup)
    t_full = _time(full, inp, args.iters, args.warmup)

    res = {
        "batch": b,
        "un_pnp": bool(un_pnp),
        "network_ms": round(t_net * 1e3, 2),
        "voting_ms": round((t_vote - t_net) * 1e3, 2),
        "pnp_ms": round((t_full - t_vote) * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "fps": round(b / t_full, 1),
        "net_fps": round(b / t_net, 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
