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


def _time(fn, args, iters, warmup):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
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

    @jax.jit
    def net_only(v, x):
        return model.apply(v, x, train=False)

    @jax.jit
    def net_vote(v, x, k):
        out = model.apply(v, x, train=False)
        return decode_keypoints(out["seg"], out["vertex"], k, cfg)

    @jax.jit
    def full(v, x, Kb, k):
        out = model.apply(v, x, train=False)
        dec = decode_keypoints(out["seg"], out["vertex"], k, cfg)
        pose = jax.vmap(
            lambda k2, kk: solve_pnp(kpt_3d, k2, kk, iters=lm_iters)
        )(dec["kpt_2d"], Kb)
        return pose

    t_net = _time(net_only, (variables, inp), args.iters, args.warmup)
    t_vote = _time(net_vote, (variables, inp, key), args.iters, args.warmup)
    t_full = _time(full, (variables, inp, Kb, key), args.iters, args.warmup)

    res = {
        "batch": b,
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
