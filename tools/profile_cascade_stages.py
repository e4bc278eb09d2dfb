"""Stage attribution for the cascade serving path (VERDICT r4 item 4).

Times, at the bench shapes (batch 16, 480×640, 8 crops of 128²):
  * DLA-34 detector forward alone
  * PVNet forward over the batch of crops alone (B*K crops)
  * the full fused cascade (detector → decode → crop warp → PVNet → vote)
so the 21.6 fps cascade number decomposes into detector / crop-stage /
glue, and the DCN share is checkable against the packed-gather redesign.

  python tools/profile_cascade_stages.py [--batch 16]
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

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models.cascade import CascadePipeline
from clean_pvnet_tpu.models.dla import DLASeg
from clean_pvnet_tpu.models.pvnet import PVNet
from clean_pvnet_tpu.utils.cache import enable_compilation_cache


def timeit(fn, *args, iters=10, warmup=2):
    """Dependency-chained slope timing (see bench.py)."""

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
    return (t2 - t1) / (iters - n1) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    enable_compilation_cache()

    cfg = Config().with_overrides({"voting.cov_pixels": 2048})
    b, h, w = args.batch, 480, 640
    k, crop = 8, 128
    rng = np.random.RandomState(0)

    detector = DLASeg(heads={"ct_hm": 30, "wh": 2}, head_conv=256,
                      dtype=jnp.bfloat16)
    pvnet = PVNet(ver_dim=18, seg_dim=2, dtype=jnp.bfloat16)
    det_vars = detector.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                             train=False)
    pv_vars = pvnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                         train=False)

    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    crops = jnp.asarray(rng.rand(b * k, crop, crop, 3).astype(np.float32))
    out = {"batch": b, "max_dets": k, "crop": crop}

    det_fwd = jax.jit(lambda x: detector.apply(det_vars, x, train=False))
    out["detector_fwd_ms"] = round(timeit(det_fwd, img, iters=args.iters), 2)

    pv_fwd = jax.jit(lambda x: pvnet.apply(pv_vars, x, train=False))
    out["pvnet_crops_fwd_ms"] = round(timeit(pv_fwd, crops,
                                             iters=args.iters), 2)

    pipe = CascadePipeline(cfg, detector, pvnet, max_dets=k, crop_size=crop)
    key0 = jax.random.PRNGKey(0)
    out["full_cascade_ms"] = round(
        timeit(lambda x: pipe(det_vars, pv_vars, x, key0), img,
               iters=args.iters), 2)
    out["fps"] = round(b / out["full_cascade_ms"] * 1000.0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
