"""Block-size sweep for the Pallas inlier-count kernel on the real chip.

Measures count_inliers_pallas at the two uncertainty-PnP shapes
(ref ransac_voting_gpu.py:112 un path 512 hyps, :202-274 covariance path
4096 hyps over the large pixel budget) across (block_h, block_t), compares
with the XLA scan path, and prints an ops/s + effective-bandwidth estimate
so "fast" is judged against the VPU roofline, not just relative numbers.

  python tools/tune_voting_pallas.py [--out data/record/pallas_tune.json]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, d, c, v, h, iters=10):
    """Dependency-chained slope timing: feed each call's output back into the
    next call's hypothesis input (zero perturbation) and fetch only the last
    result; report (t_long - t_short)/(n_long - n_short). On the RPC-tunneled
    TPU, independent dispatches + block_until_ready under-measure badly."""

    def chain(n):
        hh = h
        out = None
        for _ in range(n):
            out = fn(d, c, v, hh)
            hh = h + 1e-12 * out.astype(jnp.float32)[..., None]
        return out

    _ = np.asarray(chain(1))  # compile + warm
    n1 = max(1, iters // 5)
    t0 = time.perf_counter()
    _ = np.asarray(chain(n1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(chain(iters))
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / (iters - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/record/pallas_tune.json")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from clean_pvnet_tpu.ops.voting import _count_inliers_chunked
    from clean_pvnet_tpu.ops.voting_pallas import count_inliers_pallas
    from clean_pvnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    shapes = [
        ("un_pnp 512x8192", 8192, 9, 512),
        ("cov 4096x8192", 8192, 9, 4096),
        ("cov 4096x30720", 30720, 9, 4096),
    ]
    results = []
    for name, tn, vn, hn in shapes:
        direct = rng.randn(tn, vn, 2).astype(np.float32)
        direct /= np.linalg.norm(direct, axis=-1, keepdims=True) + 1e-9
        coords = (rng.rand(tn, 2) * 480).astype(np.float32)
        valid = (rng.rand(tn) > 0.1)
        hyp = (rng.rand(hn, vn, 2) * 480).astype(np.float32)
        a = (jnp.asarray(direct), jnp.asarray(coords), jnp.asarray(valid),
             jnp.asarray(hyp))

        # element-ops model: ~11 VPU ops per (h, v, t) cell
        cells = hn * vn * tn
        scan = jax.jit(
            lambda d, c, v, h: _count_inliers_chunked(h, d, c, v, 0.99, 256)
        )
        t_scan = timed(scan, *a, iters=args.iters)
        row = {"shape": name, "hn": hn, "vn": vn, "tn": tn,
               "xla_scan_ms": t_scan * 1e3,
               "xla_scan_cells_per_s": cells / t_scan}
        print(f"{name}: XLA scan {t_scan*1e3:.2f} ms "
              f"({cells/t_scan/1e9:.1f} Gcell/s)", flush=True)

        best = None
        for bh, bt in itertools.product((256, 512, 1024),
                                        (512, 1024, 2048, 4096)):
            if bh > hn or bt > tn + 512:
                continue
            try:
                fn = jax.jit(
                    lambda d, c, v, h, bh=bh, bt=bt: count_inliers_pallas(
                        d, c, v, h, 0.99, block_h=bh, block_t=bt
                    )
                )
                t = timed(fn, *a, iters=args.iters)
            except Exception as e:  # noqa: BLE001 — record and move on
                print(f"  bh={bh} bt={bt}: FAIL {type(e).__name__}", flush=True)
                continue
            print(f"  bh={bh} bt={bt}: {t*1e3:.2f} ms "
                  f"({cells/t/1e9:.1f} Gcell/s)", flush=True)
            if best is None or t < best[2]:
                best = (bh, bt, t)
        if best:
            bh, bt, t = best
            row.update(best_block_h=bh, best_block_t=bt,
                       pallas_ms=t * 1e3, pallas_cells_per_s=cells / t,
                       speedup_vs_scan=t_scan / t)
            print(f"  => best bh={bh} bt={bt}: {t*1e3:.2f} ms, "
                  f"{t_scan/t:.2f}x vs scan", flush=True)
        results.append(row)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": results}, f,
                  indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
