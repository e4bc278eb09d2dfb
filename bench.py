"""Benchmark: end-to-end pose-estimation frames/s/chip at 480×640.

Measures the full inference path — PVNet forward (bf16) + RANSAC voting
decode + PnP — as ONE jitted on-device program, the path the reference runs
at ~25 fps on a GTX 1080 Ti (PVNet paper abstract; BASELINE.md). Prints one
JSON line; vs_baseline is the ratio to that 25 fps reference number.

Run on TPU: python bench.py [--batch 16] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--trials", type=int, default=3,
                        help="repeat the timed measurement N times and "
                             "report the median — one-shot captures are "
                             "hostage to host contention (the r4 driver "
                             "capture read 9%% low; VERDICT r4 weak 7)")
    parser.add_argument("--un_pnp", action="store_true")
    parser.add_argument("--cov_reuse", action="store_true",
                        help="un_pnp covariance from the pooled vote-round "
                             "hypotheses instead of a fresh population "
                             "(voting.cov_reuse; accuracy-validated in the "
                             "r4 ablation un_pnp_reuse row)")
    parser.add_argument("--un_hyp", type=int, default=None,
                        help="vote-stage hypothesis count override (the "
                             "cov_reuse serving config uses 1024 to "
                             "recover cmd5; ablation un_pnp_reuse_1024)")
    parser.add_argument("--strided_fg", type=int, default=0,
                        help="block-stratified foreground selection: sort "
                             "per-N-block maxima instead of all H*W "
                             "priorities (the selection stage is sort-"
                             "bound; see ops/voting.select_foreground)")
    parser.add_argument("--approx_fg", action="store_true",
                        help="approx_max_k foreground selection (uniform "
                             "subset; accuracy-neutral per ablation_r03 "
                             "fg_approx rows)")
    parser.add_argument("--chunk", type=int, default=None,
                        help="sub-batch size streamed via lax.map inside the "
                             "jitted pipeline; lifts the batch-128 HBM "
                             "ceiling on the covariance decode")
    parser.add_argument("--cascade", action="store_true",
                        help="benchmark the detector→per-crop-PVNet cascade "
                             "(the T-LESS two-stage serving path)")
    parser.add_argument("--float32_input", action="store_true",
                        help="ship float32 frames instead of uint8")
    args = parser.parse_args()

    from clean_pvnet_tpu.config import Config
    from clean_pvnet_tpu.eval import InferencePipeline
    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # Serving config: the library default counts covariance inliers over the
    # full pixel selection (reference-equivalent numerics); the bench opts
    # into the 2048-pixel subsample — an unbiased ratio estimate with ~2%
    # noise, measured accuracy-neutral (ablation_r03.json) and 1.5× faster
    # on the un_pnp decode (see config.VotingConfig.cov_pixels).
    cfg = Config().with_overrides(
        {"voting.cov_pixels": 2048, "voting.cov_reuse": args.cov_reuse,
         "voting.approx_fg": args.approx_fg,
         "voting.strided_fg": args.strided_fg,
         # the accuracy-validated cov_reuse serving config runs 20 adaptive
         # vote rounds (ablation un_pnp_reuse/un_pnp_serving_r4); benchmark
         # the same program so fps and accuracy describe one config
         # (ADVICE r4 medium)
         **({"voting.num_rounds": 20} if args.cov_reuse else {}),
         **({"voting.un_hypotheses": args.un_hyp} if args.un_hyp else {})}
    )
    rng = np.random.RandomState(0)

    if args.cascade:
        # detector (DLA-34 CenterNet) → batched crops → per-crop PVNet,
        # ONE jitted program (models/cascade.py; ref ct_pvnet/res.py:74-84)
        import jax.numpy as jnp_  # noqa: F401 (parity with main path imports)
        from clean_pvnet_tpu.models.cascade import CascadePipeline
        from clean_pvnet_tpu.models.dla import DLASeg
        from clean_pvnet_tpu.models.pvnet import PVNet

        b, h, w = min(args.batch, 16), 480, 640
        # serving dtype parity: the registered builders (models/centernet.py
        # build_centernet, models/pvnet factory) run bf16 by default; the
        # bench previously constructed DLASeg with its fp32 module default
        # and measured an fp32 detector (r5 attribution:
        # tools/profile_cascade_stages.py)
        detector = DLASeg(heads={"ct_hm": 30, "wh": 2}, head_conv=256,
                          dtype=jnp.bfloat16)
        pvnet = PVNet(ver_dim=18, seg_dim=2, dtype=jnp.bfloat16)
        det_vars = detector.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        pv_vars = pvnet.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False)
        pipe = CascadePipeline(cfg, detector, pvnet,
                               max_dets=8, crop_size=128)
        img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        key0 = jax.random.PRNGKey(0)

        def chained_c(n):
            x = img
            out = None
            for i in range(n):
                out = pipe(det_vars, pv_vars, x, jax.random.fold_in(key0, i))
                x = img + (out["kpt_2d"][0, 0, 0, 0] * 0).astype(img.dtype)
            return out

        np.asarray(chained_c(args.warmup)["kpt_2d"])
        n1 = max(1, args.iters // 5)
        trials = []
        for _ in range(max(1, args.trials)):
            t0 = time.perf_counter()
            np.asarray(chained_c(n1)["kpt_2d"])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(chained_c(args.iters)["kpt_2d"])
            dt = max(time.perf_counter() - t0 - t1, 1e-9)
            trials.append((args.iters - n1) * b / dt)
        fps = float(np.median(trials))
        if b != args.batch:
            print(f"note: cascade batch clamped {args.batch} -> {b}",
                  file=sys.stderr)
        print(json.dumps({
            "metric": "frames/s/chip at 480x640 "
                      "(DLA-34 detector + 8-crop PVNet cascade)",
            "value": round(fps, 2),
            "unit": "frames/s",
            "batch": b,  # effective batch actually measured (ADVICE r2)
            "vs_baseline": round(fps / 10.0, 2),  # ref two-stage ~10 fps class
            "trials": [round(t, 2) for t in trials],
            "spread": round((max(trials) - min(trials)) / fps, 4),
        }))
        return

    model = make_network(cfg)

    b, h, w = args.batch, 480, 640
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    kpt_3d = rng.randn(9, 3).astype(np.float32) * 0.05
    K = np.array(
        [[572.4114, 0, 325.2611], [0, 573.57043, 242.04899], [0, 0, 1]],
        np.float32,
    )
    pipeline = InferencePipeline(
        cfg, model, kpt_3d, un_pnp=args.un_pnp,
        accept_uint8=not args.float32_input, chunk=args.chunk,
    )

    if args.float32_input:
        inp = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    else:
        # serving configuration: raw uint8 frames, normalize on device
        inp = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.uint8))
    Kb = jnp.asarray(np.tile(K, (b, 1, 1)))
    key = jax.random.PRNGKey(0)

    # Timing methodology: chain each iteration's input on the previous
    # iteration's output (a zero-valued perturbation) and fetch only the
    # final result. On an RPC-tunneled device, timing a loop of independent
    # dispatches + block_until_ready under-measures (async/lazy execution);
    # the data dependency forces every step to execute serially, and the
    # (long - short) slope cancels dispatch/transfer fixed costs.
    def chained(n):
        x = inp
        out = None
        for i in range(n):
            out = pipeline(variables, x, Kb, jax.random.fold_in(key, i))
            zero = (out["pose"][0, 0, 0] * 0).astype(inp.dtype)
            x = inp + zero
        return out

    np.asarray(chained(args.warmup)["pose"])  # compile + warm
    n1 = max(1, args.iters // 5)
    # median over interleaved trials: each trial re-measures the short run
    # too, so slow-host windows shift both legs and the slope stays honest
    trials = []
    for _ in range(max(1, args.trials)):
        t0 = time.perf_counter()
        np.asarray(chained(n1)["pose"])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chained(args.iters)["pose"])
        t2 = time.perf_counter() - t0
        trials.append((args.iters - n1) * b / max(t2 - t1, 1e-9))
    fps = float(np.median(trials))
    # MFU on the network's matmul/conv FLOPs (the voting/PnP decode adds
    # VPU work the MXU number doesn't see; this is a lower bound)
    mfu = None
    try:
        flops = pipeline.cost_flops()
        if flops:
            peak = 197e12 if "v5" in str(jax.devices()[0]).lower() else None
            if peak:
                mfu = round(flops / b * fps / peak, 4)
    except Exception:
        pass
    print(
        json.dumps(
            {
                "metric": "frames/s/chip at 480x640 (network+voting+PnP"
                          + (", un_pnp covariance decode" if args.un_pnp else "")
                          + ")",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 25.0, 2),
                "trials": [round(t, 2) for t in trials],
                "spread": round((max(trials) - min(trials)) / fps, 4),
                **({"mfu_bf16": mfu} if mfu is not None else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
