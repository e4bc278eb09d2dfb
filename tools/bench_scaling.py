"""Scaling benchmark harness: frames/s and parallel efficiency vs #devices.

BASELINE.md asks for measured scaling at 1 chip / 1 host / N hosts. On real
pod slices this script runs unchanged (the mesh spans whatever
`jax.devices()` reports; multi-host via parallel/distributed). In this
environment (one physical chip) `--platform cpu --devices 1 2 4 8` measures
SPMD scaling of the identical program on a virtual mesh — validating that
throughput scales with the mesh before hardware is available.

  python tools/bench_scaling.py --platform cpu --devices 1 2 4 8 --hw 128 160
  python tools/bench_scaling.py --devices 1                 # the real chip
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--devices", type=int, nargs="+", default=[1])
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--per_device_batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--train", action="store_true",
                    help="benchmark the train step instead of inference")
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from clean_pvnet_tpu.config import Config
    from clean_pvnet_tpu.eval import InferencePipeline
    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.parallel import make_mesh, shard_batch
    from clean_pvnet_tpu.train import Trainer

    h, w = args.hw
    cfg = Config().with_overrides(
        {"network.use_bfloat16": args.platform != "cpu"}
    )
    model = make_network(cfg)
    rng = np.random.RandomState(0)
    results = []

    for n_dev in args.devices:
        mesh = make_mesh(num_devices=n_dev)
        b = args.per_device_batch * n_dev
        if args.train:
            trainer = Trainer(cfg, model, steps_per_epoch=1, mesh=mesh)
            state = trainer.init_state(jax.random.PRNGKey(0), (1, h, w, 3))
            batch = shard_batch(
                {
                    "inp": rng.rand(b, h, w, 3).astype(np.float32),
                    "mask": (rng.rand(b, h, w) > 0.7).astype(np.int32),
                    "kpt_2d": rng.rand(b, 9, 2).astype(np.float32) * 100,
                },
                mesh,
            )
            state, _ = trainer._train_step(state, batch)  # compile
            jax.block_until_ready(state.params)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, stats = trainer._train_step(state, batch)
            jax.block_until_ready(state.params)
            dt = time.perf_counter() - t0
        else:
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
            )
            kpt_3d = rng.randn(9, 3).astype(np.float32) * 0.05
            pipeline = InferencePipeline(cfg, model, kpt_3d)
            K = np.tile(np.eye(3, dtype=np.float32) * 100, (b, 1, 1))
            inp = shard_batch(
                {"inp": rng.rand(b, h, w, 3).astype(np.float32),
                 "K": K}, mesh
            )
            out = pipeline(variables, inp["inp"], inp["K"], jax.random.PRNGKey(0))
            jax.block_until_ready(out["pose"])
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = pipeline(variables, inp["inp"], inp["K"],
                               jax.random.PRNGKey(i))
            jax.block_until_ready(out["pose"])
            dt = time.perf_counter() - t0

        fps = args.iters * b / dt
        results.append({"devices": n_dev, "global_batch": b,
                        "frames_per_s": round(fps, 2)})
        base = results[0]
        eff = (fps / base["frames_per_s"]) / (n_dev / base["devices"])
        results[-1]["efficiency_vs_1dev"] = round(eff, 3)
        print(json.dumps(results[-1]))

    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
