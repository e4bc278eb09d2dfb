"""Break down the training step's on-device cost.

Times, as separately jitted programs on the current default device:
  * the device augmentation alone (data/augment_device.py)
  * forward+backward alone (pre-augmented inputs)
  * the full train step (augment + fwd/bwd + optimizer)
plus an optional jax.profiler trace for op-level attribution.

  python tools/profile_train_step.py [--batch 8] [--hw 480 640] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace of one full step here")
    args = ap.parse_args()

    from clean_pvnet_tpu.config import Config
    from clean_pvnet_tpu.data.augment_device import augment_batch_device
    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.parallel import make_mesh, shard_batch
    from clean_pvnet_tpu.train import Trainer
    from clean_pvnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b, (h, w) = args.batch, args.hw
    cfg = Config().with_overrides(
        {
            "train.batch_size": b,
            "train.image_buckets": ((h, w),),
            "train.device_augment": True,
        }
    )
    model = make_network(cfg)
    mesh = make_mesh(num_devices=1)
    trainer = Trainer(cfg, model, steps_per_epoch=1, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, h, w, 3))

    rng = np.random.RandomState(0)
    masks = np.zeros((b, h, w), np.uint8)
    masks[:, h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = 1
    raw = {
        "inp_u8": jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.uint8)),
        "mask": jnp.asarray(masks),
        "kpt_2d": jnp.asarray((rng.rand(b, 9, 2) * 100 + 150).astype(np.float32)),
    }
    raw = shard_batch(raw, mesh)

    aug = jax.jit(
        lambda k, bb: augment_batch_device(
            k, bb["inp_u8"], bb["mask"], bb["kpt_2d"], cfg.train
        )
    )
    t_aug = timed(aug, jax.random.PRNGKey(0), raw, iters=args.iters)
    print(f"augment only:        {t_aug:8.1f} ms/step")

    # --- augmentation sub-stages (each as its own jitted program) --------
    from clean_pvnet_tpu.data.augment_device import (
        affine_sample_bilinear,
        affine_sample_nearest,
        color_jitter_device,
        gaussian_blur_device,
        sample_affine,
    )
    from clean_pvnet_tpu.geometry.vertex import compute_vertex_field

    key0 = jax.random.PRNGKey(0)

    @jax.jit
    def warp_only(k, bb):
        _, A_inv = jax.vmap(
            lambda kk, m: sample_affine(kk, m, (h, w), cfg.train)
        )(jax.random.split(k, b), bb["mask"])
        img = bb["inp_u8"].astype(jnp.float32)
        out = jax.vmap(
            lambda im, ai: affine_sample_bilinear(im, ai, (h, w))
        )(img, A_inv)
        m = jax.vmap(
            lambda mm, ai: affine_sample_nearest(
                mm.astype(jnp.int32), ai, (h, w))
        )(bb["mask"], A_inv)
        return out, m

    print(f"  warp (affine+gather):{timed(warp_only, key0, raw, iters=args.iters):7.1f} ms")
    imgf = raw["inp_u8"].astype(jnp.float32)
    blur = jax.jit(lambda k, x: gaussian_blur_device(k, x))
    print(f"  gaussian blur:       {timed(blur, key0, imgf, iters=args.iters):7.1f} ms")
    jit_j = jax.jit(lambda k, x: color_jitter_device(k, x))
    print(f"  color jitter:        {timed(jit_j, key0, imgf, iters=args.iters):7.1f} ms")
    vert = jax.jit(
        lambda m, k: jax.vmap(compute_vertex_field)(m, k)
    )
    mask_i32 = raw["mask"].astype(jnp.int32)
    print(f"  vertex targets:      {timed(vert, mask_i32, raw['kpt_2d'], iters=args.iters):7.1f} ms")

    inp, mgt, kpt = aug(jax.random.PRNGKey(0), raw)
    pre = shard_batch(
        {"inp": inp, "mask": mgt.astype(np.int32), "kpt_2d": kpt}, mesh
    )
    # the step donates its state; chain through a holder like real training
    def chained(batch):
        holder = {"s": trainer.init_state(jax.random.PRNGKey(0), (1, h, w, 3))}

        def run(bb):
            holder["s"], stats = trainer._train_step(holder["s"], bb)
            return stats["loss"]

        return run

    t_fb = timed(chained(pre), pre, iters=args.iters)
    print(f"fwd+bwd+opt (no aug): {t_fb:7.1f} ms/step")

    t_full = timed(chained(raw), raw, iters=args.iters)
    print(f"full step (aug+train):{t_full:7.1f} ms/step")
    print(f"=> imgs/s at batch {b}: {b / t_full * 1000.0:.1f}")

    if args.trace:
        step = chained(raw)
        step(raw)  # compiled
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(step(raw))
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
