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


def timed_chained(fn, perturb, *args, iters=10, warmup=2):
    """Tunnel-safe timing: the RPC-tunneled chip executes lazily, so a loop
    of independent dispatches + block_until_ready under-measures (see
    bench.py methodology). `perturb(out, args) -> args` must create a data
    dependency of iteration i+1's inputs on iteration i's outputs; the
    (long - short) slope cancels fixed dispatch costs."""

    def chain(n):
        a = args
        out = None
        for _ in range(n):
            out = fn(*a)
            a = perturb(out, a)
        return out

    jax.block_until_ready(chain(warmup))
    n1 = max(1, iters // 5)
    t0 = time.perf_counter()
    jax.block_until_ready(chain(n1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(chain(iters))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (iters - n1) * 1000.0


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

    def perturb_kb(out, a):
        # fold a zero-valued data dependency into the key
        z = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
        k = a[0] + (z * 0).astype(a[0].dtype)
        return (k, *a[1:])

    t_aug = timed_chained(aug, perturb_kb, jax.random.PRNGKey(0), raw,
                          iters=args.iters)
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

    t_w = timed_chained(warp_only, perturb_kb, key0, raw, iters=args.iters)
    print(f"  warp (affine+gather):{t_w:7.1f} ms")
    imgf = raw["inp_u8"].astype(jnp.float32)
    blur = jax.jit(lambda k, x: gaussian_blur_device(k, x))

    def perturb_x(out, a):
        z = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0] * 0
        return (a[0], a[1] + z.astype(a[1].dtype))

    t_b = timed_chained(blur, perturb_x, key0, imgf, iters=args.iters)
    print(f"  gaussian blur:       {t_b:7.1f} ms")
    jit_j = jax.jit(lambda k, x: color_jitter_device(k, x))
    t_j = timed_chained(jit_j, perturb_x, key0, imgf, iters=args.iters)
    print(f"  color jitter:        {t_j:7.1f} ms")
    vert = jax.jit(
        lambda m, k: jax.vmap(compute_vertex_field)(m, k)
    )
    mask_i32 = raw["mask"].astype(jnp.int32)

    def perturb_v(out, a):
        z = (out.reshape(-1)[0] * 0).astype(a[1].dtype)
        return (a[0], a[1] + z)

    t_v = timed_chained(vert, perturb_v, mask_i32, raw["kpt_2d"],
                        iters=args.iters)
    print(f"  vertex targets:      {t_v:7.1f} ms")

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
