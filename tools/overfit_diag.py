"""Controlled overfit diagnostic for the vertex-field accuracy ceiling.

VERDICT r2 item 1(a): train on a handful of images with NO augmentation and
report the floor of the voted-keypoint pixel error. If the floor is sub-~2px
the train->field->decode stack is healthy and the benchmark gap is a
data/schedule matter; if it plateaus higher, the cause is in the
loss/field/decode math or numerics (ablate with --bf16).

Decouples every stage:
  * vote_loss / seg_err            -- raw training signal
  * fg angular error (median, deg) -- field quality vs the GT field
  * fg perpendicular bias (px-free)-- systematic field bias (noise averages
                                      out in the refit; bias does not)
  * kpt_px_err (gt-mask decode)    -- field -> keypoint, seg decoupled
  * kpt_px_err (pred-mask decode)  -- the real inference path

  python tools/overfit_diag.py [--n 16] [--steps 2000] [--bf16] [--aug]
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
from clean_pvnet_tpu.data import LinemodDataset
from clean_pvnet_tpu.data.synthetic import generate_synthetic_dataset
from clean_pvnet_tpu.geometry.vertex import compute_vertex_field
from clean_pvnet_tpu.models import make_network
from clean_pvnet_tpu.ops.voting import ransac_vote
from clean_pvnet_tpu.parallel import make_mesh
from clean_pvnet_tpu.train import Trainer
from clean_pvnet_tpu.utils.cache import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16, help="train images")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--bf16", action="store_true",
                    help="train in bf16 (the r2 default) instead of fp32")
    ap.add_argument("--aug", action="store_true",
                    help="keep the on-device augmentation on (r2 recipe); "
                         "default is the controlled no-augmentation run")
    ap.add_argument("--root", default="data/synth_r3")
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--out", default="data/record/overfit_diag.json")
    args = ap.parse_args()
    enable_compilation_cache()

    hw = tuple(args.hw)
    meta_path = os.path.join(args.root, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stored = json.load(f)
        synth = {
            **stored,
            "fps_3d": np.asarray(stored["fps_3d"]),
            "center_3d": np.asarray(stored["center_3d"]),
        }
        print("reusing dataset at", args.root)
    else:
        synth = generate_synthetic_dataset(
            args.root, cls="synth", n_train=max(args.n, 16), n_test=8,
            hw=hw, seed=0, texture_seed=11,
        )

    cfg = Config().with_overrides(
        {
            "cls_type": "synth",
            "data_root": args.root,
            "train.batch_size": args.batch,
            "train.image_buckets": (hw,),
            "train.lr": args.lr,
            # steps_per_epoch=1 below => milestones are in steps
            "train.milestones": tuple(int(args.steps * f) for f in (0.4, 0.7, 0.9)),
            "network.use_bfloat16": bool(args.bf16),
        }
    )
    model = make_network(cfg)
    mesh = make_mesh(num_devices=1)

    # ---- load args.n images ONCE, no augmentation ----------------------
    ds = LinemodDataset(cfg, synth["train_json"], split="test")  # split=test => no aug
    from clean_pvnet_tpu.data.augment import normalize_image

    inps, masks, kpts, raws = [], [], [], []
    for i in range(min(args.n, len(ds))):
        img, kpt_2d, mask, ann = ds.read(ds.img_ids[i])
        raws.append(np.asarray(img, np.uint8))
        inps.append(normalize_image(img))
        masks.append(mask.astype(np.int32))
        kpts.append(kpt_2d)
    raw_u8 = jnp.asarray(np.stack(raws))
    inp = jnp.asarray(np.stack(inps))
    mask = jnp.asarray(np.stack(masks))
    kpt = jnp.asarray(np.stack(kpts))
    n = inp.shape[0]
    print(f"{n} images loaded at {hw}, bf16={args.bf16}, aug={args.aug}")

    trainer = Trainer(cfg, model, steps_per_epoch=1, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, hw[0], hw[1], 3))

    gt_field = jax.vmap(compute_vertex_field)(mask, kpt)  # [N,H,W,18]

    rng = np.random.RandomState(0)

    @jax.jit
    def field_stats(params, batch_stats, inp_b, mask_b, gt_b):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, inp_b, train=False
        )
        seg, vtx = out["seg"], out["vertex"].astype(jnp.float32)
        fg = mask_b > 0
        n_fg = jnp.maximum(jnp.sum(fg), 1)
        seg_err = jnp.sum((jnp.argmax(seg, -1) != mask_b)) / (
            np.prod(mask_b.shape)
        )
        b, h, w, _ = vtx.shape
        p = vtx.reshape(b, h, w, 9, 2)
        g = gt_b.reshape(b, h, w, 9, 2)
        pn = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-6)
        cos = jnp.clip(jnp.sum(pn * g, -1), -1.0, 1.0)
        ang = jnp.degrees(jnp.arccos(cos))  # [b,h,w,9]
        ang_fg = jnp.where(fg[..., None], ang, jnp.nan)
        # perpendicular signed error: component of (pn - g) along perp(g)
        perp = jnp.stack([-g[..., 1], g[..., 0]], -1)
        signed = jnp.sum((pn - g) * perp, -1)
        bias = jnp.sum(jnp.where(fg[..., None], signed, 0.0), (0, 1, 2)) / n_fg
        return seg_err, ang_fg, bias

    decode = jax.jit(
        jax.vmap(
            lambda m, v, k: ransac_vote(
                m, v, k, num_hypotheses=512, max_pixels=8192, hyp_chunk=128
            )
        )
    )

    def evaluate(step):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            inp, train=False,
        )
        vtx = out["vertex"].astype(jnp.float32)
        b, h, w, _ = vtx.shape
        v5 = vtx.reshape(b, h, w, 9, 2)
        seg_err, ang_fg, bias = field_stats(
            state.params, state.batch_stats, inp, mask, gt_field
        )
        ang_np = np.asarray(ang_fg)
        pred_mask = jnp.argmax(out["seg"], -1)
        keys = jax.random.split(jax.random.PRNGKey(step), b)
        res_gtm = decode(mask, v5, keys)
        res_pm = decode(pred_mask, v5, keys)
        err_gtm = np.linalg.norm(
            np.asarray(res_gtm.kpt_2d) - np.asarray(kpt), axis=-1
        ).mean(-1)
        err_pm = np.linalg.norm(
            np.asarray(res_pm.kpt_2d) - np.asarray(kpt), axis=-1
        ).mean(-1)
        rec = {
            "step": step,
            "seg_err": float(seg_err),
            "ang_med_deg": float(np.nanmedian(ang_np)),
            "ang_mean_deg": float(np.nanmean(ang_np)),
            "bias_norm": float(np.linalg.norm(np.asarray(bias), axis=-1).mean()),
            "kpt_px_err_gtmask": float(np.median(err_gtm)),
            "kpt_px_err_predmask": float(np.median(err_pm)),
        }
        print(json.dumps(rec), flush=True)
        return rec

    t0 = time.time()
    curve = []
    for step in range(1, args.steps + 1):
        idx = rng.choice(n, args.batch, replace=args.batch > n)
        if args.aug:
            # r2-recipe path: device augmentation from raw frames
            batch = {"inp_u8": raw_u8[idx], "mask": mask[idx], "kpt_2d": kpt[idx]}
        else:
            batch = {"inp": inp[idx], "mask": mask[idx], "kpt_2d": kpt[idx]}
        state, stats = trainer._train_step(state, batch)
        if step % args.eval_every == 0 or step == args.steps:
            print(f"step {step}: loss {float(stats['loss']):.4f} "
                  f"vote {float(stats['vote_loss']):.4f} "
                  f"({(time.time()-t0)/step*1000:.0f} ms/step)")
            curve.append(evaluate(step))

    result = {
        "config": {
            "n": n, "steps": args.steps, "batch": args.batch, "lr": args.lr,
            "bf16": bool(args.bf16), "aug": bool(args.aug), "hw": list(hw),
            "decode": "512hyp/8192px", "dataset": args.root,
        },
        "final": curve[-1],
        "curve": curve,
        "minutes": (time.time() - t0) / 60,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
