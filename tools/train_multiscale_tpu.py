"""Multi-scale training campaign: ≥3 active (h, w) buckets through the
HOST augmentation path — the reference's ImageSizeBatchSampler recipe
(ref lib/datasets/samplers.py:9-43 draws a random train resolution per
batch; ref lib/datasets/linemod/pvnet.py:62-78 crops/resizes to it) run
end-to-end on TPU with XLA recompiles bounded by the bucket count
(SURVEY.md §7 hard constraint: continuous sizes → a small static set).

The campaign fine-tunes the flagship checkpoint for a few epochs with a
3-bucket sampler, then evaluates at TWO input resolutions (native
480×640, and 384×512 with rescaled intrinsics) — the resolution-
robustness property multi-scale training exists to buy (VERDICT r4
item 7: prove D5/D6 do the reference's multi-scale job).

  python tools/train_multiscale_tpu.py [--epochs 2]
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
from clean_pvnet_tpu.data import DataLoader, LinemodDataset
from clean_pvnet_tpu.eval import InferencePipeline, LinemodEvaluator
from clean_pvnet_tpu.models import make_network
from clean_pvnet_tpu.parallel import make_mesh, shard_batch
from clean_pvnet_tpu.train import CheckpointIO, Trainer
from clean_pvnet_tpu.utils.cache import enable_compilation_cache
from clean_pvnet_tpu.utils.ply import load_ply

BUCKETS = ((352, 480), (416, 544), (480, 640))


def run_eval(cfg, model, state, pipeline, evaluator, loader, scale=1.0):
    """Full E1 metric pass; scale < 1 resizes inputs (and K) on the fly —
    the second-resolution eval row."""
    kpt_err = []
    for i, batch in enumerate(loader):
        inp = jnp.asarray(batch["inp"])
        K_np = np.stack([np.asarray(m["ann"]["K"], np.float32)
                         for m in batch["meta"]])
        if scale != 1.0:
            b, h, w, c = inp.shape
            hw2 = (int(h * scale), int(w * scale))
            inp = jax.image.resize(inp, (b, *hw2, c), "bilinear")
            # principal point/f scale with the resize ((x+0.5)*s-0.5 exact
            # pixel-center mapping is within 0.2 px of K*s at these sizes)
            K_np = K_np.copy()
            K_np[:, 0] *= hw2[1] / w
            K_np[:, 1] *= hw2[0] / h
        out = pipeline(
            {"params": state.params, "batch_stats": state.batch_stats},
            inp, jnp.asarray(K_np), jax.random.PRNGKey(i),
        )
        if scale != 1.0:
            # metrics compare against full-res GT: poses are resolution-
            # free, but proj2d's 5 px threshold is evaluated under the
            # ORIGINAL K by the evaluator, so hand it the original metas
            out = dict(out, mask=np.asarray(
                jax.image.resize(out["mask"].astype(jnp.float32),
                                 (inp.shape[0], *batch["mask"].shape[1:]),
                                 "nearest").astype(jnp.int32)))
        evaluator.evaluate(out, batch)
        pred = np.asarray(out["kpt_2d"])
        for j, meta in enumerate(batch["meta"]):
            ann = meta["ann"]
            gt = np.concatenate(
                [np.asarray(ann["fps_2d"]), [np.asarray(ann["center_2d"])]], 0
            )
            if scale != 1.0:
                gt = gt * scale
            kpt_err.append(float(np.linalg.norm(pred[j] - gt, axis=-1).mean()))
    m = evaluator.summarize()
    m["kpt_px_err"] = float(np.median(kpt_err)) if kpt_err else -1.0
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/synth_r4")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n_train", type=int, default=1600,
                    help="subset of the train split per epoch (the host "
                         "path is augmentation-bound on a 2-core host)")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--init_from", default="data/synth_r4/ckpt")
    ap.add_argument("--ckpt_dir", default="data/synth_r4/ckpt_multiscale")
    ap.add_argument("--out", default="data/record/multiscale_r05.json")
    ap.add_argument("--curve", default="data/record/multiscale_r05_curve.jsonl")
    args = ap.parse_args()
    enable_compilation_cache()

    with open(os.path.join(args.root, "meta.json")) as f:
        meta = json.load(f)

    cfg = Config().with_overrides(
        {
            "cls_type": "synth",
            "data_root": args.root,
            "train.batch_size": args.batch,
            "train.image_buckets": BUCKETS,
            "train.lr": args.lr,
            "train.milestones": (max(args.epochs - 1, 1),),
            "train.device_augment": False,  # the host multi-scale path
            "voting.max_pixels": 128,
            "voting.num_hypotheses": 128,
        }
    )
    model = make_network(cfg)
    mesh = make_mesh(num_devices=1)

    train_ds = LinemodDataset(cfg, meta["train_json"], split="train",
                              host_vertex=False)
    if args.n_train and args.n_train < len(train_ds):
        train_ds.img_ids = train_ds.img_ids[: args.n_train]
    loader = DataLoader(train_ds, args.batch, buckets=BUCKETS,
                        num_workers=args.workers)
    trainer = Trainer(cfg, model, steps_per_epoch=len(loader), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 480, 640, 3))

    ckpt = CheckpointIO(args.ckpt_dir)
    state_r, begin_epoch = ckpt.restore(state)
    if begin_epoch >= 0:
        state = state_r
        print(f"resumed multiscale fine-tune at epoch {begin_epoch}")
    else:
        src = CheckpointIO(args.init_from)
        state, src_epoch = src.restore(state)
        if src_epoch < 0:
            raise SystemExit(f"no checkpoint under {args.init_from}")
        state = state.replace(
            step=jnp.asarray(0, jnp.int32),
            opt_state=trainer.tx.init(state.params),
        )
        print(f"warm-started from {args.init_from} (epoch {src_epoch})")

    os.makedirs(os.path.dirname(args.curve) or ".", exist_ok=True)
    shapes_seen = set()
    t0 = time.time()
    for epoch in range(begin_epoch + 1, args.epochs):
        te = time.time()
        n = 0
        stats = {}
        for batch in loader:
            shapes_seen.add(tuple(batch["inp"].shape[1:3]))
            sb = shard_batch(
                {k: batch[k] for k in ("inp", "mask", "kpt_2d")},
                trainer.mesh, cfg.mesh.data_axis,
            )
            state, stats = trainer._train_step(state, sb)
            n += 1
            if n % 50 == 0:
                print(f"  step {n}/{len(loader)} "
                      f"loss {float(stats['loss']):.4f}", flush=True)
        entry = {
            "epoch": epoch,
            "loss": float(stats["loss"]),
            "vote_loss": float(stats["vote_loss"]),
            "seg_loss": float(stats["seg_loss"]),
            "seconds": round(time.time() - te, 1),
            "buckets_seen": sorted(shapes_seen),
        }
        print(f"epoch {epoch}: {entry}", flush=True)
        with open(args.curve, "a") as f:
            f.write(json.dumps(entry) + "\n")
        ckpt.save(state, epoch)

    # ---- eval at two resolutions ---------------------------------------
    kpt_3d = np.concatenate(
        [np.asarray(meta["fps_3d"]), [np.asarray(meta["center_3d"])]], 0
    )
    mesh_ply = load_ply(meta["model_path"])
    pipeline = InferencePipeline(cfg, model, kpt_3d, un_pnp=False)
    test_ds = LinemodDataset(cfg, meta["test_json"], split="test")
    results = {
        "config": vars(args),
        "buckets": [list(b) for b in BUCKETS],
        "buckets_seen_in_training": sorted(
            list(s) for s in shapes_seen) if shapes_seen else "resumed",
        "train_minutes": (time.time() - t0) / 60,
    }
    for tag, scale in (("native_480x640", 1.0), ("scaled_384x512", 0.8)):
        evaluator = LinemodEvaluator(cfg, mesh_ply["pts"], meta["diameter"],
                                     cls_type="synth")
        test_loader = DataLoader(test_ds, 4, shuffle=False,
                                 buckets=((480, 640),), num_workers=2,
                                 drop_last=False)
        m = run_eval(cfg, model, state, pipeline, evaluator, test_loader,
                     scale=scale)
        results[tag] = m
        print(f"[{tag}] {m}", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
