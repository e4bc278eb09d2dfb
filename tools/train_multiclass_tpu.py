"""Multi-class training campaign: N synthetic classes through the
catalog/registry machinery, per-class PVNet models, per-class ADD table
(VERDICT r3 item 6 — the BASELINE config-5 analog: "full PVNet training on
all 13 LINEMOD objects", ref configs/linemod.yaml recipe ×
lib/datasets/dataset_catalog.py:5-92 per-class path templating).

Per-class models mirror the reference's one-config-per-object flow; each
class resolves its annotation paths through DatasetCatalog
("SyntheticTrain"/"SyntheticTest" templates on cfg.cls_type), stages its
frames in HBM, and trains with fused lax.scan dispatches — the same SPMD
train step the multichip dryrun shards over the 8-device mesh.

  python tools/train_multiclass_tpu.py [--classes 8] [--steps 6000]
  python tools/train_multiclass_tpu.py --generate_only   # host-side prep
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

HW = (240, 320)


def class_name(i):
    return f"mc{i:02d}"


def _gen_one(root_i_seed):
    root, i = root_i_seed
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    from clean_pvnet_tpu.data.synthetic import generate_synthetic_dataset

    t0 = time.time()
    meta = generate_synthetic_dataset(
        root, cls=class_name(i), n_train=600, n_test=50, hw=HW,
        seed=1000 + i, mesh_seed=i, texture_seed=11 + i,
        occlude_frac=0.25,
    )
    return i, {
        **{k: v for k, v in meta.items() if isinstance(v, (str, float, int))},
        "fps_3d": np.asarray(meta["fps_3d"]).tolist(),
        "center_3d": np.asarray(meta["center_3d"]).tolist(),
        "seconds": round(time.time() - t0, 1),
    }


def ensure_data(root, n_classes, workers=2):
    meta_path = os.path.join(root, "meta_multiclass.json")
    metas = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metas = json.load(f)
    missing = [i for i in range(n_classes) if class_name(i) not in metas]
    if not missing:
        return metas
    import multiprocessing as mp

    os.makedirs(root, exist_ok=True)
    ctx = mp.get_context("spawn")
    with ctx.Pool(workers) as p:
        for i, m in p.imap_unordered(_gen_one, [(root, i) for i in missing]):
            metas[class_name(i)] = m
            print(f"[gen] {class_name(i)} done in {m['seconds']}s",
                  flush=True)
    with open(meta_path, "w") as f:
        json.dump(metas, f)
    return metas


def train_class(args, mesh, cls, meta):
    from clean_pvnet_tpu.config import Config
    from clean_pvnet_tpu.data import DataLoader, LinemodDataset
    from clean_pvnet_tpu.data.catalog import DatasetCatalog
    from clean_pvnet_tpu.eval import InferencePipeline, LinemodEvaluator
    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.train import Trainer
    from clean_pvnet_tpu.utils.ply import load_ply

    epochs = -(-args.steps // 75)  # 600 imgs / batch 8
    cfg = Config().with_overrides(
        {
            "cls_type": cls,
            "data_root": args.root,
            "train.batch_size": args.batch,
            "train.image_buckets": (HW,),
            "train.lr": 1e-3,
            # deep decay ladder: the flagship's accuracy steps landed with
            # the lr halvings (synth_r4_curve.jsonl) — start them early
            "train.milestones": tuple(
                int(epochs * f) for f in (0.45, 0.62, 0.76, 0.88)
            ),
            "train.dataset": "SyntheticTrain",
            "test.dataset": "SyntheticTest",
            "voting.max_pixels": 128,
            "voting.num_hypotheses": 128,
        }
    )
    # the catalog resolves every path from (dataset name, data_root, cls)
    train_entry = DatasetCatalog.get("SyntheticTrain", args.root, cls)
    test_entry = DatasetCatalog.get("SyntheticTest", args.root, cls)

    model = make_network(cfg)
    train_ds = LinemodDataset(cfg, train_entry.ann_file, split="train",
                              host_vertex=False)
    n_imgs = len(train_ds)
    steps_per_epoch = n_imgs // args.batch
    trainer = Trainer(cfg, model, steps_per_epoch=steps_per_epoch, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, *HW, 3))

    frames = np.empty((n_imgs, *HW, 3), np.uint8)
    masks = np.empty((n_imgs, *HW), np.uint8)
    kpts = np.empty((n_imgs, 9, 2), np.float32)
    for i in range(n_imgs):
        img, kpt_2d, mask_i, _ = train_ds.read(train_ds.img_ids[i])
        frames[i], masks[i], kpts[i] = img, mask_i, kpt_2d
        train_ds._cache.clear()
    data = (jnp.asarray(frames), jnp.asarray(masks), jnp.asarray(kpts))
    del frames, masks, kpts
    jax.block_until_ready(data[0])

    chunk = trainer.make_scan_step(
        lambda d, idx: {
            "inp_u8": jnp.take(d[0], idx, axis=0),
            "mask": jnp.take(d[1], idx, axis=0).astype(jnp.int32),
            "kpt_2d": jnp.take(d[2], idx, axis=0),
        }
    )
    rng = np.random.RandomState(7)
    t0 = time.time()
    done = 0
    stats = {}
    while done < args.steps:
        k = min(args.scan, args.steps - done)
        idx = rng.randint(0, n_imgs, size=(k, args.batch))
        state, stats = chunk(state, data, jnp.asarray(idx))
        done += k
        if done % 2000 < args.scan:
            print(f"[{cls}] step {done}/{args.steps} "
                  f"loss {float(stats['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    train_s = time.time() - t0
    del data

    # ---- eval: standard decode, full E1 metric set ----------------------
    kpt_3d = np.concatenate(
        [np.asarray(meta["fps_3d"]), [np.asarray(meta["center_3d"])]], 0
    )
    pipeline = InferencePipeline(cfg, model, kpt_3d, un_pnp=False)
    mesh_ply = load_ply(meta["model_path"])
    evaluator = LinemodEvaluator(cfg, mesh_ply["pts"], meta["diameter"],
                                 cls_type=cls)
    test_ds = LinemodDataset(cfg, test_entry.ann_file, split="test")
    loader = DataLoader(test_ds, 5, shuffle=False, buckets=(HW,),
                        num_workers=2, drop_last=False)
    kpt_err = []
    for i, batch in enumerate(loader):
        K = jnp.asarray(np.stack([np.asarray(m["ann"]["K"], np.float32)
                                  for m in batch["meta"]]))
        out = pipeline(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(batch["inp"]), K, jax.random.PRNGKey(i),
        )
        evaluator.evaluate(out, batch)
        pred = np.asarray(out["kpt_2d"])
        for j, m in enumerate(batch["meta"]):
            ann = m["ann"]
            gt = np.concatenate(
                [np.asarray(ann["fps_2d"]), [np.asarray(ann["center_2d"])]], 0
            )
            kpt_err.append(float(np.linalg.norm(pred[j] - gt, axis=-1).mean()))
    res = evaluator.summarize()
    res["kpt_px_err"] = float(np.median(kpt_err))
    res["final_loss"] = float(stats["loss"])
    res["train_seconds"] = round(train_s, 1)
    res["steps"] = args.steps

    if args.un_pnp_row:
        # per-class serving-decode row (VERDICT r4 item 9 "per-class decode
        # configs"): the r4 recommended config — pooled-covariance un_pnp
        # with 20 adaptive rounds — validated on every class, next to the
        # standard decode
        cfg_u = cfg.with_overrides(
            {"voting.cov_reuse": True, "voting.num_rounds": 20}
        )
        pipeline_u = InferencePipeline(cfg_u, model, kpt_3d, un_pnp=True)
        eval_u = LinemodEvaluator(cfg_u, mesh_ply["pts"], meta["diameter"],
                                  cls_type=cls)
        for i, batch in enumerate(loader):
            K = jnp.asarray(np.stack([np.asarray(m["ann"]["K"], np.float32)
                                      for m in batch["meta"]]))
            out = pipeline_u(
                {"params": state.params, "batch_stats": state.batch_stats},
                jnp.asarray(batch["inp"]), K, jax.random.PRNGKey(i),
            )
            eval_u.evaluate(out, batch)
        res["un_pnp_reuse"] = eval_u.summarize()

    print(f"[{cls}] {res}", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/multiclass_r4")
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scan", type=int, default=200)
    ap.add_argument("--out", default="data/record/multiclass_r04.json")
    ap.add_argument("--generate_only", action="store_true")
    ap.add_argument("--un_pnp_row", action="store_true",
                    help="also evaluate each class with the serving decode "
                         "(cov_reuse un_pnp, 20 rounds) — per-class decode "
                         "config validation")
    ap.add_argument("--start_class", type=int, default=0,
                    help="skip classes below this index (resume an "
                         "interrupted campaign; merge records by hand)")
    args = ap.parse_args()

    metas = ensure_data(args.root, args.classes)
    if args.generate_only:
        print("datasets ready")
        return

    from clean_pvnet_tpu.parallel import make_mesh
    from clean_pvnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mesh = make_mesh(num_devices=1)
    t0 = time.time()
    record = {"config": vars(args), "hw": list(HW), "classes": {}}
    if args.start_class and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        record["classes"].update(prior.get("classes", {}))
    for i in range(args.start_class, args.classes):
        cls = class_name(i)
        record["classes"][cls] = train_class(args, mesh, cls, metas[cls])
        # checkpoint the record incrementally
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=2)
    vals = record["classes"]
    record["mean"] = {
        k: float(np.mean([v[k] for v in vals.values()]))
        for k in ("add", "proj2d", "cmd5", "kpt_px_err")
    }
    record["minutes"] = (time.time() - t0) / 60
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print("mean:", record["mean"])
    print("wrote", args.out)


if __name__ == "__main__":
    main()
