"""Cascade accuracy record: train the CenterNet detector on multi-object
scenes, train per-class crop PVNets to convergence, then run the full
two-stage detector→crop→PVNet→PnP evaluation with the multi-instance
metric set — the reference's T-LESS pathway
(ref lib/networks/ct_pvnet/res.py:74-84 cascade forward,
lib/evaluators/tless_test/ct.py:32-79 detector eval,
lib/datasets/tless_test/pvnet.py:33-93 detection-driven pose test,
lib/evaluators/tless_test/pvnet.py:66-125 ADI/5cm-5°/VSD per GT image).

Round-4 revision (VERDICT r3 items 1 and 6): the r3 crop-PVNet got 256
steps and produced two-stage ADD 0.0 — pure budget. This version removes
the host bottleneck (crop composition ran at ~12 samples/s on the 2-core
host, 1.3 s/step): each class's training pool is composed ONCE on the
host (overlapped with the previous stage's TPU training), staged in HBM,
and trained with `make_scan_step` fused dispatches at device speed. All
`num_classes` crop models are trained, the GT-box crop ceiling is
recorded per class, and stage 3 reports matched ADD/proj2d per class
plus ADI / 5cm-5° / VSD through TlessPoseEvalDriver (the scenes ship
depth maps).

  python tools/train_cascade_tpu.py [--det_epochs 48] [--pose_steps 10000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data import DataLoader
from clean_pvnet_tpu.data.coco import CocoIndex
from clean_pvnet_tpu.data.detection import DetectionSceneDataset
from clean_pvnet_tpu.data.synthetic import generate_multiobject_dataset
from clean_pvnet_tpu.data.tless_pose import (
    DetectionPoseDataset,
    TlessPoseTrainDataset,
)
from clean_pvnet_tpu.eval.metrics import add_error, projection_2d_error
from clean_pvnet_tpu.eval.tless import (
    TlessEvaluator,
    TlessPoseEvalDriver,
    detection_map,
)
from clean_pvnet_tpu.geometry.pnp import solve_pnp
from clean_pvnet_tpu.models import make_network
from clean_pvnet_tpu.models.pvnet import decode_keypoints
from clean_pvnet_tpu.parallel import make_mesh
from clean_pvnet_tpu.train import Trainer
from clean_pvnet_tpu.utils.cache import enable_compilation_cache
from clean_pvnet_tpu.utils.ply import load_ply

HW = (256, 320)
DOWN = 4
CROP = 128
# Camera note (VERDICT r4 missing 3): at the default 256×320 the composed
# K has f≈286 px, where the builder's own error analysis shows a 2.5 px
# keypoint error exhausts the 0.1·d ADD budget in depth alone — two-stage
# ADD saturates at ~0.55 by construction. `--hw 480 640` renders the same
# scenes at the single-object benchmark's camera (f≈572), where the
# iso-noise ADD ceiling is >0.9 and the reference's headline metric can
# register progress (ref lib/evaluators/linemod/pvnet.py:68-82).


def ensure_datasets(root, n_train=600, n_test=100):
    out = {}
    for split, n, seed in (("train", n_train, 0), ("test", n_test, 1)):
        path = os.path.join(root, split, "scenes.json")
        if not os.path.exists(path):
            print(f"generating {split} scenes...", flush=True)
            generate_multiobject_dataset(
                os.path.join(root, split), num_classes=3, n_scenes=n,
                max_inst=4, hw=HW, seed=seed,
            )
        out[split] = path
    return out


def eval_detector(trainer, state, test_ds, score_thresh=0.3):
    """Detection mAP over the test scenes + results list for stage 2."""
    loader = DataLoader(test_ds, 4, shuffle=False, buckets=(HW,),
                        num_workers=2, drop_last=False)
    gts, preds, results = [], [], []
    for batch in loader:
        out = trainer._eval_step(state, jnp.asarray(batch["inp"]))
        bboxes = np.asarray(out["bboxes"]) * DOWN  # grid → image px
        scores = np.asarray(out["scores"])
        classes = np.asarray(out["classes"])
        for j, meta in enumerate(batch["meta"]):
            anns = meta["anns"]
            gts.append(
                [
                    (a["category_id"] - 1,
                     np.asarray(
                         [a["bbox"][0], a["bbox"][1],
                          a["bbox"][0] + a["bbox"][2],
                          a["bbox"][1] + a["bbox"][3]], np.float32))
                    for a in anns
                ]
            )
            keep = scores[j] > score_thresh
            preds.append(
                [
                    (int(classes[j, k]), float(scores[j, k]), bboxes[j, k])
                    for k in np.nonzero(keep)[0]
                ]
            )
            for k in np.nonzero(keep)[0]:
                x1, y1, x2, y2 = bboxes[j, k]
                results.append(
                    {
                        "image_id": int(batch["img_id"][j]),
                        "category_id": int(classes[j, k]) + 1,
                        "bbox": [float(x1), float(y1),
                                 float(x2 - x1), float(y2 - y1)],
                        "score": float(scores[j, k]),
                    }
                )
    m = detection_map(gts, preds)
    return m, results


def box_iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
    ar_a = (a[2] - a[0]) * (a[3] - a[1])
    ar_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(ar_a + ar_b - inter, 1e-9)


def train_detector(args, jsons, mesh, record):
    det_cfg = Config().with_overrides(
        {
            "task": "ct",
            "network.name": "dla34",
            "network.task": "ct",
            "network.ct_num_classes": 3,
            "train.batch_size": args.batch,
            "train.image_buckets": (HW,),
            "train.lr": 1e-3,
            "train.milestones": tuple(
                int(args.det_epochs * f) for f in (0.5, 0.75, 0.9)
            ),
        }
    )
    detector = make_network(det_cfg)
    train_ds = DetectionSceneDataset(det_cfg, jsons["train"], split="train",
                                     num_classes=3)
    test_ds = DetectionSceneDataset(det_cfg, jsons["test"], split="test",
                                    num_classes=3)
    n_scenes = len(train_ds)
    steps_per_epoch = n_scenes // args.batch
    det_trainer = Trainer(det_cfg, detector, steps_per_epoch=steps_per_epoch,
                          mesh=mesh)
    det_state = det_trainer.init_state(jax.random.PRNGKey(0),
                                       (1, HW[0], HW[1], 3))

    # Scene targets are deterministic — stage the whole set in HBM once and
    # run each epoch as ONE fused lax.scan dispatch (the tunnel client makes
    # per-step dispatches expensive; see tools/train_synth_tpu.py).
    print(f"staging {n_scenes} detector scenes in HBM...", flush=True)
    first = train_ds[(0, *HW)]
    keys = ("inp", "ct_hm", "wh", "ct_ind", "ct_valid")
    staged_np = {
        k: np.empty((n_scenes, *np.asarray(first[k]).shape),
                    np.asarray(first[k]).dtype)
        for k in keys
    }
    for i in range(n_scenes):
        item = first if i == 0 else train_ds[(i, *HW)]
        for k in keys:
            staged_np[k][i] = item[k]
    staged = {k: jnp.asarray(v) for k, v in staged_np.items()}
    del staged_np
    jax.block_until_ready(staged["inp"])

    def gather_det(data, idx):
        return {k: jnp.take(v, idx, 0) for k, v in data.items()}

    chunk = det_trainer.make_scan_step(gather_det)
    shuffle_rng = np.random.RandomState(99)
    det_curve = []
    m = {}
    for epoch in range(args.det_epochs):
        te = time.time()
        perm = shuffle_rng.permutation(n_scenes)[: steps_per_epoch * args.batch]
        idx_chunk = jnp.asarray(perm.reshape(steps_per_epoch, args.batch))
        det_state, stats = chunk(det_state, staged, idx_chunk)
        entry = {"epoch": epoch, "loss": float(stats["loss"]),
                 "hm": float(stats["hm_loss"]), "wh": float(stats["wh_loss"]),
                 "seconds": round(time.time() - te, 1)}
        if (epoch + 1) % 8 == 0 or epoch == args.det_epochs - 1:
            m, results = eval_detector(det_trainer, det_state, test_ds)
            entry["map"] = m
            print(f"det epoch {epoch}: loss {entry['loss']:.4f} mAP {m}",
                  flush=True)
        else:
            print(f"det epoch {epoch}: loss {entry['loss']:.4f} "
                  f"({entry['seconds']}s)", flush=True)
        det_curve.append(entry)
    record["detector_curve"] = det_curve
    record["detector_map"] = m
    det_file = os.path.join(args.root, "det_results.json")
    with open(det_file, "w") as f:
        json.dump(results, f)
    print(f"detector results → {det_file} ({len(results)} dets)")
    del staged
    return det_file


def pose_config(cls_name, args):
    return Config().with_overrides(
        {
            "cls_type": cls_name,
            "train.batch_size": args.pose_batch,
            "train.image_buckets": ((CROP, CROP),),
            "train.epoch_size": args.pose_pool,
            "train.lr": 1e-3,
            "train.milestones": tuple(
                int(args.pose_steps / 500 * f) for f in (0.5, 0.7, 0.85)
            ),
            "voting.max_pixels": 1024,
            "voting.num_hypotheses": 128,
        }
    )


_POOL_DS = None


def _pool_init(args_dict, ann_file, cls_name, seed):
    """Spawned-worker initializer: build the dataset once per process."""
    global _POOL_DS, CROP, HW
    args = argparse.Namespace(**args_dict)
    if getattr(args, "crop", None):
        CROP = int(args.crop)  # spawned child re-imports the module fresh
    if getattr(args, "hw", None):
        HW = tuple(args.hw)
    cfg = pose_config(cls_name, args)
    _POOL_DS = TlessPoseTrainDataset(
        cfg, ann_file, crop_size=CROP, host_vertex=False, seed=seed,
        scene_hw=HW,  # the box/jitter statistics follow the SCENE camera
        resample_native=getattr(args, "native_resample", False),
    )


def _pool_item(i):
    it = _POOL_DS[i]
    return (i, it["inp"].astype(np.float32),
            it["mask"].astype(np.uint8),
            it["kpt_2d"].astype(np.float32))


def build_pose_pool(args, ann_file, cls_name, seed, workers=2):
    """Compose the class's training-crop pool on the host (cut-paste +
    distractors + photometric aug, ref lib/datasets/tless_train/pvnet.py:
    33-125) → numpy arrays ready for HBM staging.

    Composition is numpy-Python-bound (no GIL release), so thread workers
    cap at ~5 crops/s on the 2-core host; spawned PROCESS workers reach
    true parallelism (~2x). `spawn` keeps children clear of the parent's
    TPU tunnel state."""
    import multiprocessing as mp

    n = args.pose_pool
    cache = os.path.join(
        args.root,
        f"pool_{cls_name}_{n}_s{seed}"
        + (f"_c{CROP}" if CROP != 128 else "")
        + ("_nr" if getattr(args, "native_resample", False) else "")
        + (f"_hw{HW[0]}" if HW != (256, 320) else "") + ".npz",
    )
    if os.path.exists(cache):
        z = np.load(cache)
        print(f"[pool {cls_name}] loaded cache {cache}", flush=True)
        return {"inp": z["inp"], "mask": z["mask"], "kpt_2d": z["kpt_2d"]}
    inp = np.empty((n, CROP, CROP, 3), np.float32)
    mask = np.empty((n, CROP, CROP), np.uint8)
    kpt = np.empty((n, 9, 2), np.float32)
    t0, i = time.time(), 0
    ctx = mp.get_context("spawn")
    with ctx.Pool(workers, initializer=_pool_init,
                  initargs=(vars(args), ann_file, cls_name, seed)) as p:
        for j, inp_j, mask_j, kpt_j in p.imap_unordered(
            _pool_item, range(n), chunksize=32
        ):
            inp[j], mask[j], kpt[j] = inp_j, mask_j, kpt_j
            i += 1
            if i % 1024 == 0:
                print(f"[pool {cls_name}] {i}/{n} "
                      f"({i / max(time.time() - t0, 1e-9):.1f}/s)",
                      flush=True)
    print(f"[pool {cls_name}] {i} crops in {time.time() - t0:.0f}s",
          flush=True)
    np.savez(cache, inp=inp, mask=mask, kpt_2d=kpt)
    return {"inp": inp, "mask": mask, "kpt_2d": kpt}


def gt_crop_items(pose_cfg, test_json, cls_idx):
    """GT-box crops of the test scenes for this class (det_gt path)."""
    ds = DetectionPoseDataset(pose_cfg, test_json, det_file=None,
                              crop_size=CROP)
    idxs = [i for i in range(len(ds)) if ds.index[i]["cls"] == cls_idx]
    return ds, [ds[i] for i in idxs]


def make_crop_decoder(pose_cfg, model, un_pnp):
    """Jitted crop forward+decode; returns (kpt_crop [B,9,2], var|None)."""

    @jax.jit
    def fwd(vrs, inp):
        out = model.apply(vrs, inp, train=False)
        return decode_keypoints(out["seg"], out["vertex"],
                                jax.random.PRNGKey(0), pose_cfg,
                                un_pnp=un_pnp)

    def run(variables, inp):
        dec = fwd(variables, jnp.asarray(inp))
        var = np.asarray(dec["var"]) if un_pnp and "var" in dec else None
        return np.asarray(dec["kpt_2d"]), var

    return run


def crop_pnp(kpt_3d, kpt_img, K, var_img=None):
    """Image-frame PnP; uncertainty-weighted when the decode covariance is
    available (the reference's T-LESS un_pnp test config,
    ref lib/evaluators/tless_test/pvnet.py:228-239)."""
    from clean_pvnet_tpu.geometry.pnp import solve_pnp_uncertainty

    if var_img is not None:
        return np.asarray(
            solve_pnp_uncertainty(
                jnp.asarray(kpt_3d, jnp.float32),
                jnp.asarray(kpt_img, jnp.float32),
                jnp.asarray(var_img, jnp.float32), jnp.asarray(K))
        )
    return np.asarray(
        solve_pnp(jnp.asarray(kpt_3d, jnp.float32),
                  jnp.asarray(kpt_img, jnp.float32), jnp.asarray(K))
    )


def eval_crops(pose_cfg, model, variables, ds, items, kpt_3d, mesh_pts,
               diameter, tag, un_pnp=False):
    """Decode + PnP on a fixed set of crops; returns kpt px err / ADD /
    proj2d. For GT crops this is the single-stage crop ceiling."""
    if not items:
        return {}

    decoder = make_crop_decoder(pose_cfg, model, un_pnp)
    adds, projs, errs = [], [], []
    B = 16
    pts = jnp.asarray(mesh_pts, jnp.float32)
    for beg in range(0, len(items), B):
        sub = items[beg:beg + B]
        inp = np.stack([it["inp"] for it in sub])
        pad = B - len(sub)
        if pad:
            inp = np.concatenate([inp, np.repeat(inp[-1:], pad, 0)])
        kpt_crop, var = decoder(variables, inp)
        kpt_crop = kpt_crop[: len(sub)]
        for j, it in enumerate(sub):
            ann = it["meta"]["ann"]
            K = np.asarray(ann["K"], np.float32)
            kpt_img = ds_kpt_to_image(it, kpt_crop[j])
            step = it["meta"]["crop_size"] / CROP
            var_img = var[j] * step * step if var is not None else None
            gt_kpt = np.asarray(
                list(ann["fps_2d"]) + [ann["center_2d"]], np.float32
            )
            errs.append(float(np.linalg.norm(kpt_img - gt_kpt, axis=-1).mean()))
            pose_pred = crop_pnp(kpt_3d, kpt_img, K, var_img)
            pose_gt = np.asarray(ann["pose"], np.float32)
            adds.append(
                float(add_error(pts, jnp.asarray(pose_pred),
                                jnp.asarray(pose_gt))) < 0.1 * diameter
            )
            projs.append(
                float(projection_2d_error(pts, jnp.asarray(pose_pred),
                                          jnp.asarray(pose_gt),
                                          jnp.asarray(K))) < 5.0
            )
    out = {"n": len(items), "kpt_px": float(np.mean(errs)),
           "add": float(np.mean(adds)), "proj2d": float(np.mean(projs))}
    print(f"[{tag}] {out}", flush=True)
    return out


_EVAL_DS = {}


def ds_kpt_to_image(item, kpt_crop):
    meta = item["meta"]
    step = meta["crop_size"] / CROP
    cx, cy = meta["crop_center"]
    corner = np.array([cx - meta["crop_size"] / 2.0,
                       cy - meta["crop_size"] / 2.0])
    return (kpt_crop + 0.5) * step + corner - 0.5


def train_pose_class(args, mesh, cls_name, pool, record):
    """Stage the pool in HBM, train the crop PVNet with fused scan steps."""
    pose_cfg = pose_config(cls_name, args)
    model = make_network(pose_cfg)
    steps_per_epoch = 500
    trainer = Trainer(pose_cfg, model, steps_per_epoch=steps_per_epoch,
                      mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(1), (1, CROP, CROP, 3))

    staged = {k: jnp.asarray(v) for k, v in pool.items()}
    jax.block_until_ready(staged["inp"])

    def gather(data, idx):
        return {
            "inp": jnp.take(data["inp"], idx, 0),
            "mask": jnp.take(data["mask"], idx, 0).astype(jnp.int32),
            "kpt_2d": jnp.take(data["kpt_2d"], idx, 0),
        }

    chunk = trainer.make_scan_step(gather)
    rng = np.random.RandomState(11)
    n = pool["inp"].shape[0]
    curve = []
    scan = args.scan
    B = args.pose_batch
    t0 = time.time()
    done = 0
    while done < args.pose_steps:
        k = min(scan, args.pose_steps - done)
        idx = rng.randint(0, n, size=(k, B))
        state, stats = chunk(state, staged, jnp.asarray(idx))
        done += k
        entry = {"step": done, "loss": float(stats["loss"]),
                 "vote": float(stats["vote_loss"]),
                 "seconds": round(time.time() - t0, 1)}
        curve.append(entry)
        print(f"[pose {cls_name}] step {done}/{args.pose_steps} "
              f"loss {entry['loss']:.4f} vote {entry['vote']:.4f} "
              f"({entry['seconds']}s)", flush=True)
    record[f"pose_curve_{cls_name}"] = curve
    del staged
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _save_crop_model(args.root, cls_name, variables)
    return pose_cfg, model, variables


_MODEL_SUFFIX = [""]


def _crop_model_path(root, cls_name):
    suffix = (f"_c{CROP}" if CROP != 128 else "") + _MODEL_SUFFIX[0]
    return os.path.join(root, f"crop_{cls_name}{suffix}.msgpack")


def _save_crop_model(root, cls_name, variables):
    from flax import serialization

    with open(_crop_model_path(root, cls_name), "wb") as f:
        f.write(serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, variables)))
    print(f"saved crop model → {_crop_model_path(root, cls_name)}",
          flush=True)


def _load_crop_model(root, cls_name, template):
    from flax import serialization

    with open(_crop_model_path(root, cls_name), "rb") as f:
        return serialization.from_bytes(template, f.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/cascade_r3")
    ap.add_argument("--det_epochs", type=int, default=48)
    ap.add_argument("--pose_steps", type=int, default=10000)
    ap.add_argument("--pose_pool", type=int, default=8192)
    ap.add_argument("--pose_batch", type=int, default=16)
    ap.add_argument("--scan", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="data/record/cascade_r4.json")
    ap.add_argument("--n_train_scenes", type=int, default=600)
    ap.add_argument("--n_test_scenes", type=int, default=100)
    ap.add_argument("--num_classes", type=int, default=3)
    ap.add_argument("--skip_det", action="store_true",
                    help="reuse <root>/det_results.json from a prior run")
    ap.add_argument("--load_pose", action="store_true",
                    help="reuse <root>/crop_<cls>.msgpack crop models from "
                         "a prior run (skip stage-2 training)")
    ap.add_argument("--un_pnp", action="store_true",
                    help="stage-3 decode: covariance decode + uncertainty "
                         "PnP per crop (the reference's T-LESS test config)")
    ap.add_argument("--hw", type=int, nargs=2, default=None,
                    help="scene resolution (default 256 320); 480 640 "
                         "composes K at f≈572 — the ADD-discriminative "
                         "camera (see module note)")
    ap.add_argument("--native_resample", action="store_true",
                    help="compose training crops at the box's native "
                         "scene-pixel resolution and downsample to the "
                         "crop size — resampling parity with the "
                         "test-time warp (round-5 crop-field diagnosis)")
    ap.add_argument("--crop", type=int, default=None,
                    help="crop-stage resolution (default 128). At the "
                         "480×640 camera objects span 110-210 px, so 128² "
                         "crops DOWNSCALE them and crop-pixel decode error "
                         "maps to ~1.6× image px; 256 keeps them at native "
                         "resolution (r5 ceiling: 6.7 image px at crop 128)")
    args = ap.parse_args()
    if args.hw:
        global HW
        HW = tuple(args.hw)
    if args.crop:
        global CROP
        CROP = int(args.crop)
    if args.native_resample:
        _MODEL_SUFFIX[0] = "_nr"
    enable_compilation_cache()
    t_start = time.time()

    jsons = ensure_datasets(args.root, args.n_train_scenes,
                            args.n_test_scenes)
    mesh = make_mesh(num_devices=1)
    record = {"config": vars(args), "hw": list(HW)}

    class_names = [f"obj_{c + 1:02d}" for c in range(args.num_classes)]

    # Pool composition is host-bound (~12 crops/s on 2 cores) and TPU
    # training is device-bound — overlap them: the next class's pool builds
    # on a thread while the current stage trains.
    pools: dict[str, dict] = {}
    pool_lock = threading.Condition()

    def pool_builder():
        for ci, cname in enumerate(class_names):
            if args.load_pose and os.path.exists(
                _crop_model_path(args.root, cname)
            ):
                continue
            p = build_pose_pool(args, jsons["train"], cname, seed=ci)
            with pool_lock:
                pools[cname] = p
                pool_lock.notify_all()

    builder = threading.Thread(target=pool_builder, daemon=True)
    builder.start()

    # ---------------- stage 1: detector ---------------------------------
    det_file = os.path.join(args.root, "det_results.json")
    if args.skip_det and os.path.exists(det_file):
        print(f"skip_det: reusing {det_file}")
        record["detector_map"] = "reused"
    else:
        det_file = train_detector(args, jsons, mesh, record)

    # ---------------- stage 2: per-class crop PVNets ---------------------
    test_json = jsons["test"]
    train_root = os.path.join(args.root, "train")
    class_assets, class_results = [], {}
    models = {}
    for ci, cname in enumerate(class_names):
        if args.load_pose and os.path.exists(
            _crop_model_path(args.root, cname)
        ):
            pose_cfg = pose_config(cname, args)
            model = make_network(pose_cfg)
            init_vars = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, CROP, CROP, 3), jnp.float32), train=False)
            template = {"params": init_vars["params"],
                        "batch_stats": init_vars.get("batch_stats", {})}
            variables = _load_crop_model(args.root, cname, template)
            print(f"loaded crop model for {cname}")
        else:
            with pool_lock:
                while cname not in pools:
                    pool_lock.wait(5.0)
                pool = pools.pop(cname)
            pose_cfg, model, variables = train_pose_class(
                args, mesh, cname, pool, record
            )
            del pool

        mesh_ply = load_ply(os.path.join(train_root, cname, f"{cname}.ply"))
        d2 = ((mesh_ply["pts"][:, None] - mesh_ply["pts"][None]) ** 2).sum(-1)
        diameter = float(np.sqrt(d2.max()))
        ds_tmp = TlessPoseTrainDataset(pose_cfg, jsons["train"],
                                       crop_size=CROP, host_vertex=False)
        kpt_3d = np.concatenate([ds_tmp.fps_3d, [ds_tmp.center_3d]], 0)
        class_assets.append(
            {"name": cname, "pts": mesh_ply["pts"], "faces": mesh_ply["faces"],
             "diameter": diameter, "kpt_3d": kpt_3d}
        )
        models[cname] = (pose_cfg, model, variables)

        # single-stage crop ceiling: GT boxes → crops → decode → PnP
        gt_ds, gt_items = gt_crop_items(pose_cfg, test_json, ci)
        class_results[cname] = {
            "gt_crop_ceiling": eval_crops(
                pose_cfg, model, variables, gt_ds, gt_items, kpt_3d,
                mesh_ply["pts"], diameter, f"ceiling {cname}",
                un_pnp=args.un_pnp,
            )
        }

    # ---------------- stage 3: two-stage eval ----------------------------
    coco = CocoIndex(test_json)
    eval_cfg = Config().with_overrides({"test.vsd": True})
    evaluator = TlessEvaluator(
        eval_cfg,
        class_models=[{"pts": a["pts"], "diameter": a["diameter"]}
                      for a in class_assets],
        hw=HW,
        vsd_meshes=[(a["pts"], a["faces"]) for a in class_assets],
    )
    driver = TlessPoseEvalDriver(eval_cfg, evaluator, coco, match="image")

    gt_by_img = {}
    for img_id in coco.get_img_ids():
        gt_by_img[img_id] = coco.load_anns(img_id)

    per_class_matched = {a["name"]: {"adds": [], "projs": [], "matched": 0}
                         for a in class_assets}
    for ci, asset in enumerate(class_assets):
        cname = asset["name"]
        pose_cfg, model, variables = models[cname]
        det_ds = DetectionPoseDataset(pose_cfg, test_json, det_file=det_file,
                                      crop_size=CROP)
        idxs = [i for i in range(len(det_ds))
                if det_ds.index[i]["cls"] == ci]
        print(f"two-stage eval {cname}: {len(idxs)} detections")
        decoder = make_crop_decoder(pose_cfg, model, args.un_pnp)

        B = 16
        pts = jnp.asarray(asset["pts"], jnp.float32)
        for beg in range(0, len(idxs), B):
            sub = [det_ds[i] for i in idxs[beg:beg + B]]
            inp = np.stack([it["inp"] for it in sub])
            pad = B - len(sub)
            if pad:
                inp = np.concatenate([inp, np.repeat(inp[-1:], pad, 0)])
            kpt_crop, var = decoder(variables, inp)
            kpt_crop = kpt_crop[: len(sub)]
            poses, metas, img_ids = [], [], []
            for j, it in enumerate(sub):
                meta = it["meta"]
                kpt_img = ds_kpt_to_image(it, kpt_crop[j])
                step = meta["crop_size"] / CROP
                var_img = var[j] * step * step if var is not None else None
                # intrinsics: every instance in a scene shares the scene K
                anns = gt_by_img.get(it["img_id"], [])
                K = np.asarray(
                    anns[0]["K"] if anns
                    else [[572.4, 0, HW[1] / 2], [0, 573.6, HW[0] / 2],
                          [0, 0, 1]],
                    np.float32,
                )
                pose_pred = crop_pnp(asset["kpt_3d"], kpt_img, K, var_img)
                poses.append(pose_pred)
                metas.append(meta)
                img_ids.append(it["img_id"])

                # matched per-class ADD/proj2d (r3 protocol, kept for
                # round-over-round comparability)
                cands = [a for a in anns if a["category_id"] == ci + 1]
                if not cands:
                    continue
                ious = [
                    box_iou(meta["box"],
                            [a["bbox"][0], a["bbox"][1],
                             a["bbox"][0] + a["bbox"][2],
                             a["bbox"][1] + a["bbox"][3]])
                    for a in cands
                ]
                best = int(np.argmax(ious))
                if ious[best] < 0.3:
                    continue
                ann = cands[best]
                pose_gt = np.asarray(ann["pose"], np.float32)
                pc = per_class_matched[cname]
                pc["adds"].append(
                    float(add_error(pts, jnp.asarray(poses[-1]),
                                    jnp.asarray(pose_gt)))
                    < 0.1 * asset["diameter"]
                )
                pc["projs"].append(
                    float(projection_2d_error(pts, jnp.asarray(poses[-1]),
                                              jnp.asarray(pose_gt),
                                              jnp.asarray(K))) < 5.0
                )
                pc["matched"] += 1
            driver.evaluate(
                {"pose": np.stack(poses)} if poses else {"pose": np.zeros((0, 3, 4))},
                {"meta": metas, "img_id": img_ids},
            )

    multi_instance = driver.summarize()
    record["multi_instance"] = {
        **multi_instance,
        "protocol": "per-GT-image any-match (ref tless_test/pvnet.py:252-256)"
                    ", VSD step cost tau=20mm delta=15mm thresh 0.3",
    }
    two_stage = {}
    for ci, a in enumerate(class_assets):
        cname = a["name"]
        pc = per_class_matched[cname]
        n_gt = sum(
            1 for anns in gt_by_img.values() for x in anns
            if x["category_id"] == ci + 1
        )
        two_stage[cname] = {
            "n_gt_instances": n_gt,
            "n_matched_detections": pc["matched"],
            "recall": pc["matched"] / max(n_gt, 1),
            "add": float(np.mean(pc["adds"])) if pc["adds"] else 0.0,
            "proj2d": float(np.mean(pc["projs"])) if pc["projs"] else 0.0,
            "gt_crop_ceiling": class_results[cname]["gt_crop_ceiling"],
        }
    record["two_stage"] = two_stage
    record["two_stage"]["decode"] = (
        "un_pnp covariance decode + uncertainty PnP" if args.un_pnp
        else "standard 1024px/128hyp, PnP iterative"
    )
    record["minutes"] = (time.time() - t_start) / 60
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print("two_stage:", json.dumps(two_stage, indent=1))
    print("multi_instance:", multi_instance)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
