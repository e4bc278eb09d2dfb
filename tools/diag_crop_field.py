"""Crop-stage field-quality diagnostic (round 5).

Three controls ruled out crop RESOLUTION (256² = 128² ceilings in image
px), training BUDGET (40k steps ≈ 20k), and camera geometry (f≈572
ceiling ≈ 0.9). Remaining suspects for the ~6.5-image-px GT-crop decode
error: (a) a train/eval crop-composition mismatch (the r4 bug family —
training crops statistically unlike DetectionPoseDataset's GT crops), or
(b) the field itself is ~5%-of-extent noisy on BOTH distributions.

This tool decodes a trained crop model on crops drawn from the TRAINING
composer (TlessPoseTrainDataset — same pipeline, fresh draws) and prints
the keypoint error in crop px next to the GT-crop-eval number. Error
similar on both → (b); much lower on training crops → (a).

  python tools/diag_crop_field.py [--root data/cascade_r5] [--n 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from clean_pvnet_tpu.data.tless_pose import TlessPoseTrainDataset
from clean_pvnet_tpu.models import make_network
from clean_pvnet_tpu.models.pvnet import decode_keypoints
from clean_pvnet_tpu.utils.cache import enable_compilation_cache

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_cascade_tpu import _crop_model_path, pose_config  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/cascade_r5")
    ap.add_argument("--cls", default="obj_01")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--out", default="data/record/diag_crop_field_r05.json")
    args = ap.parse_args()
    enable_compilation_cache()

    ns = argparse.Namespace(pose_batch=16, pose_pool=args.n, root=args.root,
                            pose_steps=20000)
    cfg = pose_config(args.cls, ns)
    model = make_network(cfg)
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, args.crop, args.crop, 3)),
                           train=False)
    from flax import serialization

    with open(_crop_model_path(args.root, args.cls), "rb") as f:
        variables = serialization.from_bytes(
            {"params": init_vars["params"],
             "batch_stats": init_vars.get("batch_stats", {})}, f.read())

    ds = TlessPoseTrainDataset(
        cfg, os.path.join(args.root, "train", "scenes.json"),
        crop_size=args.crop, host_vertex=False, seed=777,
    )

    @jax.jit
    def fwd(inp):
        out = model.apply(variables, inp, train=False)
        return decode_keypoints(out["seg"], out["vertex"],
                                jax.random.PRNGKey(0), cfg, un_pnp=False)

    errs, seg_ious = [], []
    B = 16
    for beg in range(0, args.n, B):
        items = [ds[i] for i in range(beg, min(beg + B, args.n))]
        inp = np.stack([it["inp"] for it in items])
        pad = B - len(items)
        if pad:
            inp = np.concatenate([inp, np.repeat(inp[-1:], pad, 0)])
        dec = fwd(jnp.asarray(inp))
        kpt = np.asarray(dec["kpt_2d"])[: len(items)]
        msk = np.asarray(dec["mask"])[: len(items)]
        for j, it in enumerate(items):
            gt = np.asarray(it["kpt_2d"], np.float32)
            errs.append(float(np.linalg.norm(kpt[j] - gt, axis=-1).mean()))
            gm = np.asarray(it["mask"]) > 0
            pm = msk[j] > 0
            inter = float((gm & pm).sum())
            union = float((gm | pm).sum())
            seg_ious.append(inter / max(union, 1.0))
    out = {
        "cls": args.cls,
        "n": args.n,
        "train_crop_kpt_px_mean": float(np.mean(errs)),
        "train_crop_kpt_px_median": float(np.median(errs)),
        "train_crop_seg_iou_median": float(np.median(seg_ious)),
        "note": "compare with cascade_r5 gt_crop_ceiling kpt_px "
                "(IMAGE px; divide by meta crop_size/128 step for crop px)",
    }
    print(json.dumps(out))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
