"""Generate the full controlled accuracy benchmark: train/test splits plus
occlusion and truncation stress splits, all with the sharp per-pixel
procedural texture (data/synthetic.py::procedural_texture), and a meta.json
the training/ablation tools consume.

  python tools/make_benchmark_dataset.py --root data/synth_r3 \
      [--n_train 1200] [--n_test 100] [--n_stress 160]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from clean_pvnet_tpu.data.synthetic import (
    generate_stress_split,
    generate_synthetic_dataset,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/synth_r3")
    ap.add_argument("--n_train", type=int, default=1200)
    ap.add_argument("--n_test", type=int, default=100)
    ap.add_argument("--n_stress", type=int, default=160)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--texture_seed", type=int, default=7)
    ap.add_argument("--occlude_frac", type=float, default=0.0,
                    help="fraction of train images with 1-2 distractors "
                         "composited in front (train-time occluder "
                         "augmentation, the reference's fuse pathway)")
    args = ap.parse_args()
    hw = tuple(args.hw)

    t0 = time.time()
    synth = generate_synthetic_dataset(
        args.root, cls="synth", n_train=args.n_train, n_test=args.n_test,
        hw=hw, seed=0, depth=True, texture_seed=args.texture_seed,
        occlude_frac=args.occlude_frac,
    )
    print(f"train/test generated in {time.time()-t0:.0f}s", flush=True)

    for kind in ("occlusion", "truncation", "domain"):
        t1 = time.time()
        path = generate_stress_split(
            args.root, cls="synth", kind=kind, n=args.n_stress, hw=hw,
            texture_seed=args.texture_seed,
            # observed scene depth (target + occluders) feeds eval-time ICP
            # on the split where the reference applies it (occ-LINEMOD,
            # ref lib/evaluators/linemod/pvnet.py:102-116)
            depth=(kind == "occlusion"),
        )
        print(f"{kind} split → {path} in {time.time()-t1:.0f}s", flush=True)

    meta = {
        **{k: v for k, v in synth.items() if isinstance(v, (str, float, int))},
        "fps_3d": np.asarray(synth["fps_3d"]).tolist(),
        "center_3d": np.asarray(synth["center_3d"]).tolist(),
        "texture_seed": args.texture_seed,
    }
    with open(os.path.join(args.root, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(f"done in {time.time()-t0:.0f}s; meta → {args.root}/meta.json")


if __name__ == "__main__":
    main()
