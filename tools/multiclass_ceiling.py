"""Append per-class geometric ADD ceilings to the multiclass record.

The 240×320 campaign camera (f≈286 px) makes ADD<0.1·d depth-bounded: a
kpt error of ~3 px costs more depth than the threshold allows for part of
the pose distribution. For each class this tool Monte-Carlos PnP over the
REAL test GT poses with isotropic noise at the class's measured keypoint
error and records the resulting ADD pass rate — the iso-noise geometric
ceiling. Measured ADD below the ceiling indicates correlated decode error
(see cmd5_diag_r04); at/near it indicates camera-geometry-bounded.

  python tools/multiclass_ceiling.py [--record data/record/multiclass_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from clean_pvnet_tpu.eval.metrics import add_error  # noqa: E402
from clean_pvnet_tpu.geometry.pnp import solve_pnp  # noqa: E402
from clean_pvnet_tpu.utils.ply import load_ply  # noqa: E402


def ceiling(meta, test_json, sigma, n_poses=50, trials=3):
    with open(test_json) as f:
        d = json.load(f)
    kpt_3d = np.concatenate(
        [np.asarray(meta["fps_3d"]), [np.asarray(meta["center_3d"])]], 0
    ).astype(np.float32)
    pts = jnp.asarray(load_ply(meta["model_path"])["pts"], jnp.float32)
    diam = meta["diameter"]
    rng = np.random.RandomState(0)
    ok = []
    for ann in d["annotations"][:n_poses]:
        pose = np.asarray(ann["pose"], np.float32)
        K = np.asarray(ann["K"], np.float32)
        cam = kpt_3d @ pose[:, :3].T + pose[:, 3]
        uv = cam @ K.T
        uv = uv[:, :2] / uv[:, 2:]
        for _ in range(trials):
            noisy = (uv + rng.randn(9, 2) * sigma).astype(np.float32)
            pred = np.asarray(
                solve_pnp(jnp.asarray(kpt_3d), jnp.asarray(noisy),
                          jnp.asarray(K))
            )
            ok.append(
                float(add_error(pts, jnp.asarray(pred), jnp.asarray(pose)))
                < 0.1 * diam
            )
    return float(np.mean(ok))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", default="data/record/multiclass_r04.json")
    ap.add_argument("--root", default="data/multiclass_r4")
    args = ap.parse_args()
    with open(args.record) as f:
        rec = json.load(f)
    with open(os.path.join(args.root, "meta_multiclass.json")) as f:
        metas = json.load(f)
    for cls, res in rec["classes"].items():
        sigma = res["kpt_px_err"]
        c = ceiling(metas[cls], os.path.join(args.root, f"{cls}_test.json"),
                    sigma)
        res["add_iso_ceiling_at_kpt_err"] = c
        print(f"{cls}: add {res['add']:.2f} vs iso-noise ceiling {c:.2f} "
              f"at sigma={sigma:.2f}px")
    rec["note"] = (
        "add_iso_ceiling_at_kpt_err: Monte-Carlo PnP over the class's real "
        "GT poses with isotropic keypoint noise at the measured kpt error — "
        "the camera-geometry ADD ceiling at this 240x320 f~286 px camera. "
        "proj2d/kpt_px_err are the resolution-independent rows."
    )
    with open(args.record, "w") as f:
        json.dump(rec, f, indent=2)
    print("updated", args.record)


if __name__ == "__main__":
    main()
