"""cmd5 (5cm-5°) gap diagnosis (VERDICT r3 item 4).

At the converged flagship, cmd5 sits at 0.78–0.86 while proj2d is 1.00 and
the voted keypoint error is ~2 px. This tool decomposes the failure
geometrically: it Monte-Carlos PnP over the REAL test-split GT poses with
controlled keypoint noise and reports, per noise level and per solver,

  * the 5cm-5° pass rate (ref metric lib/evaluators/linemod/pvnet.py:84-94),
  * median translation error (cm), split into in-plane vs DEPTH (z),
  * median rotation error (deg),

for (a) this repo's DLT+LM `solve_pnp`, (b) the uncertainty-weighted LM
with isotropic covariances, and (c) OpenCV's SOLVEPNP_ITERATIVE — the
reference's solver (ref lib/utils/pvnet/pvnet_pose_utils.py:5-38). If all
solvers show the same cmd5 ceiling at the measured ~2 px noise, the gap is
keypoint-noise geometry (9 points, ~16 cm object, f≈572 → depth is the
weakly-constrained direction), not a PnP deficiency.

  python tools/diag_cmd5.py --root data/synth_r4 --out data/record/cmd5_diag_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--model" not in sys.argv:
    # Monte-Carlo mode is pure geometry — keep it off the TPU; model mode
    # runs the real decode and wants the accelerator.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from clean_pvnet_tpu.eval.metrics import cm_degree  # noqa: E402
from clean_pvnet_tpu.geometry.pnp import (  # noqa: E402
    solve_pnp,
    solve_pnp_uncertainty,
)


def load_gt(root):
    with open(os.path.join(root, "meta.json")) as f:
        meta = json.load(f)
    with open(meta["test_json"]) as f:
        data = json.load(f)
    kpt_3d = np.concatenate(
        [np.asarray(meta["fps_3d"]), [np.asarray(meta["center_3d"])]], 0
    ).astype(np.float32)
    poses, Ks = [], []
    for ann in data["annotations"]:
        poses.append(np.asarray(ann["pose"], np.float32))
        Ks.append(np.asarray(ann["K"], np.float32))
    return kpt_3d, np.stack(poses), np.stack(Ks), meta


def project(kpt_3d, pose, K):
    cam = kpt_3d @ pose[:, :3].T + pose[:, 3]
    pix = cam @ K.T
    return pix[:, :2] / pix[:, 2:]


def eval_solver(name, solve, kpt_3d, poses, Ks, sigma, rng, trials=3):
    rows = {"t_cm": [], "t_xy_cm": [], "t_z_cm": [], "r_deg": [], "cmd5": []}
    for i in range(poses.shape[0]):
        for t in range(trials):
            gt2d = project(kpt_3d, poses[i], Ks[i])
            noisy = gt2d + rng.randn(*gt2d.shape) * sigma
            pred = np.asarray(solve(kpt_3d, noisy.astype(np.float32), Ks[i]))
            if not np.all(np.isfinite(pred)):
                rows["cmd5"].append(False)
                continue
            t_cm, r_deg = cm_degree(jnp.asarray(pred), jnp.asarray(poses[i]))
            t_cm, r_deg = float(t_cm), float(r_deg)
            dt = (pred[:, 3] - poses[i][:, 3]) * 100.0
            rows["t_cm"].append(t_cm)
            rows["t_xy_cm"].append(float(np.linalg.norm(dt[:2])))
            rows["t_z_cm"].append(abs(float(dt[2])))
            rows["r_deg"].append(r_deg)
            rows["cmd5"].append(t_cm < 5.0 and r_deg < 5.0)
    out = {
        "cmd5": float(np.mean(rows["cmd5"])),
        "med_t_cm": float(np.median(rows["t_cm"])),
        "med_t_xy_cm": float(np.median(rows["t_xy_cm"])),
        "med_t_z_cm": float(np.median(rows["t_z_cm"])),
        "med_r_deg": float(np.median(rows["r_deg"])),
        "p90_r_deg": float(np.percentile(rows["r_deg"], 90)),
        "p90_t_z_cm": float(np.percentile(rows["t_z_cm"], 90)),
    }
    print(f"  {name}: {out}")
    return out


def model_mode(args):
    """Decompose the REAL decode's keypoint errors on the test split.

    The Monte-Carlo mode shows isotropic noise cannot produce the cmd5 gap
    (cmd5=1.0 at sigma=2px for every solver incl. cv2); this mode measures
    the actual error STRUCTURE: per image, the 9 error vectors are split
    into a common-mode shift (uniform translation — moves t_xy), a radial
    scale mode (uniform expansion about the centroid — moves DEPTH), and
    residual noise; each mode is correlated with the pose error it
    predicts."""
    import glob

    from clean_pvnet_tpu.config import Config
    from clean_pvnet_tpu.data import DataLoader, LinemodDataset
    from clean_pvnet_tpu.eval import InferencePipeline
    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.train import CheckpointIO, Trainer
    from clean_pvnet_tpu.parallel import make_mesh

    with open(os.path.join(args.root, "meta.json")) as f:
        meta = json.load(f)
    kpt_3d = np.concatenate(
        [np.asarray(meta["fps_3d"]), [np.asarray(meta["center_3d"])]], 0
    ).astype(np.float32)
    cfg = Config().with_overrides(
        {"cls_type": "synth", "data_root": args.root,
         "voting.max_pixels": 8192, "voting.num_hypotheses": 512}
    )
    model = make_network(cfg)
    mesh = make_mesh(num_devices=1)
    trainer = Trainer(cfg, model, steps_per_epoch=1, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 480, 640, 3))
    state, epoch = CheckpointIO(os.path.join(args.root, "ckpt")).restore(state)
    print(f"restored epoch {epoch}")
    pipeline = InferencePipeline(cfg, model, kpt_3d, un_pnp=args.un_pnp)
    ds = LinemodDataset(cfg, meta["test_json"], split="test")
    loader = DataLoader(ds, 4, shuffle=False, buckets=((480, 640),),
                        num_workers=2, drop_last=False)
    rows = []
    for i, batch in enumerate(loader):
        K = jnp.asarray(np.stack([np.asarray(m["ann"]["K"], np.float32)
                                  for m in batch["meta"]]))
        out = pipeline(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(batch["inp"]), K, jax.random.PRNGKey(i),
        )
        pred_k = np.asarray(out["kpt_2d"])
        pred_p = np.asarray(out["pose"])
        for j, m in enumerate(batch["meta"]):
            ann = m["ann"]
            gt_k = np.concatenate(
                [np.asarray(ann["fps_2d"]), [np.asarray(ann["center_2d"])]], 0
            ).astype(np.float32)
            e = pred_k[j] - gt_k                       # [9, 2] error vectors
            common = e.mean(0)                          # uniform shift mode
            c = gt_k - gt_k.mean(0)
            r2 = (c * c).sum()
            scale = float((c * (e - common)).sum() / max(r2, 1e-9))
            resid = e - common - scale * c
            t_cm, r_deg = cm_degree(
                jnp.asarray(pred_p[j]),
                jnp.asarray(np.asarray(ann["pose"], np.float32)),
            )
            dt = (pred_p[j][:, 3] - np.asarray(ann["pose"])[:, 3]) * 100.0
            rows.append({
                "kpt_err_px": float(np.linalg.norm(e, axis=-1).mean()),
                "common_px": float(np.linalg.norm(common)),
                "scale_mode": scale,
                "resid_px": float(np.linalg.norm(resid, axis=-1).mean()),
                "t_cm": float(t_cm), "r_deg": float(r_deg),
                "t_z_cm": abs(float(dt[2])),
                "cmd5": bool(float(t_cm) < 5 and float(r_deg) < 5),
            })
    arr = {k: np.array([r[k] for r in rows], float) for k in rows[0]}
    fails = arr["cmd5"] < 0.5

    def corr(a, b):
        a, b = arr[a], arr[b]
        if a.std() < 1e-9 or b.std() < 1e-9:
            return 0.0
        return float(np.corrcoef(a, b)[0, 1])

    rec = {
        "decode": "un_pnp" if args.un_pnp else "standard",
        "epoch": int(epoch),
        "n": len(rows),
        "cmd5": float(arr["cmd5"].mean()),
        "median": {k: float(np.median(arr[k])) for k in arr},
        "fail_median": (
            {k: float(np.median(arr[k][fails])) for k in arr}
            if fails.any() else None
        ),
        "corr_scaleMode_tz": corr("scale_mode", "t_z_cm"),
        "corr_common_tcm": corr("common_px", "t_cm"),
        "corr_resid_rdeg": corr("resid_px", "r_deg"),
        "note": "scale_mode is the radial-expansion coefficient of the "
                "kpt errors about their centroid (unitless); a positive "
                "corr with t_z_cm attributes the cmd5 tail to a "
                "correlated scale error in the vertex field / voting, "
                "not PnP (see the sigmas table: isotropic noise gives "
                "cmd5=1.0 at 2 px for every solver)",
    }
    print(json.dumps(rec, indent=1))
    out_path = args.out.replace(".json", "_model.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({**rec, "rows": rows}, f, indent=2)
    print("wrote", out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/synth_r4")
    ap.add_argument("--out", default="data/record/cmd5_diag_r04.json")
    ap.add_argument("--sigmas", type=float, nargs="+",
                    default=[0.5, 1.0, 2.0, 3.0])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--model", action="store_true",
                    help="run the real decode on the test split and "
                         "decompose its keypoint-error structure (needs "
                         "the trained checkpoint; runs on the TPU)")
    ap.add_argument("--un_pnp", action="store_true")
    args = ap.parse_args()
    if args.model:
        # model mode wants the accelerator — undo the CPU pin when possible
        model_mode(args)
        return

    kpt_3d, poses, Ks, meta = load_gt(args.root)
    print(f"{poses.shape[0]} GT poses, object diameter "
          f"{meta['diameter']:.3f} m")

    def ours(k3, k2, K):
        return solve_pnp(jnp.asarray(k3), jnp.asarray(k2), jnp.asarray(K))

    def ours_unpnp(k3, k2, K):
        cov = jnp.tile(jnp.eye(2)[None], (k3.shape[0], 1, 1))
        return solve_pnp_uncertainty(jnp.asarray(k3), jnp.asarray(k2), cov,
                                     jnp.asarray(K))

    solvers = {"dlt_lm": ours, "un_pnp_iso": ours_unpnp}
    try:
        import cv2

        def opencv_iter(k3, k2, K):
            ok, rvec, tvec = cv2.solvePnP(
                k3.astype(np.float64), k2.astype(np.float64),
                K.astype(np.float64), None, flags=cv2.SOLVEPNP_ITERATIVE,
            )
            R, _ = cv2.Rodrigues(rvec)
            return np.concatenate([R, tvec], -1).astype(np.float32)

        solvers["cv2_iterative"] = opencv_iter
    except ImportError:
        print("cv2 unavailable — skipping the reference-solver column")

    record = {"n_poses": int(poses.shape[0]), "trials": args.trials,
              "diameter_m": meta["diameter"], "sigmas": {}}
    for sigma in args.sigmas:
        print(f"sigma = {sigma} px")
        rng = np.random.RandomState(0)
        record["sigmas"][str(sigma)] = {
            name: eval_solver(name, fn, kpt_3d, poses, Ks, sigma, rng,
                              args.trials)
            for name, fn in solvers.items()
        }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
