"""Multi-instance (T-LESS-style) evaluator: ADI, 5cm-5°, VSD per GT
instance, plus detection mAP for the detector stage.

Behavioral counterpart of reference lib/evaluators/tless_test/pvnet.py:
33-303 (per-detection pose estimation matched back to GT instances, metrics
counted per GT) and lib/evaluators/tless_test/ct.py:32-79 (COCO bbox mAP,
re-implemented here without pycocotools).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.eval.metrics import adds_error, cm_degree
from clean_pvnet_tpu.eval.vsd import vsd_pose_error
from clean_pvnet_tpu.registry import EVALUATORS


@jax.jit
def _batch_adi_cmd5(pts, poses_p, poses_g):
    """Vectorized ADD-S distance + 5cm-5° terms for M same-class pose pairs.

    pts [N,3], poses_* [M,3,4] → (dist [M], t_cm [M], r_deg [M]). One device
    round trip replaces the reference's per-pair host loop
    (ref lib/evaluators/tless_test/pvnet.py:107-125)."""

    def one(pp, pg):
        d = adds_error(pts, pp, pg)
        t_cm, r_deg = cm_degree(pp, pg)
        return d, t_cm, r_deg

    return jax.vmap(one)(poses_p, poses_g)


@partial(jax.jit, static_argnames=("hw", "delta", "tau"))
def _batch_vsd(verts, faces, depth_test, poses_p, poses_g, Ks, hw, delta, tau):
    """Vectorized VSD errors for M same-class pose pairs → err [M]."""

    def one(pp, pg, K):
        return vsd_pose_error(pp, pg, verts, faces, depth_test, K, hw,
                              delta=delta, tau=tau, cost_type="step")

    return jax.vmap(one)(poses_p, poses_g, Ks)


def _pad_rows(arrs, m_padded):
    """Pad leading dim of each array to m_padded by repeating the last row
    (keeps shapes in a small bucket set so the jitted batch fns compile
    once per (class, bucket), not once per pair count)."""
    out = []
    for a in arrs:
        pad = m_padded - a.shape[0]
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], 0)
        out.append(a)
    return out


@EVALUATORS.register("ct_pvnet")
class TlessEvaluator:
    def __init__(
        self,
        cfg: Config,
        class_models: list[dict],
        hw: tuple[int, int],
        vsd_meshes: list[tuple] | None = None,
    ):
        """class_models[c]: {'pts': [N,3], 'diameter': float}.
        vsd_meshes[c]: (verts, faces) for depth rendering (optional — VSD is
        skipped without depth/meshes, like the reference skips ICP without
        depth)."""
        self.cfg = cfg
        self.models = [
            {
                "pts": jnp.asarray(m["pts"], jnp.float32),
                "diameter": float(m["diameter"]),
            }
            for m in class_models
        ]
        self.hw = tuple(hw)
        self.vsd_meshes = vsd_meshes
        self.reset()

    def reset(self):
        self.adi = []
        self.cmd5 = []
        self.vsd = []
        self.icp_adi = []
        self.icp_cmd5 = []
        self.icp_vsd = []
        self.n_gt = 0

    # --- vectorized pair evaluation ------------------------------------
    def _eval_pairs(self, rows, depth_test=None, want_vsd=False):
        """rows: list of (cls, pose_p, pose_g, K). Returns numpy bool arrays
        (adi_ok [R], cmd5_ok [R], vsd_ok [R] | None).

        All same-class pairs are evaluated in one padded vmapped call per
        class (sizes bucketed to powers of two so the jitted batch fns stay
        in a small compile set) — replacing the reference's per-pair host
        loops with one device round trip per (class, metric family)."""
        r = len(rows)
        adi_ok = np.zeros(r, bool)
        cmd5_ok = np.zeros(r, bool)
        vsd_ok = np.zeros(r, bool) if want_vsd else None
        by_cls: dict[int, list[int]] = {}
        for i, (c, *_rest) in enumerate(rows):
            by_cls.setdefault(c, []).append(i)
        for c, idxs in by_cls.items():
            model = self.models[c]
            m = len(idxs)
            m_pad = 1 << (m - 1).bit_length()
            pp = np.stack([np.asarray(rows[i][1], np.float32) for i in idxs])
            pg = np.stack([np.asarray(rows[i][2], np.float32) for i in idxs])
            pp, pg = _pad_rows([pp, pg], m_pad)
            dist, t_cm, r_deg = _batch_adi_cmd5(
                model["pts"], jnp.asarray(pp), jnp.asarray(pg)
            )
            dist = np.asarray(dist)[:m]
            t_cm = np.asarray(t_cm)[:m]
            r_deg = np.asarray(r_deg)[:m]
            adi_ok[idxs] = dist < 0.1 * model["diameter"]
            cmd5_ok[idxs] = (t_cm < 5) & (r_deg < 5)
            if want_vsd:
                verts, faces = self.vsd_meshes[c]
                Ks = np.stack(
                    [np.asarray(rows[i][3], np.float32) for i in idxs]
                )
                (Ks_p,) = _pad_rows([Ks], m_pad)
                err = _batch_vsd(
                    jnp.asarray(verts, jnp.float32),
                    jnp.asarray(faces, jnp.int32),
                    jnp.asarray(depth_test, jnp.float32),
                    jnp.asarray(pp), jnp.asarray(pg), jnp.asarray(Ks_p),
                    self.hw,
                    self.cfg.test.vsd_delta / 1000.0,
                    self.cfg.test.vsd_tau / 1000.0,
                )
                vsd_ok[idxs] = np.asarray(err)[:m] < self.cfg.test.vsd_thresh
        return adi_ok, cmd5_ok, vsd_ok

    @staticmethod
    def _cross_pairs(gt_insts, preds):
        """All same-class (pred, gt) combinations as _eval_pairs rows."""
        return [
            (gt["cls"], pr["pose"], gt["pose"], gt.get("K"))
            for pr in preds
            for gt in gt_insts
            if pr["cls"] == gt["cls"]
        ]

    def evaluate_image(
        self,
        gt_insts: list[dict],
        preds: list[dict],
        depth_test=None,
        preds_icp: list[dict] | None = None,
    ):
        """Reference per-image counting (ref lib/evaluators/tless_test/
        pvnet.py:252-256 and 107-125): each metric gets ONE boolean per
        image — true if ANY predicted pose matches ANY GT instance of the
        same class. `preds_icp` (ICP-refined poses, same order/classes)
        feeds the reference's icp_adi/icp_cmd5/icp_vsd variants (:251-254,
        270-272)."""
        if not gt_insts:
            return
        self.n_gt += len(gt_insts)
        do_vsd = depth_test is not None and self.vsd_meshes is not None
        rows = self._cross_pairs(gt_insts, preds)
        adi_ok, cmd5_ok, vsd_ok = (
            self._eval_pairs(rows, depth_test, do_vsd)
            if rows else (np.zeros(0, bool),) * 3
        )
        self.adi.append(bool(adi_ok.any()))
        self.cmd5.append(bool(cmd5_ok.any()))
        if do_vsd:
            self.vsd.append(bool(vsd_ok.any()) if vsd_ok is not None else False)
        if preds_icp is not None:
            rows_icp = self._cross_pairs(gt_insts, preds_icp)
            adi_i, cmd5_i, vsd_i = (
                self._eval_pairs(rows_icp, depth_test, do_vsd)
                if rows_icp else (np.zeros(0, bool),) * 3
            )
            self.icp_adi.append(bool(adi_i.any()))
            self.icp_cmd5.append(bool(cmd5_i.any()))
            if do_vsd:
                self.icp_vsd.append(
                    bool(vsd_i.any()) if vsd_i is not None else False
                )

    def evaluate_scene(
        self,
        gt_insts: list[dict],       # per-GT: {cls, pose, K}
        pred: list[dict],           # per-detection: {cls, pose, score}
        depth_test: np.ndarray | None = None,
    ):
        """Match predictions to GT instances per class (highest score first,
        each GT consumed once — the reference counts metrics per GT image,
        ref tless_test/pvnet.py:107-125)."""
        used = [False] * len(pred)
        order = sorted(range(len(pred)),
                       key=lambda i: -pred[i].get("score", 1.0))
        do_vsd = depth_test is not None and self.vsd_meshes is not None
        rows = []
        unmatched = 0
        for gt in gt_insts:
            self.n_gt += 1
            best = None
            for i in order:
                if used[i] or pred[i]["cls"] != gt["cls"]:
                    continue
                best = i
                break
            if best is None:
                unmatched += 1
                continue
            used[best] = True
            rows.append(
                (gt["cls"], pred[best]["pose"], gt["pose"], gt.get("K"))
            )
        adi_ok, cmd5_ok, vsd_ok = (
            self._eval_pairs(rows, depth_test, do_vsd)
            if rows else (np.zeros(0, bool),) * 3
        )
        self.adi += list(adi_ok) + [False] * unmatched
        self.cmd5 += list(cmd5_ok) + [False] * unmatched
        if do_vsd:
            vs = list(vsd_ok) if vsd_ok is not None else [False] * len(rows)
            self.vsd += vs + [False] * unmatched

    def summarize(self) -> dict:
        out = {
            "adi": float(np.mean(self.adi)) if self.adi else 0.0,
            "cmd5": float(np.mean(self.cmd5)) if self.cmd5 else 0.0,
        }
        if self.vsd:
            out["vsd"] = float(np.mean(self.vsd))
        if self.icp_adi:
            out["icp_adi"] = float(np.mean(self.icp_adi))
            out["icp_cmd5"] = float(np.mean(self.icp_cmd5))
        if self.icp_vsd:
            out["icp_vsd"] = float(np.mean(self.icp_vsd))
        print(" ".join(f"{k}: {v:.4f}" for k, v in out.items()))
        self.reset()
        return out


def _box_iou(a, b):
    x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
    x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def _class_iou_table(gts, preds, cls: int):
    """Per-image score-sorted detections + their IoU rows against the
    class's GTs, computed ONCE and reused across IoU thresholds (COCOeval
    computes its IoU matrix once per (image, class) the same way).

    Returns (per_image, n_gt): per_image[i] = (scores [D], ious [D, G]).
    """
    per_image = []
    n_gt = 0
    for img, dets in enumerate(preds):
        gt_boxes = [gb for gc, gb in gts[img] if gc == cls]
        n_gt += len(gt_boxes)
        cdets = sorted((d for d in dets if d[0] == cls), key=lambda d: -d[1])
        scores = np.array([d[1] for d in cdets], np.float64)
        ious = np.array(
            [[_box_iou(d[2], g) for g in gt_boxes] for d in cdets],
            np.float64,
        ).reshape(len(cdets), len(gt_boxes))
        per_image.append((scores, ious))
    return per_image, n_gt


def _ap_from_table(per_image, n_gt: int, iou_thresh: float) -> float | None:
    """101-point interpolated AP at one threshold from a precomputed table.

    COCOeval matching semantics (ref coco_eval.py evaluateImg): detections
    in score order, each matched to the highest-IoU unclaimed GT of its
    class. Returns None when the class has no GT (excluded from the mean,
    like COCOeval's -1 sentinel).
    """
    if n_gt == 0:
        return None
    records = []
    for scores, ious in per_image:
        taken = np.zeros(ious.shape[1], bool)
        for d in range(len(scores)):
            row = np.where(taken, -1.0, ious[d])
            j = int(np.argmax(row)) if row.size else -1
            hit = row.size > 0 and row[j] >= iou_thresh
            if hit:
                taken[j] = True
            records.append((float(scores[d]), hit))
    if not records:
        return 0.0
    records.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in records])
    fp = np.cumsum([not r[1] for r in records])
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1)
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        p = precision[recall >= r]
        ap += float(p.max()) if len(p) else 0.0
    return ap / 101.0


def detection_map(
    gts: list[list[tuple[int, np.ndarray]]],
    preds: list[list[tuple[int, float, np.ndarray]]],
    iou_thresholds=tuple(np.round(np.arange(0.5, 1.0, 0.05), 2)),
) -> dict:
    """COCO-style bbox mAP: per-class AP averaged over classes and over
    IoU ∈ {0.5 .. 0.95} (counterpart of the vendored COCOeval summary,
    ref lib/evaluators/tless_test/ct.py:32-79 + coco_eval.py).

    gts[i]  = [(cls, box4)] per image; preds[i] = [(cls, score, box4)].
    Returns {"map", "ap50", "ap75"}.
    """
    classes = sorted({c for g in gts for c, _ in g})
    tables = {c: _class_iou_table(gts, preds, c) for c in classes}
    per_iou = {}
    for t in iou_thresholds:
        aps = [
            a
            for a in (
                _ap_from_table(*tables[c], float(t)) for c in classes
            )
            if a is not None
        ]
        per_iou[float(t)] = float(np.mean(aps)) if aps else 0.0
    return {
        "map": float(np.mean(list(per_iou.values()))) if per_iou else 0.0,
        "ap50": per_iou.get(0.5, 0.0),
        "ap75": per_iou.get(0.75, 0.0),
    }


def detection_ap(
    gts: list[list[tuple[int, np.ndarray]]],
    preds: list[list[tuple[int, float, np.ndarray]]],
    iou_thresh: float = 0.5,
) -> float:
    """Per-class AP@iou averaged over classes with GT (see detection_map)."""
    classes = sorted({c for g in gts for c, _ in g})
    aps = [
        a
        for a in (
            _ap_from_table(*_class_iou_table(gts, preds, c), iou_thresh)
            for c in classes
        )
        if a is not None
    ]
    return float(np.mean(aps)) if aps else 0.0


@EVALUATORS.register("ct")
class DetectionEvaluator:
    """Detector-task evaluator: accumulates per-image GT/pred boxes and
    reports COCO-style mAP/AP50/AP75 (counterpart of reference
    lib/evaluators/tless_test/ct.py evaluate/summarize over the vendored
    COCOeval)."""

    def __init__(self, cfg: Config, down_ratio: int = 4,
                 score_thresh: float = 0.1):
        self.cfg = cfg
        self.down_ratio = down_ratio
        self.score_thresh = score_thresh
        self.reset()

    def reset(self):
        self.gts: list = []
        self.preds: list = []

    def evaluate(self, output: dict, batch: dict):
        """output: decoded detections in output-grid coords
        ({bboxes [B,K,4], scores, classes}); batch: loader batch whose
        meta['anns'] carry GT bbox/category_id in input pixels."""
        bboxes = np.asarray(output["bboxes"], np.float32) * self.down_ratio
        scores = np.asarray(output["scores"], np.float32)
        classes = np.asarray(output["classes"], np.int64)
        for i, meta in enumerate(batch["meta"]):
            gt = []
            for ann in meta["anns"]:
                x, y, w, h = ann["bbox"]
                gt.append((int(ann["category_id"]) - 1,
                           np.array([x, y, x + w, y + h], np.float32)))
            keep = scores[i] >= self.score_thresh
            pred = [
                (int(c), float(s), b)
                for c, s, b in zip(classes[i][keep], scores[i][keep],
                                   bboxes[i][keep])
            ]
            self.gts.append(gt)
            self.preds.append(pred)

    def summarize(self) -> dict:
        stats = detection_map(self.gts, self.preds) if self.gts else {
            "map": 0.0, "ap50": 0.0, "ap75": 0.0,
        }
        out = {
            "det_map": stats["map"],
            "det_ap50": stats["ap50"],
            "det_ap75": stats["ap75"],
            "n_images": len(self.gts),
        }
        print(" ".join(f"{k}: {v}" for k, v in out.items()))
        self.reset()
        return out


class TlessPoseEvalDriver:
    """Batch-level adapter for the two-stage pose eval: accumulates
    per-detection poses across loader batches, then matches them to GT
    instances per image (reference defers VSD the same way,
    ref tless_test/pvnet.py:258-278).

    Used with DetectionPoseDataset batches: each sample is one detection
    crop; `evaluate` records the predicted pose, `summarize` groups by
    image and runs TlessEvaluator.evaluate_scene.
    """

    def __init__(self, cfg: Config, evaluator: TlessEvaluator, coco,
                 cls_filter: int | None = None, crop_K=None,
                 match: str = "image", icp_refiners: list | None = None):
        """cls_filter: evaluate only this class index (per-object runs, the
        reference's one-config-per-object flow). crop_K(meta) -> [3,3]:
        per-detection intrinsics in the crop frame, consumed by the eval
        loop to feed the PnP stage. match: 'image' = reference per-image
        any-match counting (ref tless_test/pvnet.py:252-256); 'instance' =
        per-GT greedy matching (stricter, this repo's extension).
        icp_refiners[c]: eval.icp.ICPRefiner per class (full-frame hw) —
        when set, predicted masks are warped back to the image and each
        pose gets the reference's depth-ICP refinement (:142-157)."""
        self.cfg = cfg
        self.evaluator = evaluator
        self.coco = coco
        self.cls_filter = cls_filter
        self.crop_K = crop_K
        self.match = match
        self.icp_refiners = icp_refiners
        self.preds_by_img: dict = {}
        self._icp_calls = 0

    def evaluate(self, output: dict, batch: dict):
        poses = np.asarray(output["pose"], np.float32)
        masks = (
            np.asarray(output["mask"]) if self.icp_refiners is not None
            and "mask" in output else None
        )
        for i, meta in enumerate(batch["meta"]):
            pred = {
                "cls": int(meta["cls"]),
                "pose": poses[i],
                "score": float(meta["score"]),
            }
            if masks is not None and "crop_center" in meta:
                pred["mask_full"] = self._mask_to_image(masks[i], meta)
            self.preds_by_img.setdefault(int(batch["img_id"][i]), []).append(
                pred
            )

    def _mask_to_image(self, mask_crop: np.ndarray, meta: dict) -> np.ndarray:
        """Warp the crop-frame predicted mask back to the full image
        (ref tless_test/pvnet.py:243-245 warpAffine(seg, trans_inv))."""
        from clean_pvnet_tpu.utils.image import warp_affine

        s = mask_crop.shape[0]
        step = float(meta["crop_size"]) / s
        cx, cy = meta["crop_center"]
        # crop→image: img = (crop + 0.5)·step + (center − size/2) − 0.5
        M = np.array(
            [
                [step, 0, 0.5 * step + (cx - meta["crop_size"] / 2.0) - 0.5],
                [0, step, 0.5 * step + (cy - meta["crop_size"] / 2.0) - 0.5],
            ],
            np.float64,
        )
        return warp_affine(
            mask_crop.astype(np.uint8), M, self.evaluator.hw, interp="nearest"
        )

    def _icp_refine(self, pred: dict, depth: np.ndarray, K: np.ndarray):
        """Reference tless icp_refine (:142-157): depth masked to the
        predicted segmentation, skip behind-camera / tiny masks, two-stage
        (depth-only with loose gate, then no-depth) refinement."""
        import jax

        pose = np.asarray(pred["pose"], np.float32)
        mask = pred.get("mask_full")
        if (
            mask is None
            or not np.all(np.isfinite(pose))
            or pose[2, 3] <= 0
            or int((mask == 1).sum()) < 20
        ):
            return pred
        refiner = self.icp_refiners[pred["cls"]]
        if refiner is None:
            return pred
        masked = depth * (mask == 1)
        self._icp_calls += 1
        refined = refiner.refine_two_stage(
            pose, masked, K, jax.random.PRNGKey(self._icp_calls)
        )
        return {**pred, "pose": np.asarray(refined, np.float32)}

    def _load_depth(self, info: dict) -> np.ndarray | None:
        path = info.get("depth_path")
        if path is None:
            return None
        from PIL import Image

        depth = np.asarray(Image.open(path), np.float32)
        return depth / float(info.get("depth_scale", 10000.0))

    def summarize(self) -> dict:
        cfg = self.cfg
        want_depth = cfg.test.vsd or self.icp_refiners is not None
        for img_id in self.coco.get_img_ids():
            gt = [
                {
                    "cls": int(a["category_id"]) - 1,
                    "pose": np.asarray(a["pose"], np.float32),
                    "K": np.asarray(a["K"], np.float32),
                }
                for a in self.coco.load_anns(img_id)
                if self.cls_filter is None
                or int(a["category_id"]) - 1 == self.cls_filter
            ]
            preds = self.preds_by_img.get(img_id, [])
            depth = None
            if want_depth:
                depth = self._load_depth(self.coco.load_img(img_id))
            preds_icp = None
            if self.icp_refiners is not None and depth is not None and gt:
                K_img = gt[0]["K"]  # full-frame intrinsics (ref :218 annos[0])
                preds_icp = [self._icp_refine(p, depth, K_img) for p in preds]
            vsd_depth = depth if cfg.test.vsd else None
            if self.match == "image":
                self.evaluator.evaluate_image(
                    gt, preds, depth_test=vsd_depth, preds_icp=preds_icp
                )
            else:
                self.evaluator.evaluate_scene(
                    gt, preds, depth_test=vsd_depth
                )
        self.preds_by_img = {}
        return self.evaluator.summarize()
