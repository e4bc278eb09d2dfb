"""SIXD/BOP toolkit surface: score aggregation, pose matching, scene IO.

Counterpart of the remaining breadth of the reference's vendored pysixd
toolkit (ref lib/utils/pysixd/{score.py,pose_matching.py,misc.py,inout.py})
that the core evaluators (eval/metrics.py, eval/vsd.py, eval/tless.py)
don't already cover. These are host-side dataset-prep / result-reporting
utilities, so they are plain numpy — the on-device counterparts of the
error functions live in eval/metrics.py and eval/vsd.py.

Re-design vs the reference: the per-estimate Python loops of
`match_poses` (ref pose_matching.py:4-40) and the mutable-list AP sweep
(ref score.py:6-38) are vectorized; the BOP/SIXD yaml scene IO
(ref inout.py:75-121) keeps the same on-disk schema (`cam_K`,
`cam_R_m2c`, `cam_t_m2c`, `obj_bb` keys, flat lists) so files written
here are readable by BOP tooling and vice versa.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# score aggregation (ref lib/utils/pysixd/score.py:6-38)


def voc_ap(recall, precision) -> float:
    """PASCAL VOC (2010+) Average Precision: area under the monotonically
    decreasing precision envelope over recall. Exact (piecewise-constant)
    integration, like the reference; the envelope is a reversed cummax
    instead of the reference's backward Python loop."""
    order = np.argsort(recall)
    mrec = np.concatenate(([0.0], np.asarray(recall, np.float64)[order], [1.0]))
    mpre = np.concatenate(([0.0], np.asarray(precision, np.float64)[order], [0.0]))
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
    idx = np.nonzero(mrec[1:] != mrec[:-1])[0] + 1
    return float(np.sum((mrec[idx] - mrec[idx - 1]) * mpre[idx]))


def precision_recall(scores, is_tp, n_gt: int):
    """Score-ranked precision/recall curve for `voc_ap`: estimates sorted by
    decreasing confidence, cumulative TP/FP counts."""
    order = np.argsort(-np.asarray(scores, np.float64))
    tp = np.asarray(is_tp, bool)[order]
    tp_c = np.cumsum(tp).astype(np.float64)
    fp_c = np.cumsum(~tp).astype(np.float64)
    recall = tp_c / max(n_gt, 1)
    precision = tp_c / np.maximum(tp_c + fp_c, 1e-12)
    return recall, precision


# ---------------------------------------------------------------------------
# pose matching (ref lib/utils/pysixd/pose_matching.py:4-40)


def match_poses(errs, error_thresh: float, max_ests_count: int = -1,
                gt_valid_mask=None):
    """Greedy estimate↔GT matching for SIXD-style evaluation.

    `errs` is a list of {est_id, score, errors: {gt_id: error}}. Estimates
    are visited in decreasing score order (optionally only the top
    `max_ests_count`); each takes its lowest-error unmatched valid GT, and
    the pair counts as a match when that error < `error_thresh`. Returns
    [{est_id, gt_id, score, error, error_norm}] like the reference.
    """
    order = np.argsort(-np.asarray([e["score"] for e in errs], np.float64),
                       kind="stable")
    if max_ests_count > 0:
        order = order[:max_ests_count]
    matches = []
    gt_matched: set = set()
    for i in order:
        e = errs[i]
        best_gt, best_err = -1, float("inf")
        for gt_id, error in e["errors"].items():
            valid = gt_valid_mask is None or gt_valid_mask[gt_id]
            if valid and gt_id not in gt_matched and error < best_err:
                best_gt, best_err = gt_id, error
        if best_err < error_thresh:
            gt_matched.add(best_gt)
            matches.append({
                "est_id": e["est_id"], "gt_id": best_gt, "score": e["score"],
                "error": best_err, "error_norm": best_err / float(error_thresh),
            })
    return matches


# ---------------------------------------------------------------------------
# geometry misc (ref lib/utils/pysixd/misc.py:27-108)


def project_pts(pts, K, R, t):
    """[N,3] model points → [N,2] pixels under K[R|t]."""
    cam = np.asarray(pts) @ np.asarray(R).T + np.asarray(t).reshape(1, 3)
    uv = cam @ np.asarray(K).T
    return uv[:, :2] / uv[:, 2:]


def rgbd_to_point_cloud(K, depth, rgb=None):
    """Back-project nonzero depth to camera-frame points.
    Returns (pts [N,3], colors [N,3] | None, pix [N,2] (u,v))."""
    depth = np.asarray(depth)
    vs, us = np.nonzero(depth)
    zs = depth[vs, us].astype(np.float64)
    xs = (us - K[0, 2]) * zs / float(K[0, 0])
    ys = (vs - K[1, 2]) * zs / float(K[1, 1])
    pts = np.stack([xs, ys, zs], -1)
    colors = rgb[vs, us, :] if rgb is not None else None
    return pts, colors, np.stack([us, vs], -1)


def calc_2d_bbox(xs, ys, im_size=None, clip: bool = False):
    """[x, y, w, h] of a point set; optionally clipped to im_size (W, H)."""
    x0, y0 = float(np.min(xs)), float(np.min(ys))
    x1, y1 = float(np.max(xs)), float(np.max(ys))
    if clip:
        assert im_size is not None
        x0 = min(max(x0, 0), im_size[0] - 1)
        y0 = min(max(y0, 0), im_size[1] - 1)
        x1 = min(max(x1, 0), im_size[0] - 1)
        y1 = min(max(y1, 0), im_size[1] - 1)
    return [x0, y0, x1 - x0, y1 - y0]


def calc_pose_2d_bbox(model_pts, im_size, K, R, t):
    """Bbox of the projected model under a pose (ref misc.py:91-94)."""
    uv = np.round(project_pts(model_pts, K, R, t)).astype(np.int64)
    return calc_2d_bbox(uv[:, 0], uv[:, 1], im_size)


# ---------------------------------------------------------------------------
# SIXD/BOP scene yaml IO (ref lib/utils/pysixd/inout.py:18-175)


def _yaml():
    import yaml

    return yaml


def load_yaml(path):
    with open(path) as f:
        return _yaml().safe_load(f)


def save_yaml(path, content):
    with open(path, "w") as f:
        _yaml().safe_dump(content, f, width=10000)


def load_info(path):
    """Per-image camera info: reshapes cam_K → [3,3], cam_R_w2c → [3,3],
    cam_t_w2c → [3,1] (ref inout.py:75-86)."""
    info = load_yaml(path)
    for eid in info:
        d = info[eid]
        if "cam_K" in d:
            d["cam_K"] = np.asarray(d["cam_K"], np.float64).reshape(3, 3)
        if "cam_R_w2c" in d:
            d["cam_R_w2c"] = np.asarray(d["cam_R_w2c"], np.float64).reshape(3, 3)
        if "cam_t_w2c" in d:
            d["cam_t_w2c"] = np.asarray(d["cam_t_w2c"], np.float64).reshape(3, 1)
    return info


def save_info(path, info):
    out = {}
    for im_id, d in info.items():
        d = dict(d)
        for k in ("cam_K", "cam_R_w2c", "cam_t_w2c"):
            if k in d:
                d[k] = np.asarray(d[k]).flatten().tolist()
        out[im_id] = d
    save_yaml(path, out)


def load_gt(path):
    """Per-image GT pose lists: reshapes cam_R_m2c → [3,3], cam_t_m2c →
    [3,1] (ref inout.py:99-109)."""
    gts = load_yaml(path)
    for _, gts_im in gts.items():
        for gt in gts_im:
            if "cam_R_m2c" in gt:
                gt["cam_R_m2c"] = np.asarray(
                    gt["cam_R_m2c"], np.float64).reshape(3, 3)
            if "cam_t_m2c" in gt:
                gt["cam_t_m2c"] = np.asarray(
                    gt["cam_t_m2c"], np.float64).reshape(3, 1)
    return gts


def save_gt(path, gts):
    out = {}
    for im_id, gts_im in gts.items():
        rows = []
        for gt in gts_im:
            gt = dict(gt)
            for k in ("cam_R_m2c", "cam_t_m2c"):
                if k in gt:
                    gt[k] = np.asarray(gt[k]).flatten().tolist()
            if "obj_bb" in gt:
                gt["obj_bb"] = [int(x) for x in gt["obj_bb"]]
            rows.append(gt)
        out[im_id] = rows
    save_yaml(path, out)


def save_results_sixd17(path, res, run_time: float = -1.0):
    """SIXD 2017 result format: run_time header + per-estimate rows with
    row-major R, t in the reference's mm convention left to the caller
    (ref inout.py:145-155)."""
    lines = [f"run_time: {run_time}", "ests:"]
    for e in res.get("ests", []):
        r = np.asarray(e["R"]).flatten().tolist()
        t = np.asarray(e["t"]).flatten().tolist()
        lines.append(
            f"- {{score: {float(e['score']):.8f}, "
            f"R: {r}, t: {t}}}"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_results_sixd17(path):
    """Inverse of `save_results_sixd17` (ref inout.py:123-143)."""
    raw = load_yaml(path)
    res = {"run_time": raw.get("run_time", -1.0), "ests": []}
    for e in raw.get("ests") or []:
        res["ests"].append({
            "score": float(e["score"]),
            "R": np.asarray(e["R"], np.float64).reshape(3, 3),
            "t": np.asarray(e["t"], np.float64).reshape(3, 1),
        })
    return res


def load_errors(path):
    """Per-estimate error records (ref inout.py:157-160): normalizes the
    per-GT error dicts' keys to int."""
    errs = load_yaml(path)
    for e in errs:
        if "errors" in e:
            e["errors"] = {int(k): float(v) for k, v in e["errors"].items()}
    return errs


def save_errors(path, errors):
    out = []
    for e in errors:
        e = dict(e)
        if "errors" in e:
            e["errors"] = {int(k): float(v) for k, v in e["errors"].items()}
        out.append(e)
    save_yaml(path, out)
