"""Analyzer layer: network-output inspection tools.

Counterpart of reference lib/analyzers/make_analyzer.py:5-9 (the reference
ships the factory with no analyzers registered; run.py:129-150 would load
them). Here the factory exists AND a default pvnet analyzer is provided:
it summarizes seg confidence, vertex-field norm statistics, and voting
inlier ratios — the quantities used when debugging pose failures.
"""

from __future__ import annotations

import numpy as np

from clean_pvnet_tpu.registry import Registry

ANALYZERS = Registry("analyzer")


def make_analyzer(cfg, **kw):
    return ANALYZERS.build(cfg.task, cfg, **kw)


@ANALYZERS.register("pvnet")
class PVNetAnalyzer:
    def __init__(self, cfg):
        self.cfg = cfg

    def analyze(self, output: dict, batch: dict) -> dict:
        seg = np.asarray(output["seg"])  # [B,H,W,C] logits
        vertex = np.asarray(output["vertex"])
        prob = np.exp(seg - seg.max(-1, keepdims=True))
        prob = prob / prob.sum(-1, keepdims=True)
        fg = prob[..., 1] > 0.5
        b, h, w, c = vertex.shape
        norms = np.linalg.norm(vertex.reshape(b, h, w, c // 2, 2), axis=-1)
        stats = {
            "fg_fraction": float(fg.mean()),
            "fg_confidence": float(prob[..., 1][fg].mean()) if fg.any() else 0.0,
            "vertex_norm_fg_mean": float(norms[fg].mean()) if fg.any() else 0.0,
            "vertex_norm_fg_std": float(norms[fg].std()) if fg.any() else 0.0,
        }
        if "inlier_ratio" in output:
            stats["inlier_ratio_mean"] = float(np.mean(np.asarray(output["inlier_ratio"])))
        if "mask" in output and "mask" in batch:
            pred = np.asarray(output["mask"]) > 0
            gt = np.asarray(batch["mask"]) > 0
            inter = (pred & gt).sum()
            union = (pred | gt).sum()
            stats["mask_iou"] = float(inter / max(union, 1))
        return stats
