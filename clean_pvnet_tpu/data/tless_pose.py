"""Detection-driven pose test dataset (T-LESS two-stage offline flow).

Behavioral counterpart of reference lib/datasets/tless_test/pvnet.py:33-93:
for multi-instance evaluation the detector runs first and writes a results
json (ref lib/evaluators/tless_test/ct.py:69-71); this dataset then indexes
*detections* — each box is cropped from the full frame and warped to a
fixed square patch, and PVNet's keypoints are mapped back to image space
with the recorded crop transform (ref tless_test/pvnet.py:208-256 inverse
affine). With `det_gt=True` the GT boxes stand in for detections
(ref cfg.test.det_gt).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
from PIL import Image

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data.augment import normalize_image
from clean_pvnet_tpu.data.coco import CocoIndex
from clean_pvnet_tpu.registry import DATASETS
from clean_pvnet_tpu.utils.image import warp_affine


def crop_transform(center, size, out_s):
    """2×3 affine mapping image→crop pixels (pixel centers at integers),
    matching models/cascade.crop_bilinear's sampling so host and on-device
    crops are interchangeable."""
    step = size / out_s
    # crop_px = (img_px - (center - size/2) + 0.5 - 0.5*step) / step
    s = 1.0 / step
    tx = -(center[0] - size / 2.0 - 0.5) * s - 0.5
    ty = -(center[1] - size / 2.0 - 0.5) * s - 0.5
    return np.array([[s, 0, tx], [0, s, ty]], np.float64)


class DetectionPoseDataset:
    """Indexes (image, detection) pairs; emits fixed-size crops."""

    def __init__(
        self,
        cfg: Config,
        ann_file: str,
        det_file: str | None = None,
        crop_size: int = 128,
        scale_ratio: float = 1.8,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.coco = CocoIndex(ann_file)
        self.crop_size = crop_size
        self.scale_ratio = scale_ratio

        self.index: list[dict] = []
        if det_file is None or cfg.test.det_gt:
            # GT boxes as detections (ref test.det_gt path)
            for img_id in self.coco.get_img_ids():
                for ann in self.coco.load_anns(img_id):
                    x, y, w, h = ann["bbox"]
                    self.index.append(
                        {
                            "image_id": img_id,
                            "cls": ann["category_id"] - 1,
                            "box": [x, y, x + w, y + h],
                            "score": 1.0,
                            "ann": ann,
                        }
                    )
        else:
            with open(det_file) as f:
                dets = json.load(f)
            for det in dets:
                x, y, w, h = det["bbox"]
                self.index.append(
                    {
                        "image_id": det["image_id"],
                        "cls": det["category_id"] - 1,
                        "box": [x, y, x + w, y + h],
                        "score": det.get("score", 1.0),
                        "ann": None,
                    }
                )

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(self, index_hw) -> dict[str, Any]:
        index = index_hw[0] if isinstance(index_hw, tuple) else index_hw
        entry = self.index[index]
        info = self.coco.load_img(entry["image_id"])
        img = np.asarray(Image.open(info["file_name"]).convert("RGB"))

        x1, y1, x2, y2 = entry["box"]
        center = ((x1 + x2) / 2.0, (y1 + y2) / 2.0)
        size = max(x2 - x1, y2 - y1) * self.scale_ratio
        size = max(size, 8.0)
        M = crop_transform(center, size, self.crop_size)
        crop = warp_affine(img, M, (self.crop_size, self.crop_size))

        return {
            "inp": normalize_image(crop),
            "img_id": entry["image_id"],
            "meta": {
                "ann": entry["ann"],
                "cls": entry["cls"],
                "score": entry["score"],
                "box": entry["box"],
                "crop_center": center,
                "crop_size": size,
            },
        }

    def kpt_crop_to_image(self, kpt_crop: np.ndarray, meta: dict) -> np.ndarray:
        """Inverse of the crop transform (ref tless_test/pvnet.py:208-256)."""
        step = meta["crop_size"] / self.crop_size
        cx, cy = meta["crop_center"]
        corner = np.array([cx - meta["crop_size"] / 2.0,
                           cy - meta["crop_size"] / 2.0])
        return (kpt_crop + 0.5) * step + corner - 0.5


@DATASETS.register("TlessPoseTest")
def _tless_pose_test(cfg: Config, ann_file: str, det_file=None, **kw):
    return DetectionPoseDataset(cfg, ann_file, det_file=det_file, **kw)
