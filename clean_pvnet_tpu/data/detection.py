"""Detection datasets: multi-instance scenes → CenterNet training targets.

Behavioral counterpart of the reference's detector data path
(ref lib/datasets/tless/ct.py:26-57 synthetic scene composition feeding
{ct_hm, wh} targets, lib/datasets/tless_test/pvnet.py:33-93 detection-driven
pose test set). Scenes come from COCO-style json with per-instance bbox +
pose annotations (data/synthetic.generate_multiobject_dataset or a real
T-LESS conversion).
"""

from __future__ import annotations

from typing import Any

import numpy as np
from PIL import Image

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data.augment import normalize_image
from clean_pvnet_tpu.data.coco import CocoIndex
from clean_pvnet_tpu.data.tless import make_ct_targets
from clean_pvnet_tpu.registry import DATASETS


class DetectionSceneDataset:
    """Emits {inp, ct_hm, wh, ct_ind, ct_valid} batches for the 'ct' task."""

    def __init__(self, cfg: Config, ann_file: str, split: str = "train",
                 seed: int = 0, num_classes: int | None = None,
                 max_objs: int = 32, down_ratio: int = 4):
        self.cfg = cfg
        self.split = split
        self.coco = CocoIndex(ann_file)
        self.img_ids = self.coco.get_img_ids()
        self.rng = np.random.RandomState(seed)
        self.num_classes = num_classes or max(
            (c["id"] for c in self.coco.categories), default=1
        )
        self.max_objs = max_objs
        self.down_ratio = down_ratio

    def __len__(self) -> int:
        return len(self.img_ids)

    def __getitem__(self, index_hw: tuple[int, int, int]) -> dict[str, Any]:
        index, height, width = index_hw
        img_id = self.img_ids[index]
        info = self.coco.load_img(img_id)
        anns = self.coco.load_anns(img_id)
        img = np.asarray(Image.open(info["file_name"]).convert("RGB"))

        # pad/crop to the requested static shape (scenes are rendered at a
        # fixed size; this guards mixed sources)
        h0, w0 = img.shape[:2]
        canvas = np.zeros((height, width, 3), img.dtype)
        ch, cw = min(h0, height), min(w0, width)
        canvas[:ch, :cw] = img[:ch, :cw]

        boxes, classes = [], []
        for ann in anns:
            x, y, w_box, h_box = ann["bbox"]
            boxes.append([x, y, x + w_box, y + h_box])
            classes.append(ann["category_id"] - 1)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        classes = np.asarray(classes, np.int64)

        targets = make_ct_targets(
            boxes, classes, (height, width), self.num_classes,
            down_ratio=self.down_ratio, max_objs=self.max_objs,
        )
        return {
            "inp": normalize_image(canvas),
            **targets,
            "ct_ind": targets["ct_ind"].astype(np.int32),
            "img_id": img_id,
            "meta": {"anns": anns},
        }


@DATASETS.register("TlessTrain")
@DATASETS.register("DetectionTrain")
def _tless_train(cfg: Config, ann_file: str, **kw):
    return DetectionSceneDataset(cfg, ann_file, split="train",
                                 num_classes=cfg.network.ct_num_classes, **kw)


@DATASETS.register("TlessTest")
@DATASETS.register("DetectionTest")
def _tless_test(cfg: Config, ann_file: str, **kw):
    return DetectionSceneDataset(cfg, ann_file, split="test",
                                 num_classes=cfg.network.ct_num_classes, **kw)
