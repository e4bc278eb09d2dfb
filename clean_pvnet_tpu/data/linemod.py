"""LINEMOD/custom pose dataset (COCO-json driven).

Behavioral counterpart of reference lib/datasets/linemod/pvnet.py:14-78 and
its near-copy custom/pvnet.py: read image/mask/keypoints from the converter
json, apply train-time geometric+photometric augmentation, emit the
per-pixel vertex-field target. Samples are returned as plain numpy dicts
(NHWC, float32) ready for batching — the loader owns shapes and batching.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
from PIL import Image

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data.augment import (
    augment_pvnet,
    normalize_image,
    photometric_train,
)
from clean_pvnet_tpu.data.coco import CocoIndex
from clean_pvnet_tpu.geometry.vertex import compute_vertex_field_np
from clean_pvnet_tpu.registry import DATASETS


def read_mask(path: str, ann_type: str, cls_idx: int = 1) -> np.ndarray:
    """Mask decode by annotation type (ref pvnet_data_utils.py:57-67)."""
    arr = np.asarray(Image.open(path))
    if ann_type == "real":
        if arr.ndim == 3:
            return (arr[..., 0] != 0).astype(np.uint8)
        return (arr != 0).astype(np.uint8)
    if ann_type == "fuse":
        return (arr == cls_idx).astype(np.uint8)
    return arr.astype(np.uint8)  # 'render'


class LinemodDataset:
    def __init__(self, cfg: Config, ann_file: str, split: str = "train",
                 seed: int = 0, host_vertex: bool = True):
        """host_vertex=False skips the host-side vertex-field target; the
        train step then derives it on-device from (mask, kpt_2d) — the
        TPU-native layout (see train/trainer.py), cutting per-sample host
        work and host→device bytes by ~10×."""
        self.cfg = cfg
        self.split = split
        self.coco = CocoIndex(ann_file)
        self.img_ids = self.coco.get_img_ids()
        self.rng = np.random.RandomState(seed)
        self.host_vertex = host_vertex
        # decoded-image cache: pose datasets are small (LINEMOD ≈ 1-2k
        # frames/class) and epochs are many, so caching decoded rgb+mask
        # removes PNG decode from the per-epoch path entirely
        self.cache_images = True
        self._cache: dict[int, tuple] = {}

    def __len__(self) -> int:
        return len(self.img_ids)

    def read(self, img_id: int):
        if self.cache_images and img_id in self._cache:
            img, kpt_2d, mask, ann = self._cache[img_id]
            return img, kpt_2d.copy(), mask.copy(), ann
        info = self.coco.load_img(img_id)
        ann = self.coco.load_anns(img_id)[0]
        img = np.asarray(Image.open(info["file_name"]).convert("RGB"))
        kpt_2d = np.concatenate(
            [np.asarray(ann["fps_2d"]), [np.asarray(ann["center_2d"])]], 0
        ).astype(np.float32)
        mask = read_mask(ann["mask_path"], ann.get("type", "real"),
                         cls_idx=ann.get("cls_idx", 1))
        if self.cache_images:
            self._cache[img_id] = (img, kpt_2d, mask, ann)
            return img, kpt_2d.copy(), mask.copy(), ann
        return img, kpt_2d, mask, ann

    def __getitem__(self, index_hw: tuple[int, int, int]) -> dict[str, Any]:
        """index_hw = (index, height, width): the target shape comes from the
        bucket sampler, mirroring ImageSizeBatchSampler's (idx, h, w) tuples
        (ref lib/datasets/samplers.py:27-37)."""
        index, height, width = index_hw
        img_id = self.img_ids[index]
        img, kpt_2d, mask, ann = self.read(img_id)

        if self.split == "train" and self.cfg.train.device_augment:
            # raw path: augmentation runs on-device in the train step
            # (data/augment_device.py); ship the cached frame as-is
            if (height, width) != img.shape[:2]:
                raise ValueError(
                    "train.device_augment requires the bucket resolution to "
                    f"equal the source frames: bucket {(height, width)} vs "
                    f"frame {img.shape[:2]}. Use a single image_buckets "
                    "entry matching the dataset, or host augmentation."
                )
            return {
                "inp_u8": np.ascontiguousarray(img),
                "mask": mask.astype(np.uint8),
                "kpt_2d": kpt_2d.astype(np.float32),
                "img_id": img_id,
                "meta": {"ann": ann},
            }

        if self.split == "train":
            img, mask, kpt_2d = augment_pvnet(
                img, mask, kpt_2d, height, width, self.cfg.train, self.rng
            )
            img = photometric_train(img, self.rng)

        inp = normalize_image(img)
        out = {
            "inp": inp,
            "mask": mask.astype(np.int32),
            "kpt_2d": kpt_2d.astype(np.float32),
            "img_id": img_id,
            "meta": {"ann": ann},
        }
        if self.host_vertex:
            out["vertex"] = compute_vertex_field_np(mask, kpt_2d)
        return out


@DATASETS.register("LinemodTrain")
def _linemod_train(cfg: Config, ann_file: str, **kw):
    return LinemodDataset(cfg, ann_file, split="train", **kw)


@DATASETS.register("LinemodTest")
def _linemod_test(cfg: Config, ann_file: str, **kw):
    return LinemodDataset(cfg, ann_file, split="test", **kw)


@DATASETS.register("CustomTrain")
def _custom_train(cfg: Config, ann_file: str, **kw):
    return LinemodDataset(cfg, ann_file, split="train", **kw)


@DATASETS.register("CustomTest")
def _custom_test(cfg: Config, ann_file: str, **kw):
    return LinemodDataset(cfg, ann_file, split="test", **kw)
