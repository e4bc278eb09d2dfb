"""Minimal COCO-style annotation index.

The reference depends on pycocotools for json indexing and RLE masks
(ref lib/datasets/linemod/pvnet.py:22-38); this environment has neither, and
the pose annotations the reference's converters emit (fps_2d/center_2d/K/
pose/mask_path, ref lib/datasets/linemod/linemod_to_coco.py:260-308) don't
need RLE at all — masks are stored as image paths. This is a dependency-free
index over the same schema, so datasets converted for the reference load
unchanged.
"""

from __future__ import annotations

import json
from typing import Any


class CocoIndex:
    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.images = {img["id"]: img for img in data.get("images", [])}
        self.anns: dict[int, list[dict[str, Any]]] = {}
        for ann in data.get("annotations", []):
            self.anns.setdefault(ann["image_id"], []).append(ann)
        self.categories = data.get("categories", [])

    def get_img_ids(self) -> list[int]:
        return sorted(self.images)

    def load_img(self, img_id: int) -> dict:
        return self.images[img_id]

    def load_anns(self, img_id: int) -> list[dict]:
        return self.anns.get(img_id, [])
