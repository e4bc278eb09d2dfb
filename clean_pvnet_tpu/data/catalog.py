"""Dataset catalog: names → annotation/data paths.

Behavioral counterpart of reference lib/datasets/dataset_catalog.py:4-92:
a static registry keyed by dataset name, with paths templated on the
object class. Covers the reference's families (LINEMOD train/test/occ,
Truncation-LINEMOD, T-LESS variants, YCB, custom, synthetic) so configs
can say `train.dataset: LinemodTrain` and resolve everything else.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class CatalogEntry:
    id: str              # dataset family → dataset class registry key
    ann_file: str
    data_root: str
    split: str


def _e(id, ann, root, split):
    return CatalogEntry(id=id, ann_file=ann, data_root=root, split=split)


class DatasetCatalog:
    """Path templates mirror the reference's (ref dataset_catalog.py:5-92),
    with {cls} substituted from cfg.cls_type and {data} from cfg.data_root."""

    TEMPLATES = {
        # synthetic (this repo's hermetic stand-in)
        "SyntheticTrain": _e("LinemodTrain", "{data}/{cls}_train.json", "{data}/{cls}", "train"),
        "SyntheticTest": _e("LinemodTest", "{data}/{cls}_test.json", "{data}/{cls}", "test"),
        # LINEMOD (ref :9-23)
        "LinemodTrain": _e("LinemodTrain", "{data}/linemod/{cls}/train.json", "{data}/linemod/{cls}", "train"),
        "LinemodTest": _e("LinemodTest", "{data}/linemod/{cls}/test.json", "{data}/linemod/{cls}", "test"),
        "LinemodOccTest": _e("LinemodTest", "{data}/linemod/{cls}/occ.json", "{data}/occlusion_linemod", "test"),
        "TruncationLinemodTest": _e("LinemodTest", "{data}/truncation_linemod/{cls}.json", "{data}/truncation_linemod", "test"),
        # T-LESS (ref :25-68)
        "TlessTrain": _e("TlessTrain", "{data}/tless/renders/assets/asset.json", "{data}/tless/renders", "train"),
        "TlessTest": _e("TlessTest", "{data}/tless/test_primesense/test.json", "{data}/tless/test_primesense", "test"),
        "TlessMini": _e("TlessTest", "{data}/tless/test_primesense/test.json", "{data}/tless/test_primesense", "mini"),
        "TlessPoseTrain": _e("TlessTrain", "{data}/tless/renders/assets/asset.json", "{data}/tless/renders", "train"),
        "TlessPoseMini": _e("TlessTest", "{data}/tless/obj_pose.json", "{data}/tless/test_primesense", "mini"),
        "TlessPoseTest": _e("TlessTest", "{data}/tless/obj_pose.json", "{data}/tless/test_primesense", "test"),
        "TlessAgTrain": _e("TlessTrain", "{data}/tless/t-less-mix/train.json", "{data}/tless/t-less-mix", "train"),

        # generated multi-object scenes (run.py --type tless) for detector training
        "DetectionTrain": _e("DetectionTrain", "{data}/tless_scenes/scenes.json", "{data}/tless_scenes", "train"),
        "DetectionTest": _e("DetectionTest", "{data}/tless_scenes/scenes.json", "{data}/tless_scenes", "test"),
        # YCB (ref :70-75; partial in the reference too)
        "YcbTrain": _e("LinemodTrain", "{data}/ycb/posedb/{cls}_train.json", "{data}/ycb", "train"),
        "YcbTest": _e("LinemodTest", "{data}/ycb/posedb/{cls}_test.json", "{data}/ycb", "test"),
        # custom (ref :84-90)
        "CustomTrain": _e("CustomTrain", "{data}/custom/train.json", "{data}/custom", "train"),
        "CustomTest": _e("CustomTest", "{data}/custom/train.json", "{data}/custom", "test"),
    }

    @classmethod
    def get(cls, name: str, data_root: str = "data", cls_type: str = "cat") -> CatalogEntry:
        if name not in cls.TEMPLATES:
            raise KeyError(f"unknown dataset {name!r}; have {sorted(cls.TEMPLATES)}")
        t = cls.TEMPLATES[name]
        sub = lambda s: s.format(data=data_root, cls=cls_type)
        return CatalogEntry(
            id=t.id, ann_file=sub(t.ann_file), data_root=sub(t.data_root),
            split=t.split,
        )
