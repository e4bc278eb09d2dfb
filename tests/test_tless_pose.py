import numpy as np
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data.synthetic import generate_multiobject_dataset
from clean_pvnet_tpu.data.tless_pose import DetectionPoseDataset, crop_transform


@pytest.fixture(scope="module")
def scenes(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    return generate_multiobject_dataset(
        str(root), num_classes=2, n_scenes=3, max_inst=3, hw=(96, 128), seed=0
    )


class TestDetectionPoseDataset:
    def test_gt_boxes_indexed(self, scenes):
        cfg = Config().with_overrides({"test.det_gt": True})
        ds = DetectionPoseDataset(cfg, scenes["scenes_json"], crop_size=64)
        assert len(ds) >= 3
        s = ds[(0, 64, 64)]
        assert s["inp"].shape == (64, 64, 3)
        assert s["meta"]["ann"] is not None

    def test_crop_round_trip(self, scenes):
        """image→crop→image keypoint mapping is identity."""
        cfg = Config().with_overrides({"test.det_gt": True})
        ds = DetectionPoseDataset(cfg, scenes["scenes_json"], crop_size=64)
        entry = ds.index[0]
        meta = ds[(0, 64, 64)]["meta"]
        # take the GT fps_2d, map image→crop with the forward transform,
        # then back with kpt_crop_to_image
        kpt_img = np.asarray(entry["ann"]["fps_2d"], np.float64)
        M = crop_transform(meta["crop_center"], meta["crop_size"], 64)
        kpt_crop = kpt_img @ M[:, :2].T + M[:, 2]
        back = ds.kpt_crop_to_image(kpt_crop, meta)
        np.testing.assert_allclose(back, kpt_img, atol=1e-6)

    def test_crop_contains_object(self, scenes):
        cfg = Config().with_overrides({"test.det_gt": True})
        ds = DetectionPoseDataset(cfg, scenes["scenes_json"], crop_size=64)
        s = ds[(0, 64, 64)]
        # crop should have non-trivial content variance (object present)
        assert s["inp"].std() > 0.05


class TestTlessPoseTrainDataset:
    def test_compose_and_targets(self, scenes):
        import os

        from clean_pvnet_tpu.data.tless_pose import TlessPoseTrainDataset

        cfg = Config().with_overrides(
            {"cls_type": "obj_01", "train.epoch_size": 4}
        )
        ds = TlessPoseTrainDataset(cfg, scenes["scenes_json"], crop_size=64,
                                   seed=0)
        assert len(ds) == 4
        s = ds[(0, 64, 64)]
        assert s["inp"].shape == (64, 64, 3)
        assert s["mask"].shape == (64, 64)
        assert s["mask"].sum() > 0          # object visible
        assert s["kpt_2d"].shape == (9, 2)
        assert s["vertex"].shape == (64, 64, 18)
        # keypoint projection consistent with the recorded pose/K
        ann = s["meta"]["ann"]
        kpt_3d = np.concatenate(
            [np.asarray(ann["fps_3d"]), [np.asarray(ann["center_3d"])]], 0
        )
        pose = np.asarray(ann["pose"])
        K = np.asarray(ann["K"])
        cam = kpt_3d @ pose[:, :3].T + pose[:, 3]
        pix = cam @ K.T
        np.testing.assert_allclose(
            s["kpt_2d"], pix[:, :2] / pix[:, 2:], atol=1e-4
        )

    def test_digit_cls_type_resolves(self, scenes):
        from clean_pvnet_tpu.data.tless_pose import TlessPoseTrainDataset

        cfg = Config().with_overrides({"cls_type": "01"})
        ds = TlessPoseTrainDataset(cfg, scenes["scenes_json"], crop_size=64)
        assert ds.cls == "obj_01"

    def test_unknown_class_raises(self, scenes):
        from clean_pvnet_tpu.data.tless_pose import TlessPoseTrainDataset

        cfg = Config().with_overrides({"cls_type": "99"})
        with pytest.raises(FileNotFoundError):
            TlessPoseTrainDataset(cfg, scenes["scenes_json"])


class TestTlessPoseEvalDriver:
    def test_perfect_predictions_score_one(self, scenes):
        import json

        from clean_pvnet_tpu.data.coco import CocoIndex
        from clean_pvnet_tpu.eval.tless import (
            TlessEvaluator,
            TlessPoseEvalDriver,
        )
        from clean_pvnet_tpu.utils.ply import load_ply
        import os

        coco = CocoIndex(scenes["scenes_json"])
        root = os.path.dirname(scenes["scenes_json"])
        class_models = []
        for d in sorted(os.listdir(root)):
            if not d.startswith("obj_"):
                continue
            ply = load_ply(os.path.join(root, d, f"{d}.ply"))
            pts = ply["pts"]
            dia = float(np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1).max()))
            class_models.append({"pts": pts, "diameter": dia})
        cfg = Config()
        ev = TlessEvaluator(cfg, class_models, (96, 128))
        driver = TlessPoseEvalDriver(cfg, ev, coco)
        # feed GT poses as "predictions" batch-style
        for img_id in coco.get_img_ids():
            for a in coco.load_anns(img_id):
                driver.evaluate(
                    {"pose": np.asarray([a["pose"]], np.float32)},
                    {
                        "img_id": [img_id],
                        "meta": [{"cls": a["category_id"] - 1, "score": 1.0}],
                    },
                )
        m = driver.summarize()
        assert m["adi"] == 1.0
        assert m["cmd5"] == 1.0
