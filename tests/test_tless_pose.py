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
