import json

import numpy as np
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data.tless import (
    draw_gaussian,
    gaussian_radius,
    make_ct_targets,
    paste_sprite,
    rectify_symmetric_rotation,
    visible_ratio,
)
from clean_pvnet_tpu.data.synthetic import generate_multiobject_dataset
from clean_pvnet_tpu.eval.tless import TlessEvaluator, detection_ap
from clean_pvnet_tpu.geometry.transforms import angle_axis_to_matrix

import jax.numpy as jnp


class TestCtTargets:
    def test_heatmap_peaks_at_centers(self):
        boxes = np.array([[40, 40, 80, 80], [100, 20, 140, 60]], np.float32)
        classes = np.array([0, 1])
        t = make_ct_targets(boxes, classes, (160, 160), num_classes=2)
        assert t["ct_hm"].shape == (40, 40, 2)
        assert t["ct_hm"][15, 15, 0] == 1.0
        assert t["ct_hm"][10, 30, 1] == 1.0
        assert t["ct_valid"][:2].all()
        np.testing.assert_allclose(t["wh"][0], [10, 10])
        assert t["ct_ind"][0] == 15 * 40 + 15

    def test_gaussian_radius_positive(self):
        assert gaussian_radius((10, 10)) > 0
        assert gaussian_radius((1, 1)) >= 0

    def test_draw_gaussian_clipped_at_border(self):
        hm = np.zeros((8, 8), np.float32)
        draw_gaussian(hm, (0, 0), 3)
        assert hm[0, 0] == 1.0
        assert np.isfinite(hm).all()


class TestSymmetry:
    def test_z_rotation_canonicalized(self):
        # two poses differing only by a rotation about object z must rectify
        # to (nearly) the same pose
        base = np.asarray(
            angle_axis_to_matrix(jnp.asarray([0.4, -0.2, 0.1]))
        )
        t = np.array([[0.0], [0.0], [0.6]])
        thetas = [0.0, 0.7, 2.1, -1.3]
        rectified = []
        for th in thetas:
            c, s = np.cos(th), np.sin(th)
            Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            pose = np.concatenate([base @ Rz, t], -1).astype(np.float32)
            rectified.append(rectify_symmetric_rotation(pose))
        for r in rectified[1:]:
            np.testing.assert_allclose(r, rectified[0], atol=1e-5)

    def test_non_symmetric_passthrough(self):
        pose = np.concatenate([np.eye(3), np.zeros((3, 1))], -1)
        out = rectify_symmetric_rotation(pose, sym="none")
        np.testing.assert_array_equal(out, pose)


class TestBackgrounds:
    def test_real_background_dir(self, rng, tmp_path):
        from PIL import Image

        from clean_pvnet_tpu.data.tless import sample_background

        # two small "photos"; the sampler must crop/resize to the target hw
        for i in range(2):
            arr = (rng.rand(40 + i * 30, 60 + i * 20, 3) * 255).astype("uint8")
            Image.fromarray(arr).save(tmp_path / f"bg{i}.jpg")
        bg = sample_background(rng, (64, 96), str(tmp_path))
        assert bg.shape == (64, 96, 3)
        assert bg.dtype == np.float32
        assert 0.0 <= bg.min() and bg.max() <= 1.0

    def test_fallback_to_procedural(self, rng, tmp_path):
        from clean_pvnet_tpu.data.tless import sample_background

        empty = tmp_path / "empty"
        empty.mkdir()
        for bg_dir in (None, str(empty)):
            bg = sample_background(rng, (32, 48), bg_dir)
            assert bg.shape == (32, 48, 3)

    def test_multiobject_dataset_accepts_bg_dir(self, rng, tmp_path):
        from PIL import Image

        from clean_pvnet_tpu.data.synthetic import generate_multiobject_dataset

        arr = (rng.rand(200, 240, 3) * 255).astype("uint8")
        (tmp_path / "bgs").mkdir()
        Image.fromarray(arr).save(tmp_path / "bgs" / "photo.png")
        meta = generate_multiobject_dataset(
            str(tmp_path / "scenes"), num_classes=1, n_scenes=2, max_inst=1,
            hw=(96, 128), bg_dir=str(tmp_path / "bgs"),
        )
        import json as _json

        with open(meta["scenes_json"]) as f:
            assert len(_json.load(f)["images"]) == 2


class TestPaste:
    def test_occlusion_bookkeeping(self):
        scene = np.zeros((20, 20, 3), np.float32)
        seg = np.zeros((20, 20), np.int32)
        m = np.ones((8, 8), np.uint8)
        rgb = np.ones((8, 8, 3), np.float32)
        paste_sprite(scene, seg, rgb, m, (2, 2), 1)
        paste_sprite(scene, seg, rgb * 0.5, m, (6, 6), 2)
        assert visible_ratio(seg, 2, 64) == 1.0
        r1 = visible_ratio(seg, 1, 64)
        assert 0.4 < r1 < 0.8  # partially occluded

    def test_out_of_frame_paste(self):
        scene = np.zeros((10, 10, 3), np.float32)
        seg = np.zeros((10, 10), np.int32)
        m = np.ones((6, 6), np.uint8)
        rgb = np.ones((6, 6, 3), np.float32)
        paste_sprite(scene, seg, rgb, m, (-3, 8), 1)
        assert (seg == 1).sum() == 3 * 2


class TestMultiObjectScenes:
    def test_generator_schema(self, tmp_path):
        meta = generate_multiobject_dataset(
            str(tmp_path), num_classes=2, n_scenes=3, max_inst=3, hw=(96, 128),
            seed=0,
        )
        with open(meta["scenes_json"]) as f:
            data = json.load(f)
        assert len(data["images"]) == 3
        assert len(data["categories"]) == 2
        assert len(data["annotations"]) >= 3
        ann = data["annotations"][0]
        for key in ("bbox", "pose", "K", "fps_2d", "category_id", "inst_id"):
            assert key in ann


class TestTlessEvaluator:
    def _models(self, rng):
        pts = rng.randn(64, 3).astype(np.float32) * 0.03
        return [{"pts": pts, "diameter": 0.1}, {"pts": pts * 1.2, "diameter": 0.12}]

    def test_perfect_predictions(self, rng):
        cfg = Config()
        ev = TlessEvaluator(cfg, self._models(rng), (96, 128))
        pose = np.concatenate([np.eye(3), [[0], [0], [0.6]]], -1).astype(np.float32)
        gts = [{"cls": 0, "pose": pose, "K": np.eye(3)}]
        preds = [{"cls": 0, "pose": pose, "score": 0.9}]
        ev.evaluate_scene(gts, preds)
        m = ev.summarize()
        assert m["adi"] == 1.0 and m["cmd5"] == 1.0

    def test_missing_detection_counts_against(self, rng):
        cfg = Config()
        ev = TlessEvaluator(cfg, self._models(rng), (96, 128))
        pose = np.concatenate([np.eye(3), [[0], [0], [0.6]]], -1).astype(np.float32)
        ev.evaluate_scene([{"cls": 1, "pose": pose, "K": np.eye(3)}], [])
        m = ev.summarize()
        assert m["adi"] == 0.0

    def test_class_mismatch_not_matched(self, rng):
        cfg = Config()
        ev = TlessEvaluator(cfg, self._models(rng), (96, 128))
        pose = np.concatenate([np.eye(3), [[0], [0], [0.6]]], -1).astype(np.float32)
        ev.evaluate_scene(
            [{"cls": 0, "pose": pose, "K": np.eye(3)}],
            [{"cls": 1, "pose": pose, "score": 0.9}],
        )
        m = ev.summarize()
        assert m["adi"] == 0.0


class TestDetectionAP:
    def test_perfect(self):
        box = np.array([10, 10, 30, 30], np.float64)
        ap = detection_ap([[(0, box)]], [[(0, 0.9, box)]])
        assert ap > 0.99

    def test_wrong_location_zero(self):
        gt = np.array([10, 10, 30, 30], np.float64)
        bad = np.array([50, 50, 70, 70], np.float64)
        ap = detection_ap([[(0, gt)]], [[(0, 0.9, bad)]])
        assert ap == 0.0

    def test_partial(self):
        box = np.array([10, 10, 30, 30], np.float64)
        gts = [[(0, box)], [(0, box)]]
        preds = [[(0, 0.9, box)], [(0, 0.8, np.array([50, 50, 70, 70.0]))]]
        ap = detection_ap(gts, preds)
        assert 0.3 < ap < 0.7

    def test_per_class_average(self):
        # class 0 perfect, class 1 missed → mean 0.5 (pooled would differ)
        b0 = np.array([10, 10, 30, 30], np.float64)
        b1 = np.array([50, 50, 70, 70], np.float64)
        gts = [[(0, b0), (1, b1)]]
        preds = [[(0, 0.9, b0)]]
        ap = detection_ap(gts, preds)
        assert abs(ap - 0.5) < 0.01

    def test_best_iou_matching(self):
        # two overlapping GTs; one detection sits closer to the second —
        # greedy-first matching would claim the wrong GT
        g1 = np.array([0, 0, 20, 20], np.float64)
        g2 = np.array([4, 4, 24, 24], np.float64)
        det = np.array([4, 4, 24, 24], np.float64)
        gts = [[(0, g1), (0, g2)]]
        preds = [[(0, 0.9, det), (0, 0.8, g1)]]
        ap = detection_ap(gts, preds, iou_thresh=0.75)
        assert ap > 0.99  # both matched: det→g2 (IoU 1.0), second→g1


class TestDetectionMAP:
    def test_map_keys_and_perfect(self):
        from clean_pvnet_tpu.eval.tless import detection_map

        box = np.array([10, 10, 30, 30], np.float64)
        stats = detection_map([[(0, box)]], [[(0, 0.9, box)]])
        assert stats["map"] > 0.99
        assert stats["ap50"] > 0.99
        assert stats["ap75"] > 0.99

    def test_loose_box_drops_high_iou_aps(self):
        from clean_pvnet_tpu.eval.tless import detection_map

        gt = np.array([10, 10, 30, 30], np.float64)
        loose = np.array([10, 10, 34, 30], np.float64)  # IoU = 20/24 ≈ 0.83
        stats = detection_map([[(0, gt)]], [[(0, 0.9, loose)]])
        assert stats["ap50"] > 0.99
        assert stats["ap75"] > 0.99
        assert 0.5 < stats["map"] < 0.9  # IoU≥0.85 thresholds fail
