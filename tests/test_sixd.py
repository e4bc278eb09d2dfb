"""Tests for the SIXD/BOP toolkit surface (eval/sixd.py) against the
reference pysixd behaviors (ref lib/utils/pysixd/{score,pose_matching,
misc,inout}.py)."""

import numpy as np
import pytest

from clean_pvnet_tpu.eval import sixd


class TestVocAp:
    def test_reference_example(self):
        # the worked example at the bottom of ref score.py:40-48
        tp = np.array([False, True, True, False, True, False])
        tp_c = np.cumsum(tp).astype(np.float64)
        fp_c = np.cumsum(~tp).astype(np.float64)
        rec = tp_c / tp.size
        pre = tp_c / (fp_c + tp_c)
        got = sixd.voc_ap(rec, pre)
        # oracle: reference backward-max loop
        i = np.argsort(rec)
        mrec = np.concatenate(([0], np.array(rec)[i], [1]))
        mpre = np.concatenate(([0], np.array(pre)[i], [0]))
        for j in range(mpre.size - 3, -1, -1):
            mpre[j] = max(mpre[j], mpre[j + 1])
        idx = np.nonzero(mrec[1:] != mrec[:-1])[0] + 1
        expect = np.sum((mrec[idx] - mrec[idx - 1]) * mpre[idx])
        assert got == pytest.approx(expect)

    def test_perfect_detector(self):
        rec, pre = sixd.precision_recall([0.9, 0.8, 0.7], [1, 1, 1], n_gt=3)
        assert sixd.voc_ap(rec, pre) == pytest.approx(1.0)

    def test_all_false_positives(self):
        rec, pre = sixd.precision_recall([0.9, 0.8], [0, 0], n_gt=2)
        assert sixd.voc_ap(rec, pre) == pytest.approx(0.0)


class TestMatchPoses:
    def _errs(self):
        return [
            {"est_id": 0, "score": 0.9, "errors": {0: 0.05, 1: 0.40}},
            {"est_id": 1, "score": 0.8, "errors": {0: 0.02, 1: 0.10}},
            {"est_id": 2, "score": 0.1, "errors": {0: 0.50, 1: 0.60}},
        ]

    def test_greedy_by_score(self):
        m = sixd.match_poses(self._errs(), error_thresh=0.3)
        # est 0 takes gt 0 (err .05); est 1's best remaining is gt 1 (.10)
        assert [(x["est_id"], x["gt_id"]) for x in m] == [(0, 0), (1, 1)]
        assert m[0]["error_norm"] == pytest.approx(0.05 / 0.3)

    def test_max_ests_count(self):
        m = sixd.match_poses(self._errs(), error_thresh=0.3, max_ests_count=1)
        assert [(x["est_id"], x["gt_id"]) for x in m] == [(0, 0)]

    def test_gt_valid_mask(self):
        m = sixd.match_poses(self._errs(), error_thresh=0.3,
                             gt_valid_mask={0: False, 1: True})
        assert [(x["est_id"], x["gt_id"]) for x in m] == [(1, 1)]

    def test_threshold_excludes(self):
        m = sixd.match_poses(self._errs(), error_thresh=0.01)
        assert m == []


class TestMisc:
    def test_project_and_bbox(self):
        K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
        pts = np.array([[0.0, 0, 0], [0.1, 0.1, 0]])
        R, t = np.eye(3), np.array([0.0, 0, 1.0])
        uv = sixd.project_pts(pts, K, R, t)
        np.testing.assert_allclose(uv[0], [50, 40])
        np.testing.assert_allclose(uv[1], [60, 50])
        bb = sixd.calc_2d_bbox(uv[:, 0], uv[:, 1])
        assert bb == [50, 40, 10, 10]
        bbc = sixd.calc_2d_bbox(uv[:, 0], uv[:, 1], im_size=(55, 45), clip=True)
        assert bbc == [50, 40, 4, 4]
        bbp = sixd.calc_pose_2d_bbox(pts, (640, 480), K, R, t)
        assert bbp == [50, 40, 10, 10]

    def test_rgbd_to_point_cloud_roundtrip(self):
        K = np.array([[120.0, 0, 32], [0, 120.0, 24], [0, 0, 1]])
        depth = np.zeros((48, 64))
        depth[10, 20] = 2.0
        depth[30, 40] = 0.5
        pts, colors, pix = sixd.rgbd_to_point_cloud(K, depth)
        assert pts.shape == (2, 3) and colors is None
        # reproject → original pixels
        uv = pts[:, :2] / pts[:, 2:] * np.array([K[0, 0], K[1, 1]]) + np.array(
            [K[0, 2], K[1, 2]])
        np.testing.assert_allclose(uv, pix.astype(np.float64))
        rgb = np.arange(48 * 64 * 3).reshape(48, 64, 3)
        _, colors, _ = sixd.rgbd_to_point_cloud(K, depth, rgb)
        np.testing.assert_array_equal(colors[0], rgb[10, 20])


class TestSceneIO:
    def test_info_roundtrip(self, tmp_path):
        p = str(tmp_path / "info.yml")
        info = {0: {"cam_K": np.arange(9, dtype=np.float64).reshape(3, 3),
                    "depth_scale": 0.1}}
        sixd.save_info(p, info)
        back = sixd.load_info(p)
        np.testing.assert_allclose(back[0]["cam_K"],
                                   np.arange(9).reshape(3, 3))
        assert back[0]["depth_scale"] == pytest.approx(0.1)

    def test_gt_roundtrip(self, tmp_path):
        p = str(tmp_path / "gt.yml")
        gts = {0: [{"obj_id": 5,
                    "cam_R_m2c": np.eye(3),
                    "cam_t_m2c": np.array([[1.0], [2.0], [3.0]]),
                    "obj_bb": [1.0, 2.0, 3.0, 4.0]}]}
        sixd.save_gt(p, gts)
        back = sixd.load_gt(p)
        g = back[0][0]
        np.testing.assert_allclose(g["cam_R_m2c"], np.eye(3))
        np.testing.assert_allclose(g["cam_t_m2c"], [[1], [2], [3]])
        assert g["obj_bb"] == [1, 2, 3, 4] and g["obj_id"] == 5

    def test_results_roundtrip(self, tmp_path):
        p = str(tmp_path / "res.yml")
        res = {"ests": [{"score": 0.75, "R": np.eye(3),
                         "t": np.array([10.0, 20.0, 30.0])}]}
        sixd.save_results_sixd17(p, res, run_time=1.5)
        back = sixd.load_results_sixd17(p)
        assert back["run_time"] == pytest.approx(1.5)
        np.testing.assert_allclose(back["ests"][0]["R"], np.eye(3))
        np.testing.assert_allclose(back["ests"][0]["t"], [[10], [20], [30]])

    def test_errors_roundtrip(self, tmp_path):
        p = str(tmp_path / "err.yml")
        errs = [{"est_id": 0, "score": 0.9, "errors": {1: 0.25}}]
        sixd.save_errors(p, errs)
        back = sixd.load_errors(p)
        assert back[0]["errors"] == {1: 0.25}
        # round-trips through match_poses
        m = sixd.match_poses(back, error_thresh=0.5)
        assert m[0]["gt_id"] == 1
