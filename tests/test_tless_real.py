"""Real-T-LESS data prep: symmetry rectification table + BOP-layout → COCO
converters (counterparts of ref lib/datasets/tless/symmetry_utils.py,
tless_to_coco.py, handle_test_data.py)."""

import json
import os

import numpy as np
import pytest

from clean_pvnet_tpu.data.synthetic import make_synthetic_mesh
from clean_pvnet_tpu.data.tless_symmetry import (
    axis_group,
    rectify_discrete,
    rectify_z_continuous,
    tless_rectify,
    use_rectified_gt,
)
from clean_pvnet_tpu.utils.ply import save_ply


def random_rotation(rng):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    return q * np.sign(np.linalg.det(q))


def rot_z(deg):
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


class TestRectification:
    def test_discrete_group_invariance(self):
        # the reference's own validation criterion
        # (ref symmetry_utils.validate_rectification_implementation):
        # rectify(R @ g) == rectify(R) for every group element g
        rng = np.random.RandomState(0)
        for step, axis in [(60, 2), (180, 2), (90, 2), (180, 1)]:
            g = axis_group(step, axis)
            for _ in range(16):
                R = random_rotation(rng)
                R0 = rectify_discrete(R, g)
                for k in range(1, len(g)):
                    Rk = rectify_discrete(R @ g[k], g)
                    np.testing.assert_allclose(R0, Rk, atol=1e-10)

    def test_z_continuous_invariance(self):
        # rectify(R @ Rz(θ)) == rectify(R) for any θ
        # (ref validate_z_axis_symmetry_rectification_implementation)
        rng = np.random.RandomState(1)
        for _ in range(32):
            R = random_rotation(rng)
            R0 = rectify_z_continuous(R)
            for theta in rng.uniform(0, 360, 4):
                Rr = rectify_z_continuous(R @ rot_z(theta))
                np.testing.assert_allclose(R0, Rr, atol=1e-10)
            # result is a valid rotation
            np.testing.assert_allclose(R0 @ R0.T, np.eye(3), atol=1e-10)

    def test_per_object_table(self):
        rng = np.random.RandomState(2)
        R = random_rotation(rng)
        # non-symmetric ids are untouched (ref TLESS_rectify else-branch)
        for obj in (4, 5, 18, 25):
            np.testing.assert_allclose(tless_rectify(obj, R), R)
        # 60° z-group objects: R and R·Rz(60) map to the same pose
        for obj in (1, 2):
            np.testing.assert_allclose(
                tless_rectify(obj, R), tless_rectify(obj, R @ rot_z(60)),
                atol=1e-10,
            )
        # cylinders: continuous z
        for obj in (3, 13):
            np.testing.assert_allclose(
                tless_rectify(obj, R), tless_rectify(obj, R @ rot_z(123.4)),
                atol=1e-10,
            )
        # elevation-rule objects resolve to 180°-group or identity
        np.testing.assert_allclose(
            tless_rectify(14, R), tless_rectify(14, R @ rot_z(180)), atol=1e-10
        )
        np.testing.assert_allclose(tless_rectify(15, R), R)
        np.testing.assert_allclose(tless_rectify(17, R), R)

    def test_partial_symmetry_index_rule(self):
        # ref choose_gt: non-sym never rectified; obj 9/24 rectified below
        # the cut; obj 1/2/3 rectified above it; fully-sym always
        assert not use_rectified_gt(4, 0)
        assert use_rectified_gt(9, 100) and not use_rectified_gt(9, 300)
        assert not use_rectified_gt(1, 100) and use_rectified_gt(1, 400)
        assert use_rectified_gt(27, 0) and use_rectified_gt(27, 9999)


@pytest.fixture(scope="module")
def bop_layout(tmp_path_factory):
    """Fabricate a miniature BOP-classic T-LESS tree (2 objects, 1 test
    scene) with images rendered by the numpy rasterizer."""
    yaml = pytest.importorskip("yaml")
    from clean_pvnet_tpu.ops.rasterize import render_mesh_np
    from PIL import Image

    root = str(tmp_path_factory.mktemp("tless_root"))
    rng = np.random.RandomState(0)
    K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
    hw = (120, 160)
    meshes = {}
    os.makedirs(os.path.join(root, "models_cad"))
    for obj in (1, 2):
        verts, faces, colors = make_synthetic_mesh(obj)
        meshes[obj] = (verts, faces, colors)
        save_ply(
            os.path.join(root, "models_cad", f"obj_{obj:03d}.ply"),
            verts * 1000.0,  # BOP plys are in mm
            faces,
        )

    def pose_for(rng):
        R = random_rotation(rng)
        t = np.array([rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02),
                      rng.uniform(0.35, 0.5)])
        return R, t

    # per-object train dirs
    for obj in (1, 2):
        obj_dir = os.path.join(root, "train_primesense", f"{obj:02d}")
        os.makedirs(os.path.join(obj_dir, "rgb"))
        gt, info = {}, {}
        for ind in range(3):
            R, t = pose_for(rng)
            verts, faces, colors = meshes[obj]
            rt = np.concatenate([R, t[:, None]], -1)
            color, _, mask = render_mesh_np(verts, faces, K, rt, hw, colors)
            img = (np.clip(color, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(obj_dir, "rgb", f"{ind:04d}.png")
            )
            gt[ind] = [{
                "cam_R_m2c": R.ravel().tolist(),
                "cam_t_m2c": (t * 1000.0).tolist(),
                "obj_id": obj,
            }]
            info[ind] = {"cam_K": K.ravel().tolist(), "depth_scale": 0.1}
        with open(os.path.join(obj_dir, "gt.yml"), "w") as f:
            yaml.safe_dump(gt, f)
        with open(os.path.join(obj_dir, "info.yml"), "w") as f:
            yaml.safe_dump(info, f)

    # one multi-instance test scene
    scene_dir = os.path.join(root, "test_primesense", "01")
    os.makedirs(os.path.join(scene_dir, "rgb"))
    os.makedirs(os.path.join(scene_dir, "depth"))
    gt, info = {}, {}
    for ind in range(2):
        frame = np.zeros((*hw, 3), np.uint8)
        depth_mm = np.zeros(hw, np.float64)
        zbuf = np.full(hw, np.inf)
        insts = []
        for obj in (1, 2):
            R, t = pose_for(rng)
            verts, faces, colors = meshes[obj]
            rt = np.concatenate([R, t[:, None]], -1)
            color, dep, mask = render_mesh_np(verts, faces, K, rt, hw, colors)
            closer = (mask > 0) & (np.where(dep > 0, dep, np.inf) < zbuf)
            zbuf = np.where(closer, dep, zbuf)
            frame = np.where(
                closer[..., None], (np.clip(color, 0, 1) * 255).astype(np.uint8),
                frame,
            )
            depth_mm = np.where(closer, dep * 1000.0, depth_mm)
            insts.append({
                "cam_R_m2c": R.ravel().tolist(),
                "cam_t_m2c": (t * 1000.0).tolist(),
                "obj_id": obj,
            })
        Image.fromarray(frame).save(
            os.path.join(scene_dir, "rgb", f"{ind:04d}.png")
        )
        Image.fromarray((depth_mm / 0.1).astype(np.int32), mode="I").save(
            os.path.join(scene_dir, "depth", f"{ind:04d}.png")
        )
        gt[ind] = insts
        info[ind] = {"cam_K": K.ravel().tolist(), "depth_scale": 0.1}
    with open(os.path.join(scene_dir, "gt.yml"), "w") as f:
        yaml.safe_dump(gt, f)
    with open(os.path.join(scene_dir, "info.yml"), "w") as f:
        yaml.safe_dump(info, f)
    return root, K


class TestConverters:
    def test_train_to_coco(self, bop_layout):
        from tools.dataset_converters import tless_train_to_coco

        root, K = bop_layout
        out = tless_train_to_coco(root, 1)
        with open(out) as f:
            data = json.load(f)
        assert len(data["images"]) == 3 and len(data["annotations"]) == 3
        ann = data["annotations"][0]
        # keypoints project with the recorded pose/K
        pose = np.asarray(ann["pose"])
        fps3 = np.asarray(ann["fps_3d"])
        cam = fps3 @ pose[:, :3].T + pose[:, 3]
        pix = cam @ np.asarray(ann["K"]).T
        np.testing.assert_allclose(
            pix[:, :2] / pix[:, 2:], np.asarray(ann["fps_2d"]), atol=1e-6
        )
        # rendered mask exists, non-empty, aligned with center_2d
        from PIL import Image

        mask = np.asarray(Image.open(ann["mask_path"])) > 0
        assert mask.sum() > 50
        ys, xs = np.nonzero(mask)
        cx, cy = np.asarray(ann["center_2d"])
        assert abs(xs.mean() - cx) < 12 and abs(ys.mean() - cy) < 12
        # obj 1 at ind < 360 keeps the RAW gt pose (partial-symmetry rule,
        # ref choose_gt: for obj 1 only ind >= 360 uses gt_symmetry) — so
        # the recorded rotation must still be a valid rotation matrix and
        # rectification is idempotent on it
        from clean_pvnet_tpu.data.tless_symmetry import tless_rectify

        R = pose[:, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        R1 = tless_rectify(1, R)
        np.testing.assert_allclose(tless_rectify(1, R1), R1, atol=1e-8)

    def test_train_loads_into_dataset(self, bop_layout):
        from clean_pvnet_tpu.config import Config
        from clean_pvnet_tpu.data import LinemodDataset
        from tools.dataset_converters import tless_train_to_coco

        root, _ = bop_layout
        out = tless_train_to_coco(root, 2)
        cfg = Config()
        ds = LinemodDataset(cfg, out, split="test")
        item = ds[(0, 120, 160)]
        assert item["inp"].shape == (120, 160, 3)
        assert item["mask"].sum() > 0

    def test_test_scene_to_coco(self, bop_layout):
        from tools.dataset_converters import tless_test_to_coco

        root, K = bop_layout
        out = tless_test_to_coco(root, [1], os.path.join(root, "cache/test.json"))
        with open(out) as f:
            data = json.load(f)
        assert len(data["images"]) == 2
        assert len(data["annotations"]) == 4  # 2 images × 2 instances
        img = data["images"][0]
        assert img["depth_path"].endswith(".png")
        assert img["depth_scale"] == pytest.approx(10000.0)
        by_img = {}
        for ann in data["annotations"]:
            by_img.setdefault(ann["image_id"], []).append(ann)
        for anns in by_img.values():
            assert sorted(a["category_id"] for a in anns) == [1, 2]
            for ann in anns:
                x, y, w, h = ann["bbox"]
                assert w > 2 and h > 2
                # visible mask lies inside the amodal bbox
                from PIL import Image

                m = np.asarray(Image.open(ann["mask_path"])) > 0
                ys, xs = np.nonzero(m)
                if len(xs):
                    assert xs.min() >= x - 1 and xs.max() <= x + w
                    assert ys.min() >= y - 1 and ys.max() <= y + h
