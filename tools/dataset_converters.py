"""Offline dataset converters → COCO-style pose json.

Behavioral counterparts of the reference's data-prep tools:
  * custom_to_coco / sample_fps_points
      (ref tools/handle_custom_dataset.py:19-120): custom datasets laid out
      as  <root>/model.ply, camera.txt, rgb/<i>.jpg, mask/<i>.png,
      pose/pose<i>.npy  → fps.txt + train.json
  * linemod real/occlusion annotation records
      (ref lib/datasets/linemod/linemod_to_coco.py:69-308): LINEMOD-orig
      layout  data/linemod/<cls>/{JPEGImages,mask,pose}  plus
      occlusion_linemod/{RGB-D,masks,blender_poses}  → <split>.json

Same output schema as the synthetic generator, so every downstream stage
is layout-agnostic. FPS keypoints come from the native hostops kernel
(geometry/fps fallback), not a cffi extension.
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from clean_pvnet_tpu.geometry.fps import farthest_point_sampling_np
from clean_pvnet_tpu.utils.ply import load_ply


def get_model_corners(model: np.ndarray) -> np.ndarray:
    """8 bbox corners in the reference's ordering
    (ref linemod_to_coco.py:28-39)."""
    mn = model.min(0)
    mx = model.max(0)
    return np.array(
        [
            [mn[0], mn[1], mn[2]], [mn[0], mn[1], mx[2]],
            [mn[0], mx[1], mn[2]], [mn[0], mx[1], mx[2]],
            [mx[0], mn[1], mn[2]], [mx[0], mn[1], mx[2]],
            [mx[0], mx[1], mn[2]], [mx[0], mx[1], mx[2]],
        ]
    )


def project_np(xyz, K, RT):
    xyz = xyz @ RT[:, :3].T + RT[:, 3:].T
    xyz = xyz @ K.T
    return xyz[:, :2] / xyz[:, 2:]


def sample_fps_points(data_root: str, n: int = 8) -> np.ndarray:
    """(ref handle_custom_dataset.py:19-24)"""
    model = load_ply(os.path.join(data_root, "model.ply"))
    try:
        from clean_pvnet_tpu import native

        fps = native.fps_f32(model["pts"].astype(np.float32), n, init_center=True)
    except Exception:
        fps = None
    if fps is None:
        fps = farthest_point_sampling_np(model["pts"], n, init_center=True)
    np.savetxt(os.path.join(data_root, "fps.txt"), fps)
    return fps


def custom_to_coco(data_root: str, cls: str = "custom",
                   scale_to_meters: float = 1.0) -> str:
    """(ref handle_custom_dataset.py:88-120). Returns the train.json path."""
    model = load_ply(os.path.join(data_root, "model.ply"))
    pts = model["pts"] * scale_to_meters
    K = np.loadtxt(os.path.join(data_root, "camera.txt"))
    fps_path = os.path.join(data_root, "fps.txt")
    if not os.path.exists(fps_path):
        sample_fps_points(data_root)
    fps_3d = np.loadtxt(fps_path) * scale_to_meters

    corner_3d = get_model_corners(pts)
    center_3d = (corner_3d.max(0) + corner_3d.min(0)) / 2

    rgb_dir = os.path.join(data_root, "rgb")
    pose_dir = os.path.join(data_root, "pose")
    mask_dir = os.path.join(data_root, "mask")

    images, annotations = [], []
    names = sorted(os.listdir(rgb_dir))
    for i, name in enumerate(names):
        rgb_path = os.path.join(rgb_dir, name)
        stem = os.path.splitext(name)[0]
        pose_path = os.path.join(pose_dir, f"pose{stem}.npy")
        if not os.path.exists(pose_path):
            pose_path = os.path.join(pose_dir, f"{stem}.npy")
        pose = np.load(pose_path)
        with Image.open(rgb_path) as im:
            w, h = im.size
        images.append(
            {"file_name": rgb_path, "height": h, "width": w, "id": i + 1}
        )
        annotations.append(
            {
                "id": i + 1,
                "image_id": i + 1,
                "category_id": 1,
                "mask_path": os.path.join(mask_dir, stem + ".png"),
                "type": "real",
                "cls": cls,
                "pose": pose.tolist(),
                "K": K.tolist(),
                "corner_3d": corner_3d.tolist(),
                "corner_2d": project_np(corner_3d, K, pose).tolist(),
                "center_3d": center_3d.tolist(),
                "center_2d": project_np(center_3d[None], K, pose)[0].tolist(),
                "fps_3d": fps_3d.tolist(),
                "fps_2d": project_np(fps_3d, K, pose).tolist(),
                "data_root": rgb_dir,
            }
        )

    out = {
        "images": images,
        "annotations": annotations,
        "categories": [{"supercategory": "none", "id": 1, "name": cls}],
    }
    path = os.path.join(data_root, "train.json")
    with open(path, "w") as f:
        json.dump(out, f)
    return path


LINEMOD_K = np.array(
    [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]]
)


def linemod_to_coco(linemod_root: str, cls: str, split_file: str,
                    out_path: str, ann_type: str = "real") -> str:
    """Real-image LINEMOD records (ref linemod_to_coco.py:69-115
    record_real_ann + :260-308 driver) for the standard LINEMOD-orig
    layout  <root>/<cls>/{JPEGImages, mask, pose, <cls>.ply, farthest.txt,
    <split>.txt}."""
    cls_dir = os.path.join(linemod_root, cls)
    model = load_ply(os.path.join(cls_dir, cls + ".ply"))
    pts = model["pts"] / 1000.0  # LINEMOD plys are mm
    corner_3d = get_model_corners(pts)
    center_3d = (corner_3d.max(0) + corner_3d.min(0)) / 2
    fps_3d = np.loadtxt(os.path.join(cls_dir, "farthest.txt"))

    with open(split_file) as f:
        inds = [
            int(os.path.basename(line.strip()).split(".")[0].replace("color_", ""))
            for line in f
            if line.strip()
        ]

    images, annotations = [], []
    for n, ind in enumerate(inds):
        rgb_path = os.path.join(cls_dir, "JPEGImages", f"{ind:06d}.jpg")
        pose_path = os.path.join(cls_dir, "pose", f"pose{ind}.npy")
        mask_path = os.path.join(cls_dir, "mask", f"{ind:04d}.png")
        if not os.path.exists(pose_path):
            continue
        pose = np.load(pose_path)
        with Image.open(rgb_path) as im:
            w, h = im.size
        images.append({"file_name": rgb_path, "height": h, "width": w, "id": n + 1})
        annotations.append(
            {
                "id": n + 1,
                "image_id": n + 1,
                "category_id": 1,
                "mask_path": mask_path,
                "type": ann_type,
                "cls": cls,
                "pose": pose.tolist(),
                "K": LINEMOD_K.tolist(),
                "corner_3d": corner_3d.tolist(),
                "corner_2d": project_np(corner_3d, LINEMOD_K, pose).tolist(),
                "center_3d": center_3d.tolist(),
                "center_2d": project_np(center_3d[None], LINEMOD_K, pose)[0].tolist(),
                "fps_3d": fps_3d.tolist(),
                "fps_2d": project_np(fps_3d, LINEMOD_K, pose).tolist(),
                "data_root": cls_dir,
            }
        )

    out = {
        "images": images,
        "annotations": annotations,
        "categories": [{"supercategory": "none", "id": 1, "name": cls}],
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    return out_path
