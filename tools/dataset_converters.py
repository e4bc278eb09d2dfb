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


# ---------------------------------------------------------------------------
# Real T-LESS (BOP-classic primesense layout) → COCO pose json
# (ref lib/datasets/tless/tless_to_coco.py:69-257 for the train records and
#  lib/datasets/tless/handle_test_data.py:14-252 for test scenes; masks are
#  produced by rendering the CAD model at the GT pose with the numpy
#  rasterizer instead of OpenGL)
# ---------------------------------------------------------------------------

def _load_yaml(path):
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def _tless_model(tless_root: str, obj_id: int, n_fps: int = 8):
    """Load obj_{id:03d}.ply (mm → m) and derive corners/center/FPS kpts."""
    model_path = os.path.join(tless_root, "models_cad", f"obj_{obj_id:03d}.ply")
    ply = load_ply(model_path)
    verts = np.asarray(ply["pts"], np.float64) / 1000.0
    faces = np.asarray(ply["faces"], np.int64)
    corner_3d = get_model_corners(verts)
    center_3d = (corner_3d.max(0) + corner_3d.min(0)) / 2.0
    fps_3d = farthest_point_sampling_np(verts.astype(np.float32), n_fps,
                                        init_center=True)
    return verts, faces, corner_3d, center_3d, np.asarray(fps_3d, np.float64)


def tless_train_to_coco(
    tless_root: str,
    obj_id: int,
    out_dir: str | None = None,
    n_fps: int = 8,
    rectify_symmetry: bool = True,
    limit: int | None = None,
) -> str:
    """Per-object real primesense training images → train.json
    (ref tless_to_coco._tless_train_to_coco + record_real_ann :69-128,185-219).

    Layout: <tless_root>/train_primesense/<obj:02d>/{rgb/<ind:04d>.png,
    gt.yml, info.yml} and <tless_root>/models_cad/obj_<obj:03d>.ply.
    Symmetric objects get rectified poses per the per-object table
    (data/tless_symmetry.py), applied with the same partial-symmetry index
    rule as the reference's gt/gt_symmetry choice (choose_gt :45-68).
    Masks are rendered from the CAD model at the GT pose.
    """
    from clean_pvnet_tpu.data.tless_symmetry import tless_rectify, use_rectified_gt
    from clean_pvnet_tpu.ops.rasterize import render_mesh_np

    verts, faces, corner_3d, center_3d, fps_3d = _tless_model(
        tless_root, obj_id, n_fps
    )
    obj_dir = os.path.join(tless_root, "train_primesense", f"{obj_id:02d}")
    gt = _load_yaml(os.path.join(obj_dir, "gt.yml"))
    info = _load_yaml(os.path.join(obj_dir, "info.yml"))
    out_dir = out_dir or os.path.join(tless_root, "cache", f"{obj_id:02d}")
    mask_dir = os.path.join(out_dir, "mask")
    os.makedirs(mask_dir, exist_ok=True)

    images, annotations = [], []
    inds = sorted(int(k) for k in gt)
    if limit is not None:
        inds = inds[:limit]
    for ind in inds:
        inst = gt[ind][0]
        R = np.asarray(inst["cam_R_m2c"], np.float64).reshape(3, 3)
        t = np.asarray(inst["cam_t_m2c"], np.float64) / 1000.0
        if rectify_symmetry and use_rectified_gt(obj_id, ind):
            R = tless_rectify(obj_id, R)
        pose = np.concatenate([R, t[:, None]], -1)
        K = np.asarray(info[ind]["cam_K"], np.float64).reshape(3, 3)

        rgb_path = os.path.join(obj_dir, "rgb", f"{ind:04d}.png")
        with Image.open(rgb_path) as im:
            w, h = im.size
        _, _, mask = render_mesh_np(verts, faces, K, pose, (h, w))
        mask_path = os.path.join(mask_dir, f"{ind:04d}.png")
        Image.fromarray(mask * 255).save(mask_path)

        img_id = ind + 1
        images.append(
            {"id": img_id, "file_name": rgb_path, "height": h, "width": w}
        )
        annotations.append(
            {
                "id": img_id,
                "image_id": img_id,
                "category_id": 1,
                "mask_path": mask_path,
                "type": "real",
                "cls": obj_id,
                "pose": pose.tolist(),
                "K": K.tolist(),
                "corner_3d": corner_3d.tolist(),
                "corner_2d": project_np(corner_3d, K, pose).tolist(),
                "center_3d": center_3d.tolist(),
                "center_2d": project_np(center_3d[None], K, pose)[0].tolist(),
                "fps_3d": fps_3d.tolist(),
                "fps_2d": project_np(fps_3d, K, pose).tolist(),
                "data_root": obj_dir,
            }
        )

    out_path = os.path.join(out_dir, "train.json")
    with open(out_path, "w") as f:
        json.dump(
            {
                "images": images,
                "annotations": annotations,
                "categories": [
                    {"supercategory": "none", "id": 1, "name": obj_id}
                ],
            },
            f,
        )
    return out_path


def tless_test_to_coco(
    tless_root: str,
    scene_ids,
    out_path: str,
    n_fps: int = 8,
    limit: int | None = None,
) -> str:
    """Multi-instance primesense test scenes → test json with per-instance
    pose/bbox/visible-mask annotations (ref handle_test_data.py:14-252:
    scene z-buffer over all GT instances → per-instance visibility; the
    evaluator's VSD/ICP consume the recorded depth paths).

    Layout: <tless_root>/test_primesense/<scene:02d>/{rgb,depth}/<i:04d>.png
    + gt.yml + info.yml.
    """
    from clean_pvnet_tpu.ops.rasterize import render_mesh_np

    models: dict[int, tuple] = {}

    images, annotations = [], []
    img_id = 0
    ann_id = 0
    for scene_id in scene_ids:
        scene_dir = os.path.join(tless_root, "test_primesense", f"{scene_id:02d}")
        gt = _load_yaml(os.path.join(scene_dir, "gt.yml"))
        info = _load_yaml(os.path.join(scene_dir, "info.yml"))
        mask_dir = os.path.join(scene_dir, "mask_visib_np")
        os.makedirs(mask_dir, exist_ok=True)
        inds = sorted(int(k) for k in gt)
        if limit is not None:
            inds = inds[:limit]
        for ind in inds:
            rgb_path = os.path.join(scene_dir, "rgb", f"{ind:04d}.png")
            depth_path = os.path.join(scene_dir, "depth", f"{ind:04d}.png")
            with Image.open(rgb_path) as im:
                w, h = im.size
            K = np.asarray(info[ind]["cam_K"], np.float64).reshape(3, 3)
            depth_scale = float(info[ind].get("depth_scale", 0.1))

            img_id += 1
            rec = {
                "id": img_id,
                "file_name": rgb_path,
                "height": h,
                "width": w,
                "scene_id": scene_id,
                "frame_id": ind,
            }
            if os.path.exists(depth_path):
                # BOP depth png units: depth_scale mm per level → png/m
                rec["depth_path"] = depth_path
                rec["depth_scale"] = 1000.0 / depth_scale
            images.append(rec)

            # scene z-buffer over every GT instance → visible masks
            insts = gt[ind]
            depths = []
            for inst in insts:
                obj = int(inst["obj_id"])
                if obj not in models:
                    models[obj] = _tless_model(tless_root, obj, n_fps)
                verts, faces, _, _, _ = models[obj]
                R = np.asarray(inst["cam_R_m2c"], np.float64).reshape(3, 3)
                t = np.asarray(inst["cam_t_m2c"], np.float64) / 1000.0
                pose = np.concatenate([R, t[:, None]], -1)
                _, dep, _ = render_mesh_np(verts, faces, K, pose, (h, w))
                depths.append(dep)
            stack = np.stack(depths)  # [n, h, w]
            stack_inf = np.where(stack > 0, stack, np.inf)
            winner = np.argmin(stack_inf, 0)
            any_hit = np.isfinite(stack_inf.min(0))

            for ii, inst in enumerate(insts):
                obj = int(inst["obj_id"])
                verts, faces, corner_3d, center_3d, fps_3d = models[obj]
                R = np.asarray(inst["cam_R_m2c"], np.float64).reshape(3, 3)
                t = np.asarray(inst["cam_t_m2c"], np.float64) / 1000.0
                pose = np.concatenate([R, t[:, None]], -1)
                visib = ((winner == ii) & any_hit).astype(np.uint8)
                amodal = (stack[ii] > 0)
                ys, xs = np.nonzero(amodal)
                if len(xs) == 0:
                    continue
                bbox = [
                    float(xs.min()),
                    float(ys.min()),
                    float(xs.max() - xs.min() + 1),
                    float(ys.max() - ys.min() + 1),
                ]
                mask_path = os.path.join(mask_dir, f"{ind:04d}_{ii:02d}.png")
                Image.fromarray(visib * 255).save(mask_path)
                ann_id += 1
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "category_id": obj,
                        "bbox": bbox,
                        "area": bbox[2] * bbox[3],
                        "mask_path": mask_path,
                        "type": "real",
                        "cls": obj,
                        "pose": pose.tolist(),
                        "K": K.tolist(),
                        "corner_3d": corner_3d.tolist(),
                        "corner_2d": project_np(corner_3d, K, pose).tolist(),
                        "center_3d": center_3d.tolist(),
                        "center_2d": project_np(center_3d[None], K, pose)[
                            0
                        ].tolist(),
                        "fps_3d": fps_3d.tolist(),
                        "fps_2d": project_np(fps_3d, K, pose).tolist(),
                    }
                )

    cats = [
        {"supercategory": "none", "id": i + 1, "name": f"obj_{i + 1:02d}"}
        for i in range(30)
    ]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": cats},
            f,
        )
    return out_path
