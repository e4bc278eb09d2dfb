"""YCB-Video dataset support: converter + catalog glue.

The reference ships only a dangling YCB surface: a DatasetCatalog row
pointing at a preprocessed `posedb/{cls}_val.pkl`
(ref lib/datasets/dataset_catalog.py:70-74) and a `run.py --type ycb`
entry that imports `lib.datasets.ycb.handle_ycb` — a module that does not
exist in the repo (ref run.py:193-195). This module closes that gap with a
*working* equivalent: `collect_ycb` walks the standard YCB-Video release
layout

    <root>/data/NNNN/NNNNNN-{color.png,label.png,meta.mat}
    <root>/image_sets/<split>.txt          ("NNNN/NNNNNN" per line)
    <root>/models/<class>/points.xyz
    <root>/classes.txt                     (one class name per line)

and emits the same COCO-style pose json every other dataset in this
framework uses (fps_2d/fps_3d/center/K/pose/mask_path/type/cls — the
schema of lib/datasets/linemod/linemod_to_coco.py:260-308), so the
LinemodDataset/evaluator/training stack consumes YCB frames unchanged.

meta.mat fields used (PoseCNN convention): `poses` [3,4,n] per-object
poses, `cls_indexes` [n] 1-based class ids, `intrinsic_matrix` [3,3].
Label PNGs store the 1-based class index per pixel ('fuse'-style masks).
"""

from __future__ import annotations

import json
import os

import numpy as np

from clean_pvnet_tpu.geometry.fps import farthest_point_sampling_np


def read_ycb_classes(root: str) -> list[str]:
    with open(os.path.join(root, "classes.txt")) as f:
        return [ln.strip() for ln in f if ln.strip()]


def load_ycb_meta(path: str) -> dict:
    """meta.mat loader (scipy mat or an .npz stand-in with the same keys)."""
    if path.endswith(".npz"):
        d = dict(np.load(path))
    else:
        import scipy.io

        d = scipy.io.loadmat(path)
    return d


def collect_ycb(
    root: str,
    cls_type: str,
    split: str = "val",
    n_keypoints: int = 8,
    out_path: str | None = None,
) -> str:
    """Build the pose json for one class over one image_sets split.

    Counterpart of the reference's missing handle_ycb.collect_ycb
    (ref run.py:193-195): per frame where the class is visible, record the
    class pose, camera K, projected FPS keypoints, and the label-image path
    (mask type 'fuse' — the label PNG holds per-pixel class indices, decoded
    by data/linemod.read_mask exactly like the reference's fuse masks,
    ref lib/utils/pvnet/pvnet_data_utils.py:57-67).
    Returns the written json path.
    """
    classes = read_ycb_classes(root)
    if cls_type not in classes:
        raise ValueError(f"{cls_type!r} not in classes.txt ({classes[:5]}...)")
    cls_idx = classes.index(cls_type) + 1  # label images are 1-based

    pts_path = os.path.join(root, "models", cls_type, "points.xyz")
    model_pts = np.loadtxt(pts_path).astype(np.float64)
    fps_3d = farthest_point_sampling_np(model_pts, n_keypoints,
                                        init_center=True)
    center_3d = (model_pts.max(0) + model_pts.min(0)) / 2.0
    corner_3d = np.array(
        [
            [x, y, z]
            for x in (model_pts[:, 0].min(), model_pts[:, 0].max())
            for y in (model_pts[:, 1].min(), model_pts[:, 1].max())
            for z in (model_pts[:, 2].min(), model_pts[:, 2].max())
        ]
    )

    with open(os.path.join(root, "image_sets", f"{split}.txt")) as f:
        frames = [ln.strip() for ln in f if ln.strip()]

    images, annotations = [], []
    img_id = 0
    for frame in frames:
        prefix = os.path.join(root, "data", frame)
        meta_path = prefix + "-meta.mat"
        if not os.path.exists(meta_path):
            meta_path = prefix + "-meta.npz"
        meta = load_ycb_meta(meta_path)
        cls_indexes = np.asarray(meta["cls_indexes"]).reshape(-1)
        hits = np.nonzero(cls_indexes == cls_idx)[0]
        if hits.size == 0:
            continue
        i = int(hits[0])
        poses = np.asarray(meta["poses"], np.float64)
        pose = poses[:, :, i] if poses.ndim == 3 else poses
        K = np.asarray(meta["intrinsic_matrix"], np.float64)

        def proj(p):
            cam = p @ pose[:, :3].T + pose[:, 3]
            q = cam @ K.T
            return (q[:, :2] / q[:, 2:]).tolist()

        from PIL import Image

        color_path = prefix + "-color.png"
        with Image.open(color_path) as im:
            w, h = im.size
        images.append(
            {"id": img_id, "file_name": color_path, "height": h, "width": w}
        )
        annotations.append(
            {
                "id": img_id,
                "image_id": img_id,
                "category_id": 1,
                "mask_path": prefix + "-label.png",
                "type": "fuse",          # label PNG: per-pixel class index
                "cls": cls_type,
                "cls_idx": cls_idx,
                "pose": pose.tolist(),
                "K": K.tolist(),
                "fps_3d": fps_3d.tolist(),
                "fps_2d": proj(fps_3d),
                "center_3d": center_3d.tolist(),
                "center_2d": proj(center_3d[None])[0],
                "corner_3d": corner_3d.tolist(),
                "corner_2d": proj(corner_3d),
                "data_root": root,
            }
        )
        img_id += 1

    out = {
        "images": images,
        "annotations": annotations,
        "categories": [{"supercategory": "none", "id": 1, "name": cls_type}],
    }
    out_path = out_path or os.path.join(
        root, "posedb", f"{cls_type}_{split}.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    return out_path
