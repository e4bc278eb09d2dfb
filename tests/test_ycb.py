"""YCB-Video converter (data/ycb.py): the reference ships only a dangling
surface for YCB (catalog row + missing handle_ycb module, ref run.py:193-195,
lib/datasets/dataset_catalog.py:70-74); ours must actually work. Fabricates
a mini YCB-Video tree in the release layout and checks the produced json
feeds the standard dataset/eval stack."""

import json
import os

import numpy as np
from PIL import Image

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data import LinemodDataset
from clean_pvnet_tpu.data.synthetic import make_synthetic_mesh, random_rotation
from clean_pvnet_tpu.data.ycb import collect_ycb
from clean_pvnet_tpu.ops.rasterize import render_mesh_np


def _mini_ycb(root, n_frames=3, cls="003_cracker_box", cls_idx=2):
    """YCB-Video release layout with 2 classes; frames contain ours (idx 2)
    plus a distractor (idx 1) so the label-image class decode matters."""
    rng = np.random.RandomState(0)
    classes = ["002_master_chef_can", cls]
    os.makedirs(os.path.join(root, "image_sets"), exist_ok=True)
    with open(os.path.join(root, "classes.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")

    verts, faces, _ = make_synthetic_mesh(3, radius=0.08)
    dverts, dfaces, _ = make_synthetic_mesh(4, radius=0.05)
    for name, v in ((classes[0], dverts), (cls, verts)):
        mdir = os.path.join(root, "models", name)
        os.makedirs(mdir, exist_ok=True)
        np.savetxt(os.path.join(mdir, "points.xyz"), v)

    K = np.array([[320.0, 0, 80], [0, 320.0, 60], [0, 0, 1]])
    hw = (120, 160)
    frames = []
    import scipy.io

    for i in range(n_frames):
        seq, fid = "0000", f"{i + 1:06d}"
        ddir = os.path.join(root, "data", seq)
        os.makedirs(ddir, exist_ok=True)
        R = random_rotation(rng)
        pose = np.concatenate([R, [[0.0], [0.0], [0.6]]], 1)
        color, dep, mask = render_mesh_np(verts, faces, K, pose, hw)
        dR = random_rotation(rng)
        dpose = np.concatenate([dR, [[0.06], [0.05], [0.5]]], 1)
        dcol, ddep, dmask = render_mesh_np(dverts, dfaces, K, dpose, hw)

        label = np.zeros(hw, np.uint8)
        label[mask > 0] = 2          # our class
        infront = (dmask > 0) & (
            np.where(ddep > 0, ddep, np.inf)
            < np.where(mask > 0, dep, np.inf)
        )
        label[infront] = 1           # distractor occludes
        frame = np.zeros(hw + (3,), np.float32)
        frame[mask > 0] = color[mask > 0]
        frame[infront] = dcol[infront]

        prefix = os.path.join(ddir, fid)
        Image.fromarray((frame * 255).astype(np.uint8)).save(
            prefix + "-color.png")
        Image.fromarray(label).save(prefix + "-label.png")
        scipy.io.savemat(
            prefix + "-meta.mat",
            {
                "poses": np.stack([dpose, pose], -1),
                "cls_indexes": np.array([[1], [2]]),
                "intrinsic_matrix": K,
            },
        )
        frames.append(f"{seq}/{fid}")

    with open(os.path.join(root, "image_sets", "val.txt"), "w") as f:
        f.write("\n".join(frames) + "\n")
    return classes


class TestYcbConverter:
    def test_collect_and_load(self, tmp_path):
        root = str(tmp_path / "YCB")
        _mini_ycb(root)
        out = collect_ycb(root, "003_cracker_box", split="val")
        with open(out) as f:
            data = json.load(f)
        assert len(data["annotations"]) == 3
        ann = data["annotations"][0]
        for key in ("fps_2d", "fps_3d", "center_2d", "K", "pose",
                    "mask_path", "type", "cls", "cls_idx"):
            assert key in ann, key
        assert ann["type"] == "fuse" and ann["cls_idx"] == 2

        # keypoints reproject exactly from the recorded pose/K
        K = np.asarray(ann["K"])
        pose = np.asarray(ann["pose"])
        p3 = np.asarray(ann["fps_3d"])
        cam = p3 @ pose[:, :3].T + pose[:, 3]
        uv = (cam @ K.T)
        uv = uv[:, :2] / uv[:, 2:]
        np.testing.assert_allclose(uv, np.asarray(ann["fps_2d"]), atol=1e-6)

        # the standard dataset stack consumes it; mask decodes OUR class
        # only (not the occluding distractor — label idx 1)
        cfg = Config().with_overrides({"cls_type": "003_cracker_box"})
        ds = LinemodDataset(cfg, out, split="test")
        img, kpt_2d, mask, _ = ds.read(ds.img_ids[0])
        label = np.asarray(
            Image.open(data["annotations"][0]["mask_path"]))
        assert mask.sum() == (label == 2).sum() > 0
        assert (mask[label == 1] == 0).all()
