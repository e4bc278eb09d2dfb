"""Pose visualization: GT vs predicted 3D bbox overlays.

Behavioral counterpart of reference lib/visualizers/linemod/pvnet.py:22-82
(visualize, visualize_demo, visualize_train). matplotlib is optional; when
absent, images are written with PIL line drawing.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.geometry.transforms import project
from clean_pvnet_tpu.registry import VISUALIZERS

import jax.numpy as jnp

# 3D bbox edge list over the 8 corner ordering used by the synthetic
# generator / reference converter (x-major, then y, then z)
BOX_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def draw_pose_box(img_uint8: np.ndarray, corner_3d, K, pose, color=(0, 255, 0)):
    im = Image.fromarray(img_uint8)
    draw = ImageDraw.Draw(im)
    c2 = np.asarray(
        project(jnp.asarray(corner_3d, jnp.float32), jnp.asarray(K, jnp.float32),
                jnp.asarray(pose, jnp.float32))
    )
    for a, b in BOX_EDGES:
        draw.line([tuple(c2[a]), tuple(c2[b])], fill=color, width=2)
    return np.asarray(im)


def draw_keypoints(img_uint8: np.ndarray, kpt_2d, color=(255, 0, 0), r=3):
    im = Image.fromarray(img_uint8)
    draw = ImageDraw.Draw(im)
    for x, y in np.asarray(kpt_2d):
        draw.ellipse([x - r, y - r, x + r, y + r], outline=color, width=2)
    return np.asarray(im)


@VISUALIZERS.register("pvnet")
class PVNetVisualizer:
    def __init__(self, cfg: Config):
        self.cfg = cfg

    def visualize(self, output: dict, batch: dict, path: str = "vis.png"):
        """GT (green) vs predicted (blue) 3D bbox (ref pvnet.py:22-47)."""
        img = self._denorm(np.asarray(batch["inp"][0]))
        ann = batch["meta"][0]["ann"]
        img = draw_pose_box(img, ann["corner_3d"], ann["K"], ann["pose"],
                            (0, 255, 0))
        img = draw_pose_box(img, ann["corner_3d"], ann["K"],
                            np.asarray(output["pose"][0]), (64, 64, 255))
        img = draw_keypoints(img, np.asarray(output["kpt_2d"][0]))
        Image.fromarray(img).save(path)
        return path

    def visualize_train(self, batch: dict, path: str = "train_vis.png"):
        """GT target inspection (ref pvnet.py:66-82)."""
        img = self._denorm(np.asarray(batch["inp"][0]))
        mask = np.asarray(batch["mask"][0]) > 0
        img = img.copy()
        img[mask] = (0.5 * img[mask] + np.array([0, 120, 0])).astype(np.uint8)
        if "kpt_2d" in batch:
            img = draw_keypoints(img, np.asarray(batch["kpt_2d"][0]))
        Image.fromarray(img).save(path)
        return path

    @staticmethod
    def _denorm(inp: np.ndarray) -> np.ndarray:
        from clean_pvnet_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

        img = (inp * IMAGENET_STD + IMAGENET_MEAN) * 255.0
        return np.clip(img, 0, 255).astype(np.uint8)


@VISUALIZERS.register("ct")
class DetectionVisualizer:
    """Detector-output overlays: predicted boxes (blue, score-annotated)
    and GT boxes (green). Counterpart of the reference's detection
    visualizers (ref lib/visualizers/tless_test/ct.py:16-24, which plots
    `detection[:, :4] * down_ratio` over the unnormalized input)."""

    def __init__(self, cfg: Config, down_ratio: int = 4,
                 score_thresh: float = 0.3):
        self.cfg = cfg
        self.down_ratio = down_ratio
        self.score_thresh = score_thresh

    def visualize(self, output: dict, batch: dict, path: str = "det_vis.png"):
        img = PVNetVisualizer._denorm(np.asarray(batch["inp"][0]))
        im = Image.fromarray(img)
        draw = ImageDraw.Draw(im)
        meta = batch["meta"][0] if batch.get("meta") else {}
        for ann in meta.get("anns", []):
            x, y, w, h = ann["bbox"]
            draw.rectangle([x, y, x + w, y + h], outline=(0, 255, 0), width=2)
        boxes = np.asarray(output["bboxes"][0], np.float32) * self.down_ratio
        scores = np.asarray(output["scores"][0], np.float32)
        for box, s in zip(boxes, scores):
            if s < self.score_thresh:
                continue
            # raw wh regression can be negative on an untrained detector;
            # PIL requires ordered corners
            x0, x1 = sorted((float(box[0]), float(box[2])))
            y0, y1 = sorted((float(box[1]), float(box[3])))
            draw.rectangle([x0, y0, x1, y1], outline=(64, 64, 255), width=2)
            draw.text((x0 + 2, y0 + 2), f"{s:.2f}", fill=(64, 64, 255))
        im.save(path)
        return path

    def visualize_train(self, batch: dict, path: str = "det_train_vis.png"):
        """GT-target inspection: boxes recovered from the ct_hm peak + wh
        training targets."""
        img = PVNetVisualizer._denorm(np.asarray(batch["inp"][0]))
        im = Image.fromarray(img)
        draw = ImageDraw.Draw(im)
        hm_w = np.asarray(batch["ct_hm"][0]).shape[1]
        ct_ind = np.asarray(batch["ct_ind"][0])
        wh = np.asarray(batch["wh"][0])
        valid = np.asarray(batch["ct_valid"][0]) > 0
        for ind, (w, h), ok in zip(ct_ind, wh, valid):
            if not ok:
                continue
            cx, cy = (ind % hm_w), (ind // hm_w)
            x0 = (cx - w / 2) * self.down_ratio
            y0 = (cy - h / 2) * self.down_ratio
            x1 = (cx + w / 2) * self.down_ratio
            y1 = (cy + h / 2) * self.down_ratio
            draw.rectangle([x0, y0, x1, y1], outline=(0, 255, 0), width=2)
        im.save(path)
        return path
