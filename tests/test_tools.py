"""Dataset-converter tests: build a custom-layout dataset from the synthetic
renderer, convert it, and load it through the standard dataset class."""

import json
import os
import shutil

import numpy as np
import pytest
from PIL import Image

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dataset_converters import (  # noqa: E402
    custom_to_coco,
    get_model_corners,
    sample_fps_points,
)

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data import LinemodDataset
from clean_pvnet_tpu.data.synthetic import generate_synthetic_dataset
from clean_pvnet_tpu.utils.ply import load_ply, save_ply


@pytest.fixture(scope="module")
def custom_root(tmp_path_factory):
    """Re-lay out a synthetic dataset in the reference's custom format
    (ref tools/handle_custom_dataset.py layout: model.ply camera.txt
    rgb/ mask/ pose/)."""
    base = tmp_path_factory.mktemp("as_custom")
    synth_root = base / "synth_src"
    meta = generate_synthetic_dataset(
        str(synth_root), cls="obj", n_train=4, n_test=0, hw=(96, 128), seed=1
    )
    root = base / "custom"
    for sub in ("rgb", "mask", "pose"):
        os.makedirs(root / sub)
    mesh = load_ply(meta["model_path"])
    save_ply(str(root / "model.ply"), mesh["pts"], mesh["faces"])
    np.savetxt(root / "camera.txt", meta["K"])
    with open(meta["train_json"]) as f:
        data = json.load(f)
    for i, (img, ann) in enumerate(zip(data["images"], data["annotations"])):
        shutil.copy(img["file_name"], root / "rgb" / f"{i}.jpg")
        Image.open(ann["mask_path"]).save(root / "mask" / f"{i}.png")
        np.save(root / "pose" / f"pose{i}.npy", np.asarray(ann["pose"]))
    return str(root), meta


class TestCustomConverter:
    def test_fps_written(self, custom_root):
        root, _ = custom_root
        fps = sample_fps_points(root)
        assert fps.shape == (8, 3)
        assert os.path.exists(os.path.join(root, "fps.txt"))

    def test_convert_and_load(self, custom_root):
        root, meta = custom_root
        path = custom_to_coco(root)
        with open(path) as f:
            data = json.load(f)
        assert len(data["images"]) == 4
        ann = data["annotations"][0]
        assert np.asarray(ann["fps_2d"]).shape == (8, 2)

        # the converted json loads through the standard dataset class
        ds = LinemodDataset(Config(), path, split="test")
        s = ds[(0, 96, 128)]
        assert s["inp"].shape == (96, 128, 3)
        assert s["mask"].sum() > 0

    def test_corners_ordering(self):
        pts = np.array([[0, 0, 0], [1, 2, 3]], float)
        c = get_model_corners(pts)
        assert c.shape == (8, 3)
        np.testing.assert_array_equal(c[0], [0, 0, 0])
        np.testing.assert_array_equal(c[7], [1, 2, 3])


class TestProfiling:
    def test_step_timer(self):
        from clean_pvnet_tpu.utils.profiling import StepTimer

        t = StepTimer()
        t.mark_data()
        t.mark_step()
        line = t.eta_line(1, 10)
        assert "eta" in line

    def test_memory_stats(self):
        from clean_pvnet_tpu.utils.profiling import device_memory_stats

        stats = device_memory_stats()
        assert isinstance(stats, dict)
