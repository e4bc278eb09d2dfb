"""Visualizers (vis/pvnet.py): pvnet pose overlays and ct detection overlays."""

import numpy as np
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.vis import make_visualizer


@pytest.fixture
def det_batch():
    rng = np.random.RandomState(0)
    inp = rng.rand(1, 64, 64, 3).astype(np.float32)
    ct_hm = np.zeros((1, 16, 16, 3), np.float32)
    ct_ind = np.zeros((1, 8), np.int32)
    wh = np.zeros((1, 8, 2), np.float32)
    ct_valid = np.zeros((1, 8), bool)
    ct_ind[0, 0] = 5 * 16 + 6
    wh[0, 0] = [4.0, 3.0]
    ct_valid[0, 0] = True
    return {
        "inp": inp,
        "ct_hm": ct_hm,
        "ct_ind": ct_ind,
        "wh": wh,
        "ct_valid": ct_valid,
        "meta": [{"anns": [{"bbox": [10.0, 12.0, 20.0, 16.0],
                            "category_id": 1}]}],
    }


def test_ct_visualizer_registered():
    cfg = Config().with_overrides({"task": "ct"})
    vis = make_visualizer(cfg)
    assert type(vis).__name__ == "DetectionVisualizer"


def test_ct_visualize_writes_image(tmp_path, det_batch):
    cfg = Config().with_overrides({"task": "ct"})
    vis = make_visualizer(cfg)
    output = {
        "bboxes": np.array([[[2.0, 3.0, 8.0, 9.0], [0, 0, 1, 1]]], np.float32),
        "scores": np.array([[0.9, 0.05]], np.float32),
        "classes": np.array([[0, 1]], np.int64),
    }
    path = vis.visualize(output, det_batch, path=str(tmp_path / "det.png"))
    from PIL import Image

    im = Image.open(path)
    assert im.size == (64, 64)


def test_ct_visualize_train_writes_image(tmp_path, det_batch):
    cfg = Config().with_overrides({"task": "ct"})
    vis = make_visualizer(cfg)
    path = vis.visualize_train(det_batch, path=str(tmp_path / "det_tr.png"))
    from PIL import Image

    im = Image.open(path)
    assert im.size == (64, 64)
    arr = np.asarray(im)
    # the GT box outline must actually be drawn (green-ish pixels present)
    assert (arr[..., 1].astype(int) - arr[..., 0] > 100).any()
