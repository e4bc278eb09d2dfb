import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data.catalog import DatasetCatalog
from clean_pvnet_tpu.analyzers import make_analyzer


class TestCatalog:
    def test_linemod_paths_templated(self):
        e = DatasetCatalog.get("LinemodTrain", data_root="data", cls_type="cat")
        assert e.ann_file == "data/linemod/cat/train.json"
        assert e.id == "LinemodTrain"
        assert e.split == "train"

    def test_occ_and_truncation(self):
        occ = DatasetCatalog.get("LinemodOccTest", cls_type="duck")
        assert "duck/occ.json" in occ.ann_file
        trunc = DatasetCatalog.get("TruncationLinemodTest", cls_type="ape")
        assert "truncation_linemod/ape.json" in trunc.ann_file

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            DatasetCatalog.get("NotADataset")

    def test_all_reference_families_present(self):
        # the reference catalog's families (ref dataset_catalog.py:5-92)
        for name in ("LinemodTrain", "LinemodTest", "LinemodOccTest",
                     "TlessTrain", "TlessTest", "TlessMini", "TlessPoseTrain",
                     "TlessPoseMini", "TlessPoseTest", "TlessAgTrain",
                     "YcbTrain", "YcbTest", "CustomTrain", "CustomTest"):
            DatasetCatalog.get(name)


class TestAnalyzer:
    def test_pvnet_analyzer_stats(self, rng):
        cfg = Config()
        analyzer = make_analyzer(cfg)
        seg = rng.randn(1, 16, 16, 2).astype(np.float32)
        seg[..., 1] += 2.0  # mostly foreground
        vertex = rng.randn(1, 16, 16, 18).astype(np.float32)
        out = {"seg": seg, "vertex": vertex,
               "inlier_ratio": np.full((1, 9), 0.8, np.float32),
               "mask": (seg[..., 1] > seg[..., 0]).astype(np.int32)}
        batch = {"mask": np.ones((1, 16, 16), np.int32)}
        stats = analyzer.analyze(out, batch)
        assert 0.9 < stats["fg_fraction"] <= 1.0
        assert stats["inlier_ratio_mean"] == pytest.approx(0.8)
        assert 0.9 < stats["mask_iou"] <= 1.0


class TestHourglass:
    def test_forward_shapes(self):
        from clean_pvnet_tpu.models.hourglass import StackedHourglass

        model = StackedHourglass(
            heads={"ct_hm": 3, "wh": 2}, num_stacks=1, depth=2,
            features=(32, 32, 48), head_conv=32,
        )
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        out = model.apply(variables, x, train=False)
        assert out["ct_hm"].shape == (1, 16, 16, 3)
        assert out["wh"].shape == (1, 16, 16, 2)

    def test_registry(self):
        from clean_pvnet_tpu.models import make_network
        import clean_pvnet_tpu.models.hourglass  # noqa: F401

        cfg = Config().with_overrides(
            {"network.name": "hourglass", "network.use_bfloat16": False}
        )
        net = make_network(cfg)
        assert net.num_stacks == 2


class TestDetectionDataset:
    def test_scene_batches(self, tmp_path):
        from clean_pvnet_tpu.data.detection import DetectionSceneDataset
        from clean_pvnet_tpu.data.synthetic import generate_multiobject_dataset
        from clean_pvnet_tpu.data.loader import DataLoader

        meta = generate_multiobject_dataset(
            str(tmp_path), num_classes=2, n_scenes=4, max_inst=2, hw=(96, 128),
            seed=0,
        )
        cfg = Config().with_overrides({"network.ct_num_classes": 2})
        ds = DetectionSceneDataset(cfg, meta["scenes_json"], num_classes=2)
        loader = DataLoader(ds, 2, buckets=((96, 128),), num_workers=1)
        batch = next(iter(loader))
        assert batch["inp"].shape == (2, 96, 128, 3)
        assert batch["ct_hm"].shape == (2, 24, 32, 2)
        assert batch["wh"].shape == (2, 32, 2)
        assert batch["ct_hm"].max() == 1.0


class TestLinearModel:
    def test_forward_and_registry(self):
        import jax
        import jax.numpy as jnp

        from clean_pvnet_tpu.config import Config
        from clean_pvnet_tpu.models import make_network

        cfg = Config().with_overrides(
            {"network.name": "linear", "network.use_bfloat16": False}
        )
        model = make_network(cfg)
        x = jnp.zeros((2, 8, 2))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out["quat"].shape == (2, 4)
        # train mode threads a dropout rng
        out_t = model.apply(variables, x, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"])
        assert out_t[0]["quat"].shape == (2, 4)
