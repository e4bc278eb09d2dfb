import json
import os

import numpy as np
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.data import DataLoader, LinemodDataset, make_data_loader
from clean_pvnet_tpu.data.augment import augment_pvnet, normalize_image
from clean_pvnet_tpu.data.synthetic import generate_synthetic_dataset, make_synthetic_mesh
from clean_pvnet_tpu.geometry import project
from clean_pvnet_tpu.ops.rasterize import render_mesh_np
from clean_pvnet_tpu.utils.image import resize, rotation_matrix_2d, warp_affine
from clean_pvnet_tpu.utils.ply import load_ply

import jax.numpy as jnp


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_data")
    meta = generate_synthetic_dataset(
        str(root), cls="obj", n_train=6, n_test=3, hw=(96, 128), seed=0
    )
    return root, meta


class TestImageOps:
    def test_warp_affine_identity(self, rng):
        img = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
        M = np.array([[1.0, 0, 0], [0, 1.0, 0]])
        out = warp_affine(img, M, (20, 30))
        np.testing.assert_array_equal(out, img)

    def test_rotation_moves_keypoint_consistently(self, rng):
        img = np.zeros((40, 40), np.uint8)
        img[10, 30] = 255
        M = rotation_matrix_2d((20, 20), 90.0)
        out = warp_affine(img, M, (40, 40), interp="nearest")
        pt = np.array([30.0, 10.0, 1.0])
        new = (np.concatenate([M, [[0, 0, 1]]], 0) @ pt)[:2]
        y, x = np.unravel_index(np.argmax(out), out.shape)
        assert abs(x - new[0]) <= 1 and abs(y - new[1]) <= 1

    def test_resize_shapes(self, rng):
        img = (rng.rand(33, 47, 3) * 255).astype(np.uint8)
        out = resize(img, (66, 94))
        assert out.shape == (66, 94, 3)


class TestRasterizer:
    def test_mask_and_depth_consistent(self, rng):
        verts, faces, colors = make_synthetic_mesh(0)
        K = np.array([[200.0, 0, 64], [0, 200.0, 48], [0, 0, 1]])
        rt = np.concatenate([np.eye(3), [[0], [0], [0.5]]], -1)
        color, depth, mask = render_mesh_np(verts, faces, K, rt, (96, 128), colors)
        assert mask.sum() > 200
        assert (depth[mask == 1] > 0.3).all()
        assert (depth[mask == 0] == 0).all()
        # projected vertex centroid inside mask bbox
        pix = np.asarray(project(jnp.asarray(verts), jnp.asarray(K), jnp.asarray(rt)))
        ys, xs = np.nonzero(mask)
        assert xs.min() - 2 <= pix[:, 0].mean() <= xs.max() + 2

    def test_jax_depth_matches_np(self, rng):
        from clean_pvnet_tpu.ops.rasterize import render_depth_jax

        verts, faces, _ = make_synthetic_mesh(1)
        K = np.array([[150.0, 0, 40], [0, 150.0, 32], [0, 0, 1]])
        rt = np.concatenate([np.eye(3), [[0], [0], [0.45]]], -1)
        _, depth_np, mask = render_mesh_np(verts, faces, K, rt, (64, 80))
        depth_j = np.asarray(
            render_depth_jax(
                jnp.asarray(verts, jnp.float32),
                jnp.asarray(faces, jnp.int32),
                jnp.asarray(K, jnp.float32),
                jnp.asarray(rt, jnp.float32),
                (64, 80),
                face_chunk=256,
            )
        )
        both = (mask == 1) & (depth_j > 0)
        assert both.sum() > 0.95 * mask.sum()
        diff = np.abs(depth_np[both] - depth_j[both])
        assert np.median(diff) < 1e-3


class TestSyntheticDataset:
    def test_schema_matches_reference_converter(self, synth_root):
        _, meta = synth_root
        with open(meta["train_json"]) as f:
            data = json.load(f)
        assert len(data["images"]) == 6
        ann = data["annotations"][0]
        for key in ("fps_2d", "fps_3d", "center_2d", "center_3d", "K", "pose",
                    "mask_path", "type", "cls"):
            assert key in ann, key
        assert np.asarray(ann["fps_2d"]).shape == (8, 2)
        assert np.asarray(ann["pose"]).shape == (3, 4)

    def test_keypoints_project_correctly(self, synth_root):
        _, meta = synth_root
        with open(meta["test_json"]) as f:
            ann = json.load(f)["annotations"][0]
        got = np.asarray(
            project(
                jnp.asarray(np.asarray(ann["fps_3d"], np.float32)),
                jnp.asarray(np.asarray(ann["K"], np.float32)),
                jnp.asarray(np.asarray(ann["pose"], np.float32)),
            )
        )
        np.testing.assert_allclose(got, np.asarray(ann["fps_2d"]), atol=0.1)

    def test_ply_round_trip(self, synth_root):
        _, meta = synth_root
        mesh = load_ply(meta["model_path"])
        verts, _, _ = make_synthetic_mesh(0)
        np.testing.assert_allclose(mesh["pts"], verts, atol=1e-4)
        assert mesh["faces"].shape[1] == 3

    def test_occluder_augmented_training_split(self, tmp_path):
        """occlude_frac composites distractors into TRAIN images: the saved
        mask must be the VISIBLE-pixel subset of a clean re-render (the
        reference's fuse-record convention, ref linemod_to_coco.py:260-301)
        and a solid majority of images must actually lose pixels."""
        from PIL import Image

        from clean_pvnet_tpu.ops.rasterize import render_mesh_np as rmn

        meta = generate_synthetic_dataset(
            str(tmp_path), cls="obj", n_train=6, n_test=2, hw=(96, 128),
            seed=0, occlude_frac=1.0,
        )
        with open(meta["train_json"]) as f:
            data = json.load(f)
        verts, faces, colors = make_synthetic_mesh(0)
        occluded = 0
        for ann in data["annotations"]:
            saved = np.asarray(Image.open(ann["mask_path"])) > 0
            K = np.asarray(ann["K"])
            rt = np.asarray(ann["pose"])
            _, _, full = rmn(verts, faces, K, rt, (96, 128), colors)
            full = full.astype(bool)
            # visible mask ⊆ full render, and annotation pose still exact
            assert not (saved & ~full).any()
            ratio = saved.sum() / max(full.sum(), 1)
            assert ratio >= 0.3  # never occluded into oblivion
            if ratio < 0.97:
                occluded += 1
        assert occluded >= 3, occluded

        # test split stays clean (occluders are train-only augmentation)
        with open(meta["test_json"]) as f:
            tdata = json.load(f)
        for ann in tdata["annotations"]:
            saved = np.asarray(Image.open(ann["mask_path"])) > 0
            _, _, full = rmn(verts, faces, np.asarray(ann["K"]),
                             np.asarray(ann["pose"]), (96, 128), colors)
            assert (saved == full.astype(bool)).all()

    def test_truncation_augmented_training_split(self, tmp_path):
        """truncate_frac poses TRAIN targets at a frame border (the
        Truncation-LINEMOD family, ref TRUNCATION_LINEMOD.md): a majority
        of images must have keypoints projecting outside the frame, every
        image keeps >=64 visible pixels, and mesh_seed pins the object
        identity while the pose rng differs."""
        from PIL import Image

        meta = generate_synthetic_dataset(
            str(tmp_path), cls="obj", n_train=8, n_test=2, hw=(96, 128),
            seed=31, mesh_seed=0, truncate_frac=1.0,
        )
        # mesh_seed=0 → identical keypoints/diameter to the seed-0 object
        ref_mesh = make_synthetic_mesh(0)[0]
        d2 = ((ref_mesh[:, None] - ref_mesh[None]) ** 2).sum(-1)
        np.testing.assert_allclose(
            meta["diameter"], float(np.sqrt(d2.max())), rtol=1e-6
        )
        with open(meta["train_json"]) as f:
            data = json.load(f)
        truncated = 0
        for ann in data["annotations"]:
            saved = np.asarray(Image.open(ann["mask_path"])) > 0
            assert saved.sum() >= 64
            kpt = np.asarray(ann["fps_2d"])
            out = ((kpt[:, 0] < 0) | (kpt[:, 0] >= 128)
                   | (kpt[:, 1] < 0) | (kpt[:, 1] >= 96))
            if out.any():
                truncated += 1
        assert truncated >= 5, truncated


class TestLinemodDataset:
    def test_getitem_test_split(self, synth_root):
        _, meta = synth_root
        cfg = Config()
        ds = LinemodDataset(cfg, meta["test_json"], split="test")
        s = ds[(0, 96, 128)]
        assert s["inp"].shape == (96, 128, 3)
        assert s["mask"].shape == (96, 128)
        assert s["vertex"].shape == (96, 128, 18)
        assert s["mask"].sum() > 0
        # vertex field points at gt keypoints on foreground pixels
        ys, xs = np.nonzero(s["mask"])
        v = s["vertex"].reshape(96, 128, 9, 2)[ys[0], xs[0]]
        d = s["kpt_2d"] - np.array([xs[0], ys[0]])
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        np.testing.assert_allclose(v, d, atol=1e-3)

    def test_getitem_train_augmented(self, synth_root):
        _, meta = synth_root
        cfg = Config()
        ds = LinemodDataset(cfg, meta["train_json"], split="train", seed=1)
        s = ds[(0, 96, 128)]
        assert s["inp"].shape == (96, 128, 3)
        assert s["vertex"].shape == (96, 128, 18)

    def test_loader_batches(self, synth_root):
        _, meta = synth_root
        cfg = Config().with_overrides(
            {"train.batch_size": 2, "train.image_buckets": ((96, 128),),
             "train.num_workers": 2, "train.dataset": "LinemodTrain"}
        )
        loader = make_data_loader(cfg, is_train=True, ann_file=meta["train_json"])
        batches = list(loader)
        assert len(batches) == 3
        for b in batches:
            assert b["inp"].shape == (2, 96, 128, 3)
            assert b["mask"].shape == (2, 96, 128)
            assert b["vertex"].shape == (2, 96, 128, 18)

    def test_loader_bucket_choice(self, synth_root):
        _, meta = synth_root
        cfg = Config()
        ds = LinemodDataset(cfg, meta["train_json"], split="train")
        loader = DataLoader(ds, 2, buckets=((64, 96), (96, 128)), seed=0,
                            num_workers=1)
        shapes = {b["inp"].shape[1:3] for b in loader}
        assert shapes <= {(64, 96), (96, 128)}


class TestMultiHostSharding:
    """Per-host loader slices (data/loader.py process_index/process_count)."""

    class _Toy:
        def __len__(self):
            return 32

        def __getitem__(self, t):
            i, h, w = t
            import numpy as np
            return {"inp": np.full((2, 2), i, np.float32), "idx": i}

    def test_hosts_partition_each_batch(self):
        from clean_pvnet_tpu.data.loader import DataLoader

        loaders = [
            DataLoader(self._Toy(), 8, shuffle=True, seed=3, num_workers=1,
                       buckets=((2, 2), (4, 4)), process_index=p,
                       process_count=2)
            for p in range(2)
        ]
        full = DataLoader(self._Toy(), 8, shuffle=True, seed=3, num_workers=1,
                          buckets=((2, 2), (4, 4)))
        got = [l._index_batches() for l in loaders]
        want = full._index_batches()
        assert len(got[0]) == len(got[1]) == len(want)
        for b0, b1, bw in zip(got[0], got[1], want):
            # same bucket draw on every host
            assert {t[1:] for t in b0} == {t[1:] for t in b1} == {t[1:] for t in bw}
            # disjoint halves that reassemble the global batch
            i0 = [t[0] for t in b0]
            i1 = [t[0] for t in b1]
            assert len(i0) == len(i1) == 4
            assert set(i0).isdisjoint(i1)
            assert sorted(i0 + i1) == sorted(t[0] for t in bw)

    def test_uneven_batch_rejected(self):
        from clean_pvnet_tpu.data.loader import DataLoader

        import pytest as _pytest
        with _pytest.raises(ValueError):
            DataLoader(self._Toy(), 9, process_index=0, process_count=2)


class TestLoaderOrdering:
    """Multi-worker prefetch must preserve logical batch order (multi-host
    SPMD requires every host to emit logical batch k at step k)."""

    class _SlowToy:
        def __len__(self):
            return 24

        def __getitem__(self, t):
            import time

            import numpy as np

            i, h, w = t
            # odd indices are slow: thread-completion order != logical order
            if i % 2:
                time.sleep(0.02)
            return {"idx": np.asarray(i)}

    def test_multiworker_yields_in_index_order(self):
        from clean_pvnet_tpu.data.loader import DataLoader

        loader = DataLoader(self._SlowToy(), 2, shuffle=True, seed=7,
                            num_workers=4, buckets=((2, 2),))
        want = [[t[0] for t in b] for b in loader._index_batches()]
        # reset rng so __iter__ regenerates the same plan
        loader.rng = __import__("numpy").random.RandomState(7)
        got = [list(map(int, b["idx"])) for b in loader]
        assert got == want
