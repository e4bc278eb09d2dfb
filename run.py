"""Multi-tool CLI.

Counterpart of reference run.py:6-276 and its `--type` subcommands
(evaluate / visualize / dataset / network / synthetic data prep), dispatched
through an explicit table instead of `globals()['run_'+type]`.

  python run.py --type synthetic data_root data            # make data
  python run.py --type dataset --cfg_file configs/synthetic.yaml
  python run.py --type network --cfg_file configs/synthetic.yaml
  python run.py --type evaluate --cfg_file configs/synthetic.yaml
  python run.py --type visualize --cfg_file configs/synthetic.yaml
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def run_synthetic(cfg, args):
    """Generate the synthetic LINEMOD-style dataset (stand-in for the
    reference's linemod_to_coco data prep, ref run.py:169-171)."""
    from clean_pvnet_tpu.data.synthetic import generate_synthetic_dataset

    meta = generate_synthetic_dataset(
        cfg.data_root, cls=cfg.cls_type, n_train=args.n_train,
        n_test=args.n_test, depth=True,
    )
    print({k: v for k, v in meta.items() if isinstance(v, (str, float))})


def run_dataset(cfg, args):
    """Iterate the train loader (smoke test, ref run.py:22-29)."""
    from clean_pvnet_tpu.data import make_data_loader
    from train_net import resolve_ann
    import tqdm  # type: ignore

    loader = make_data_loader(cfg, is_train=True,
                              ann_file=resolve_ann(cfg, is_train=True))
    for _ in tqdm.tqdm(loader):
        pass


def run_network(cfg, args):
    """Time forward passes (ref run.py:32-56)."""
    import jax
    import jax.numpy as jnp

    from clean_pvnet_tpu.models import make_network

    model = make_network(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x = jnp.zeros((1, 480, 640, 3))
    out = fwd(variables, x)
    jax.block_until_ready(out["seg"])
    t0 = time.time()
    n = 50
    for _ in range(n):
        out = fwd(variables, x)
    jax.block_until_ready(out["seg"])
    print(f"net fwd: {(time.time()-t0)/n*1000:.2f} ms/frame")


def _load_eval_stack(cfg):
    import jax

    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.train import CheckpointIO, Trainer
    from clean_pvnet_tpu.parallel import make_mesh
    from train_net import build_eval

    model = make_network(cfg)
    mesh = make_mesh(cfg.mesh)
    trainer = Trainer(cfg, model, steps_per_epoch=1, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ckpt = CheckpointIO(os.path.join(cfg.model_dir, cfg.task, cfg.model))
    state, epoch = ckpt.restore(state, cfg.test.epoch)
    print(f"loaded epoch {epoch}")
    return model, state


def run_evaluate(cfg, args):
    """(ref run.py:59-81)"""
    from train_net import build_eval, run_eval

    model, state = _load_eval_stack(cfg)
    loader, pipeline, evaluator = build_eval(cfg, model)
    print(run_eval(cfg, model, state, loader, pipeline, evaluator))


def run_visualize(cfg, args):
    """(ref run.py:84-100)"""
    import jax
    import jax.numpy as jnp

    from clean_pvnet_tpu.vis import make_visualizer
    from train_net import build_eval

    model, state = _load_eval_stack(cfg)
    loader, pipeline, evaluator = build_eval(cfg, model)
    vis = make_visualizer(cfg)
    for i, batch in enumerate(loader):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if cfg.task == "ct":
            out = pipeline(variables, jnp.asarray(batch["inp"]))
        else:
            K = jnp.asarray(
                np.stack(
                    [np.asarray(m["ann"]["K"], np.float32) for m in batch["meta"]]
                )
            )
            out = pipeline(variables, jnp.asarray(batch["inp"]), K,
                           jax.random.PRNGKey(i))
        path = vis.visualize(out, batch, path=f"vis_{i:03d}.png")
        print("wrote", path)
        if i >= args.n_vis - 1:
            break


def run_analyze(cfg, args):
    """Output-statistics inspection (ref run.py:129-150 run_analyze)."""
    import jax
    import jax.numpy as jnp

    from clean_pvnet_tpu.analyzers import make_analyzer
    from train_net import build_eval

    model, state = _load_eval_stack(cfg)
    loader, pipeline, evaluator = build_eval(cfg, model)
    analyzer = make_analyzer(cfg)
    for i, batch in enumerate(loader):
        K = jnp.asarray(
            np.stack([np.asarray(m["ann"]["K"], np.float32) for m in batch["meta"]])
        )
        out = pipeline(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(batch["inp"]), K, jax.random.PRNGKey(i),
        )
        print(analyzer.analyze(out, batch))
        if i >= 3:
            break


def run_demo(cfg, args):
    """Pose prediction on raw images without GT (ref run.py demo path +
    lib/visualizers/linemod/pvnet.py:49-64 visualize_demo)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from clean_pvnet_tpu.data.augment import normalize_image
    from clean_pvnet_tpu.vis.pvnet import draw_keypoints

    model, state = _load_eval_stack(cfg)
    demo_dir = getattr(args, "demo_path", None) or os.path.join(
        cfg.data_root, "demo"
    )
    names = sorted(os.listdir(demo_dir))[: args.n_vis]
    from clean_pvnet_tpu.models import decode_keypoints

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    for i, name in enumerate(names):
        img = np.asarray(PILImage.open(os.path.join(demo_dir, name)).convert("RGB"))
        inp = jnp.asarray(normalize_image(img)[None])
        out = fwd({"params": state.params, "batch_stats": state.batch_stats}, inp)
        dec = decode_keypoints(out["seg"], out["vertex"], jax.random.PRNGKey(i), cfg)
        vis = draw_keypoints(img, np.asarray(dec["kpt_2d"][0]))
        path = f"demo_{i:03d}.png"
        PILImage.fromarray(vis).save(path)
        print("wrote", path)


def run_detector_pvnet(cfg, args):
    """Detector→PVNet cascade inference over multi-instance scenes
    (ref run.py:225-244 run_detector_pvnet)."""
    import jax
    import jax.numpy as jnp

    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.models.cascade import CascadePipeline
    from clean_pvnet_tpu.train import CheckpointIO, Trainer
    from clean_pvnet_tpu.parallel import make_mesh
    from clean_pvnet_tpu.data.detection import DetectionSceneDataset
    from clean_pvnet_tpu.data.loader import DataLoader

    det_cfg = cfg.with_overrides({"network.name": "dla34", "task": "ct"})
    pvnet_cfg = cfg.with_overrides({"network.name": "res18", "task": "pvnet"})
    detector = make_network(det_cfg)
    pvnet = make_network(pvnet_cfg)
    mesh = make_mesh(cfg.mesh)

    # load both trained models (ref ct_pvnet/res.py:63-72)
    det_tr = Trainer(det_cfg, detector, 1, mesh=mesh)
    det_state = det_tr.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3))
    det_state, _ = CheckpointIO(
        os.path.join(cfg.model_dir, "ct", cfg.model)
    ).restore(det_state)
    pv_tr = Trainer(pvnet_cfg, pvnet, 1, mesh=mesh)
    pv_state = pv_tr.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3))
    pv_state, _ = CheckpointIO(
        os.path.join(cfg.model_dir, "pvnet", cfg.model)
    ).restore(pv_state)

    pipe = CascadePipeline(pvnet_cfg, detector, pvnet)
    scenes = os.path.join(cfg.data_root, "scenes.json")
    ds = DetectionSceneDataset(cfg, scenes)
    loader = DataLoader(ds, 1, shuffle=False, buckets=((256, 320),),
                        num_workers=1, drop_last=False)
    for i, batch in enumerate(loader):
        out = pipe(
            {"params": det_state.params, "batch_stats": det_state.batch_stats},
            {"params": pv_state.params, "batch_stats": pv_state.batch_stats},
            jnp.asarray(batch["inp"]),
            jax.random.PRNGKey(i),
        )
        n = int(np.asarray(out["valid"][0]).sum())
        print(f"scene {i}: {n} instances, scores",
              np.asarray(out["scores"][0])[:n])
        if i >= args.n_vis - 1:
            break


def run_custom(cfg, args):
    """FPS keypoint sampling + COCO conversion for a custom dataset
    (ref run.py:218-222, tools/handle_custom_dataset.py:19-116)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from dataset_converters import custom_to_coco, sample_fps_points

    root = os.path.join(cfg.data_root, "custom")
    fps = sample_fps_points(root)
    print("fps_3d:\n", fps)
    out = custom_to_coco(root, cls=cfg.cls_type)
    print("wrote", out)


def run_linemod(cfg, args):
    """LINEMOD → COCO-style json (ref run.py:169-171, linemod_to_coco.py)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from dataset_converters import linemod_to_coco

    root = os.path.join(cfg.data_root, "linemod")
    for split in ("train", "test"):
        out = linemod_to_coco(
            root, cfg.cls_type,
            os.path.join(root, cfg.cls_type, f"{split}.txt"),
            os.path.join(root, cfg.cls_type, f"{split}.json"),
        )
        print("wrote", out)


def run_tless(cfg, args):
    """Generate multi-instance T-LESS-style scenes with per-instance pose
    annotations — the rasterizer-based stand-in for the reference's Blender
    render + cut-paste fusion prep (ref run.py:174-190,
    lib/datasets/tless/handle_rendering_data.py, fuse.py)."""
    from clean_pvnet_tpu.data.synthetic import generate_multiobject_dataset

    meta = generate_multiobject_dataset(
        os.path.join(cfg.data_root, "tless_scenes"),
        num_classes=args.n_classes,
        n_scenes=args.n_train,
        bg_dir=args.bg_dir,
    )
    print({k: v for k, v in meta.items() if isinstance(v, (str, int, float))})


def run_ycb(cfg, args):
    """YCB-Video → COCO-style pose json (working equivalent of the
    reference's dangling `run.py --type ycb` → handle_ycb.collect_ycb,
    ref run.py:193-195 — that module does not exist upstream)."""
    from clean_pvnet_tpu.data.ycb import collect_ycb

    root = os.path.join(cfg.data_root, "ycb")
    for split in ("train", "val"):
        listing = os.path.join(root, "image_sets", f"{split}.txt")
        if not os.path.exists(listing):
            print(f"skip {split}: no {listing}")
            continue
        out = collect_ycb(root, cfg.cls_type, split=split)
        print("wrote", out)


def run_tless_real(cfg, args):
    """Convert REAL T-LESS data (BOP-classic primesense layout) to pose
    COCO jsons: per-object train sets with symmetry-rectified poses and
    multi-instance test scenes with rendered visibility masks
    (ref run.py:174-190, lib/datasets/tless/tless_to_coco.py,
    handle_test_data.py). Uses --n_classes as the object/scene count."""
    from tools.dataset_converters import tless_test_to_coco, tless_train_to_coco

    root = os.path.join(cfg.data_root, "tless")
    for obj_id in range(1, args.n_classes + 1):
        obj_dir = os.path.join(root, "train_primesense", f"{obj_id:02d}")
        if not os.path.isdir(obj_dir):
            print(f"skip obj {obj_id}: {obj_dir} not found")
            continue
        print("train:", tless_train_to_coco(root, obj_id))
    scene_ids = [
        s for s in range(1, args.n_classes + 1)
        if os.path.isdir(os.path.join(root, "test_primesense", f"{s:02d}"))
    ]
    if scene_ids:
        out = os.path.join(root, "cache", "test.json")
        print("test:", tless_test_to_coco(root, scene_ids, out))


def run_render(cfg, args):
    """Render color+depth of the object mesh from a random pose with the
    z-buffer rasterizer (ref run.py --type render / opengl renderers)."""
    from PIL import Image as PILImage

    from clean_pvnet_tpu.ops.rasterize import render_mesh_np
    from clean_pvnet_tpu.utils.ply import load_ply
    from clean_pvnet_tpu.data.synthetic import LINEMOD_K, random_rotation

    ply_path = os.path.join(cfg.data_root, cfg.cls_type,
                            f"{cfg.cls_type}.ply")
    model = load_ply(ply_path)
    verts, faces = model["pts"], model["faces"]
    colors = model["colors"]
    if colors is not None:
        colors = colors.astype(np.float32) / 255.0
    rng = np.random.RandomState(0)
    pose = np.concatenate(
        [random_rotation(rng), np.array([[0.0], [0.0], [0.5]])], axis=1
    ).astype(np.float32)
    color, depth, mask = render_mesh_np(
        verts, faces, LINEMOD_K, pose, (480, 640), vert_colors=colors
    )
    PILImage.fromarray((color * 255).astype(np.uint8)).save("render_color.png")
    mask = mask.astype(bool)
    d = depth.copy()
    if mask.any():
        d[~mask] = 0
        d = (d / d.max() * 255).astype(np.uint8)
    else:
        d = np.zeros_like(d, np.uint8)
    PILImage.fromarray(d).save("render_depth.png")
    print("wrote render_color.png render_depth.png; visible px:",
          int(mask.sum()))


def run_visualize_train(cfg, args):
    """Render GT training targets to images — the reference's de-facto data
    pipeline check (ref lib/visualizers/linemod/pvnet.py:66-82)."""
    from clean_pvnet_tpu.data import make_data_loader
    from clean_pvnet_tpu.vis import make_visualizer
    from train_net import resolve_ann

    loader = make_data_loader(cfg, is_train=True,
                              ann_file=resolve_ann(cfg, is_train=True))
    vis = make_visualizer(cfg)
    for i, batch in enumerate(loader):
        path = vis.visualize_train(batch, path=f"train_vis_{i:03d}.png")
        print("wrote", path)
        if i >= args.n_vis - 1:
            break


def run_import_torch(cfg, args):
    """Convert a reference torch checkpoint (`<epoch>.pth`) into a framework
    checkpoint so `--type evaluate` / `train_net.py --test` can use it:
    reference users bring their trained PVNet along (ref net_utils.py:306-324
    weights-only loading is the counterpart path)."""
    import jax

    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.parallel import make_mesh
    from clean_pvnet_tpu.train import CheckpointIO, Trainer
    from train_net import torch_init

    if not args.torch_ckpt:
        raise SystemExit("--torch_ckpt PATH is required for --type import_torch")
    model = make_network(cfg)
    mesh = make_mesh(cfg.mesh)
    trainer = Trainer(cfg, model, steps_per_epoch=1, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3))
    state = torch_init(state, args.torch_ckpt)
    epoch = cfg.test.epoch if cfg.test.epoch >= 0 else 0
    ckpt = CheckpointIO(os.path.join(cfg.model_dir, cfg.task, cfg.model))
    ckpt.save(state, epoch, wait=True)
    print(f"imported {args.torch_ckpt} -> "
          f"{os.path.join(cfg.model_dir, cfg.task, cfg.model)} epoch {epoch}")


COMMANDS = {
    "synthetic": run_synthetic,
    "custom": run_custom,
    "linemod": run_linemod,
    "tless": run_tless,
    "tless_real": run_tless_real,
    "ycb": run_ycb,
    "render": run_render,
    "visualize_train": run_visualize_train,
    "detector_pvnet": run_detector_pvnet,
    "dataset": run_dataset,
    "network": run_network,
    "evaluate": run_evaluate,
    "visualize": run_visualize,
    "analyze": run_analyze,
    "demo": run_demo,
    "import_torch": run_import_torch,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--type", required=True, choices=sorted(COMMANDS))
    parser.add_argument("--cfg_file", default=None)
    parser.add_argument("--n_train", type=int, default=200)
    parser.add_argument("--n_test", type=int, default=50)
    parser.add_argument("--n_vis", type=int, default=4)
    parser.add_argument("--n_classes", type=int, default=3)
    parser.add_argument("--bg_dir", default=None,
                        help="directory of real background photos for scene "
                             "composition (SUN2012-style, ref "
                             "tless_train/pvnet.py:33-125); procedural "
                             "textures when omitted")
    parser.add_argument("--torch_ckpt", default=None,
                        help="path to a reference .pth for --type import_torch")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from clean_pvnet_tpu.config import load_config
    from clean_pvnet_tpu.utils.cache import apply_platform, enable_compilation_cache

    cfg = load_config(args.cfg_file, args.opts)
    apply_platform(cfg.platform)
    enable_compilation_cache()
    COMMANDS[args.type](cfg, args)


if __name__ == "__main__":
    main()
