"""Training/eval entry point.

Counterpart of reference train_net.py:10-57: build network/trainer/loaders
from config, auto-resume, run the epoch loop with periodic save + eval.

Usage:
  python train_net.py --cfg_file configs/synthetic.yaml [--test] [k v ...]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: keep this module's imports jax-"cold": nothing here may create a
# jax array at import time, so that main() can still force the platform
# (cfg.platform → apply_platform) before the first backend use.
from clean_pvnet_tpu.config import load_config
from clean_pvnet_tpu.data import make_data_loader
from clean_pvnet_tpu.eval import InferencePipeline, LinemodEvaluator
from clean_pvnet_tpu.models import make_network
from clean_pvnet_tpu.parallel import make_mesh, shard_batch
from clean_pvnet_tpu.train import CheckpointIO, Recorder, Trainer
from clean_pvnet_tpu.utils.ply import load_ply


_TASK_BATCH_KEYS = {
    # pvnet keys are a superset (host vertex-target, on-device vertex-target,
    # and raw/device-augment layouts); ct stays strict so a malformed batch
    # fails here, not deep inside the jitted step
    "pvnet": ("inp", "inp_u8", "mask", "vertex", "kpt_2d"),
    "ct": ("inp", "ct_hm", "ct_ind", "wh", "ct_valid"),
}


def _strip(batch, task: str = "pvnet"):
    keys = _TASK_BATCH_KEYS[task]
    if task == "pvnet":
        out = {k: batch[k] for k in keys if k in batch}
        if ("inp" not in out and "inp_u8" not in out) or "mask" not in out:
            raise KeyError(
                f"pvnet batch must carry (inp|inp_u8) and mask; got {sorted(batch)}"
            )
        return out
    return {k: batch[k] for k in keys}


def resolve_ann(cfg, is_train: bool) -> str:
    """Annotation path for the configured dataset: DatasetCatalog template
    first (ref train path resolution through dataset_catalog.py), falling
    back to the flat synthetic layout `{data_root}/{cls}_{split}.json`."""
    from clean_pvnet_tpu.data.catalog import DatasetCatalog

    name = cfg.train.dataset if is_train else cfg.test.dataset
    try:
        entry = DatasetCatalog.get(name, cfg.data_root, cfg.cls_type)
        if os.path.exists(entry.ann_file):
            return entry.ann_file
    except KeyError:
        pass
    scenes = os.path.join(cfg.data_root, "tless_scenes", "scenes.json")
    if (name.startswith(("Tless", "Detection"))
            and os.path.exists(scenes)):
        return scenes
    split = "train" if is_train else "test"
    return os.path.join(cfg.data_root, f"{cfg.cls_type}_{split}.json")


def build_eval(cfg, model):
    if cfg.task == "ct":
        return build_eval_ct(cfg, model)
    if cfg.test.dataset.startswith("TlessPose"):
        return build_eval_tless_pose(cfg, model)
    ann = resolve_ann(cfg, is_train=False)
    loader = make_data_loader(cfg, is_train=False, ann_file=ann)
    first = loader.dataset.coco.load_anns(loader.dataset.img_ids[0])[0]
    kpt_3d = np.concatenate(
        [np.asarray(first["fps_3d"]), [np.asarray(first["center_3d"])]], 0
    )
    cls_dir = os.path.join(cfg.data_root, cfg.cls_type)
    mesh_ply = load_ply(os.path.join(cls_dir, f"{cfg.cls_type}.ply"))
    with open(os.path.join(cls_dir, "diameter.txt")) as f:
        diameter = float(f.read())
    pipeline = InferencePipeline(cfg, model, kpt_3d)
    icp_refiner = None
    if cfg.test.icp:
        from clean_pvnet_tpu.eval.icp import make_linemod_refiner

        if mesh_ply.get("faces") is None:
            print("warning: test.icp set but the class mesh has no faces; "
                  "skipping ICP refinement")
        else:
            icp_refiner = make_linemod_refiner(
                mesh_ply["pts"], mesh_ply["faces"], cfg.test.icp_render_hw
            )
    evaluator = LinemodEvaluator(cfg, mesh_ply["pts"], diameter,
                                 icp_refiner=icp_refiner)
    return loader, pipeline, evaluator


def build_eval_tless_pose(cfg, model):
    """Two-stage multi-instance pose eval: detection crops → PVNet → PnP in
    crop frame (crop K = A·K for the similarity crop A, so the recovered
    pose is directly in the camera frame) → match to GT per image
    (ref lib/evaluators/tless_test/pvnet.py, lib/datasets/tless_test/pvnet.py)."""
    from clean_pvnet_tpu.data.loader import DataLoader
    from clean_pvnet_tpu.data.tless_pose import (
        DetectionPoseDataset,
        crop_transform,
    )
    from clean_pvnet_tpu.eval.tless import TlessEvaluator, TlessPoseEvalDriver

    ann = resolve_ann(cfg, is_train=False)
    det_file = os.path.join(cfg.result_dir, "detections.json")
    ds = DetectionPoseDataset(
        cfg, ann, det_file=det_file if os.path.exists(det_file) else None
    )
    # per-object run: keep only this class's detections (ref per-object
    # tless_XX configs; category name obj_XX ↔ cls_type "XX")
    cls_filter = None
    want = cfg.cls_type if cfg.cls_type.startswith("obj_") else (
        f"obj_{int(cfg.cls_type):02d}" if cfg.cls_type.isdigit() else None
    )
    if want is not None:
        for cat in ds.coco.categories:
            if cat["name"] == want:
                cls_filter = int(cat["id"]) - 1
                break
    if cls_filter is not None:
        ds.index = [e for e in ds.index if e["cls"] == cls_filter]
    s = ds.crop_size
    loader = DataLoader(ds, cfg.test.batch_size, shuffle=False,
                        buckets=((s, s),), num_workers=cfg.train.num_workers,
                        drop_last=False)

    # per-class model points/diameters from the asset dirs next to the json
    root = os.path.dirname(os.path.abspath(ann))
    class_dirs = sorted(
        d for d in os.listdir(root)
        if d.startswith("obj_") and os.path.isdir(os.path.join(root, d))
    )
    from clean_pvnet_tpu.eval.metrics import mesh_diameter

    class_models = []
    class_meshes = []
    for d in class_dirs:
        ply = load_ply(os.path.join(root, d, f"{d}.ply"))
        pts = ply["pts"]
        class_models.append({"pts": pts, "diameter": mesh_diameter(pts)})
        class_meshes.append((pts, ply.get("faces")))

    # kpt_3d must come from the evaluated class, not whichever annotation
    # happens to be first in the json
    first_ann = None
    for img_id in ds.coco.get_img_ids():
        for a in ds.coco.load_anns(img_id):
            if cls_filter is None or int(a["category_id"]) - 1 == cls_filter:
                first_ann = a
                break
        if first_ann is not None:
            break
    if first_ann is None:
        raise ValueError(
            f"no annotations for class filter {cls_filter} in {ann}"
        )
    kpt_3d = np.concatenate(
        [np.asarray(first_ann["fps_3d"]), [np.asarray(first_ann["center_3d"])]], 0
    )
    pipeline = InferencePipeline(cfg, model, kpt_3d)
    info = ds.coco.load_img(ds.coco.get_img_ids()[0])
    hw = (info.get("height", 480), info.get("width", 640))
    def crop_K(meta):
        M = crop_transform(meta["crop_center"], meta["crop_size"], s)
        A = np.array([[M[0, 0], 0, M[0, 2]], [0, M[1, 1], M[1, 2]], [0, 0, 1]])
        K = np.asarray(
            meta["ann"]["K"] if meta["ann"] is not None
            else first_ann["K"], np.float64,
        )
        return (A @ K).astype(np.float32)

    # depth-dependent refinement/metrics (ref tless_test/pvnet.py:60-61:
    # one renderer-backed refiner per evaluated object; VSD renders both
    # est and GT depth per mesh)
    vsd_meshes = None
    if cfg.test.vsd:
        missing = [i for i, (_, f) in enumerate(class_meshes) if f is None]
        if missing:
            print("warning: test.vsd set but class meshes lack faces "
                  f"({missing}); skipping VSD")
        else:
            vsd_meshes = class_meshes
    icp_refiners = None
    if cfg.test.icp:
        from clean_pvnet_tpu.eval.icp import ICPRefiner

        icp_refiners = [
            ICPRefiner(verts, faces, hw) if faces is not None else None
            for verts, faces in class_meshes
        ]
        if all(r is None for r in icp_refiners):
            print("warning: test.icp set but no class mesh has faces; "
                  "skipping ICP refinement")
            icp_refiners = None

    evaluator = TlessEvaluator(cfg, class_models, hw, vsd_meshes=vsd_meshes)
    driver = TlessPoseEvalDriver(cfg, evaluator, ds.coco,
                                 cls_filter=cls_filter, crop_K=crop_K,
                                 icp_refiners=icp_refiners)
    return loader, pipeline, driver


def build_eval_ct(cfg, model):
    """Detector-task eval stack: decode heatmaps → AP@0.5
    (ref lib/evaluators/tless_test/ct.py)."""
    from clean_pvnet_tpu.eval.tless import DetectionEvaluator
    from clean_pvnet_tpu.models.centernet import decode_ct_heatmap

    ann = resolve_ann(cfg, is_train=False)
    loader = make_data_loader(cfg, is_train=False, ann_file=ann)

    @jax.jit
    def _det_pipeline(variables, inp):
        out = model.apply(variables, inp, train=False)
        return {**out, **decode_ct_heatmap(out["ct_hm"], out["wh"])}

    return loader, lambda v, inp, K=None, key=None: _det_pipeline(v, inp), \
        DetectionEvaluator(cfg)


def torch_init(state, path: str):
    """Initialize a TrainState's variables from a torch `.pth`: either a full
    reference PVNet checkpoint (resnet18_8s.* keys) or a torchvision ImageNet
    resnet18 state dict (backbone-only; the reference's pretrained init)."""
    from clean_pvnet_tpu.models.torch_import import (
        import_pvnet_state_dict,
        import_resnet_backbone,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(path)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if any(k.startswith("resnet18_8s.") for k in sd):
        new_vars = import_pvnet_state_dict(sd, variables)
    else:
        new_vars = import_resnet_backbone(sd, variables)
    new_vars = jax.tree.map(jnp.asarray, new_vars)
    return state.replace(
        params=new_vars["params"], batch_stats=new_vars["batch_stats"]
    )


def run_eval(cfg, model, state, loader, pipeline, evaluator):
    if cfg.task == "ct":
        for batch in loader:
            out = pipeline(
                {"params": state.params, "batch_stats": state.batch_stats},
                jnp.asarray(batch["inp"]),
            )
            evaluator.evaluate(out, batch)
        return evaluator.summarize()
    crop_K = getattr(evaluator, "crop_K", None)
    for i, batch in enumerate(loader):
        if crop_K is not None:
            K = jnp.asarray(np.stack([crop_K(m) for m in batch["meta"]]))
        else:
            K = jnp.asarray(
                np.stack(
                    [np.asarray(m["ann"]["K"], np.float32) for m in batch["meta"]]
                )
            )
        out = pipeline(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(batch["inp"]),
            K,
            jax.random.PRNGKey(i),
        )
        evaluator.evaluate(out, batch)
    return evaluator.summarize()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", default=None)
    parser.add_argument("--test", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()
    cfg = load_config(args.cfg_file, args.opts)

    from clean_pvnet_tpu.utils.cache import apply_platform, enable_compilation_cache

    apply_platform(cfg.platform)
    enable_compilation_cache()
    from clean_pvnet_tpu.parallel.distributed import init_distributed

    session = init_distributed()  # no-op rendezvous on a single host
    model = make_network(cfg)
    mesh = make_mesh(cfg.mesh)
    model_dir = os.path.join(cfg.model_dir, cfg.task, cfg.model)
    ckpt = CheckpointIO(model_dir)

    if args.test:
        train_loader = None
        steps_per_epoch = 1
    else:
        train_loader = make_data_loader(
            cfg, is_train=True, ann_file=resolve_ann(cfg, True)
        )
        steps_per_epoch = len(train_loader)

    recorder = Recorder(os.path.join(cfg.record_dir, cfg.task, cfg.model))
    trainer = Trainer(cfg, model, steps_per_epoch, mesh=mesh, recorder=recorder)
    sample_hw = cfg.train.image_buckets[-1]
    state = trainer.init_state(
        jax.random.PRNGKey(cfg.train.seed), (1, sample_hw[0], sample_hw[1], 3)
    )
    if cfg.train.torch_pretrain:
        if cfg.task != "pvnet":
            raise ValueError(
                "train.torch_pretrain only supports the pvnet task (the "
                f"reference PVNet/torchvision layouts); got task={cfg.task!r}"
            )
        state = torch_init(state, cfg.train.torch_pretrain)
        print(f"initialized from torch checkpoint {cfg.train.torch_pretrain}")
    begin_epoch = -1
    if cfg.train.resume:
        state, begin_epoch = ckpt.restore(state, cfg.test.epoch if args.test else None)

    loader, pipeline, evaluator = build_eval(cfg, model)

    if args.test:
        metrics = run_eval(cfg, model, state, loader, pipeline, evaluator)
        print(metrics)
        return

    if session.process_count > 1:
        # each host loaded its slice; assemble the global sharded batch
        place = lambda b: session.host_local_batch_to_global(b, mesh)  # noqa: E731
    else:
        place = lambda b: shard_batch(b, mesh)  # noqa: E731

    for epoch in range(begin_epoch + 1, cfg.train.epochs):
        state = trainer.run_epoch(
            state,
            (place(_strip(b, cfg.task)) for b in train_loader),
            epoch,
        )
        if (epoch + 1) % cfg.train.save_every_epochs == 0:
            ckpt.save(state, epoch)
        if (epoch + 1) % cfg.train.eval_every_epochs == 0:
            metrics = run_eval(cfg, model, state, loader, pipeline, evaluator)
            recorder.record("val", int(state.step), metrics)
    ckpt.save(state, cfg.train.epochs - 1, wait=True)


if __name__ == "__main__":
    main()
