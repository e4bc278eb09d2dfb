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
    "pvnet": ("inp", "mask", "vertex"),
    "ct": ("inp", "ct_hm", "ct_ind", "wh", "ct_valid"),
}


def _strip(batch, task: str = "pvnet"):
    return {k: batch[k] for k in _TASK_BATCH_KEYS[task]}


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
    split = "train" if is_train else "test"
    return os.path.join(cfg.data_root, f"{cfg.cls_type}_{split}.json")


def build_eval(cfg, model):
    if cfg.task == "ct":
        return build_eval_ct(cfg, model)
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
    evaluator = LinemodEvaluator(cfg, mesh_ply["pts"], diameter)
    return loader, pipeline, evaluator


def build_eval_ct(cfg, model):
    """Detector-task eval stack: decode heatmaps → AP@0.5
    (ref lib/evaluators/tless_test/ct.py)."""
    from clean_pvnet_tpu.eval.tless import DetectionEvaluator
    from clean_pvnet_tpu.models.centernet import decode_ct_heatmap

    ann = resolve_ann(cfg, is_train=False)
    loader = make_data_loader(cfg, is_train=False, ann_file=ann)

    class _DetPipeline:
        def __call__(self, variables, inp, K=None, key=None):
            out = model.apply(variables, inp, train=False)
            return {**out, **decode_ct_heatmap(out["ct_hm"], out["wh"])}

    return loader, _DetPipeline(), DetectionEvaluator(cfg)


def run_eval(cfg, model, state, loader, pipeline, evaluator):
    if cfg.task == "ct":
        for batch in loader:
            out = pipeline(
                {"params": state.params, "batch_stats": state.batch_stats},
                jnp.asarray(batch["inp"]),
            )
            evaluator.evaluate(out, batch)
        return evaluator.summarize()
    for i, batch in enumerate(loader):
        K = jnp.asarray(
            np.stack([np.asarray(m["ann"]["K"], np.float32) for m in batch["meta"]])
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
    begin_epoch = -1
    if cfg.train.resume:
        state, begin_epoch = ckpt.restore(state, cfg.test.epoch if args.test else None)

    loader, pipeline, evaluator = build_eval(cfg, model)

    if args.test:
        metrics = run_eval(cfg, model, state, loader, pipeline, evaluator)
        print(metrics)
        return

    for epoch in range(begin_epoch + 1, cfg.train.epochs):
        state = trainer.run_epoch(
            state,
            (shard_batch(_strip(b, cfg.task), mesh) for b in train_loader),
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
