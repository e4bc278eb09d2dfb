"""Optimizer + LR schedule factories.

Counterpart of reference lib/train/optimizer.py:5-27 (Adam/RAdam/SGD) and
lib/train/scheduler.py:5-18 + lib/utils/optimizer/lr_scheduler.py:7-40
(MultiStepLR and WarmupMultiStepLR with linear warmup, factor 1/3, 5 epochs).

Schedules are expressed per-step (XLA-friendly scalar arithmetic on the
step counter) but parameterized in epochs like the reference configs.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from clean_pvnet_tpu.config import TrainConfig


def multistep_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """lr(step): base_lr * gamma^{#milestones passed}, with optional linear
    warmup over the first `warmup_epochs` epochs from `warmup_factor`."""
    milestones = jnp.asarray([m * steps_per_epoch for m in cfg.milestones])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n_passed = jnp.sum(step >= milestones)
        lr = cfg.lr * cfg.gamma**n_passed
        if cfg.warmup:
            warm_steps = cfg.warmup_epochs * steps_per_epoch
            alpha = jnp.clip(step / jnp.maximum(warm_steps, 1), 0.0, 1.0)
            factor = cfg.warmup_factor * (1 - alpha) + alpha
            lr = lr * factor
        return lr

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = multistep_schedule(cfg, steps_per_epoch)
    if cfg.optimizer in ("adam", "radam"):
        # radam ≈ adam with warmup-correction; optax has a native radam
        opt_fn = optax.radam if cfg.optimizer == "radam" else optax.adam
        if cfg.weight_decay > 0 and cfg.optimizer == "adam":
            core = optax.adamw(schedule, weight_decay=cfg.weight_decay)
        else:
            core = opt_fn(schedule)
    elif cfg.optimizer == "sgd":
        core = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=0.9),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    # ref trainer.py:44 clip_grad_value_(40)
    return optax.chain(optax.clip(cfg.grad_clip_value), core)
