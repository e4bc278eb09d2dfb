"""Sharded train/eval steps and the training loop.

Counterpart of reference lib/train/trainers/trainer.py:28-102, rebuilt as
SPMD: the step is a *global-batch* jitted program; inputs arrive sharded
over the mesh's data axis and XLA inserts the gradient `psum`s over ICI.
No replicate/scatter/gather, no host loop over devices.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Iterable, Mapping

import jax
import jax.numpy as jnp

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from clean_pvnet_tpu.train.loss import pvnet_loss
from clean_pvnet_tpu.train.state import TrainState, create_train_state
from clean_pvnet_tpu.train.optim import make_optimizer
from clean_pvnet_tpu.registry import TRAINERS


@TRAINERS.register("pvnet")
def pvnet_step_fns(cfg: Config):
    """Build (train_step, eval_step) for the pvnet task.

    train_step: (state, batch{inp, mask, vertex}) -> (state, stats)
    eval_step:  (state, inp) -> {seg, vertex}
    """

    def train_step(state: TrainState, batch: Mapping[str, jax.Array]):
        if "inp_u8" in batch:
            # raw frames: the full augmentation pipeline runs here on-device
            # (data/augment_device.py) — rotate/crop/resize/blur/jitter as
            # one fused program; host work per item is just a cache lookup
            from clean_pvnet_tpu.data.augment_device import augment_batch_device

            key = jax.random.fold_in(
                jax.random.PRNGKey(cfg.train.seed), state.step
            )
            inp, mask_gt, kpt_2d = augment_batch_device(
                key, batch["inp_u8"], batch["mask"], batch["kpt_2d"], cfg.train
            )
            batch = {"inp": inp, "mask": mask_gt, "kpt_2d": kpt_2d}

        # vertex-field targets: precomputed on host, or — the TPU-native
        # default — derived on-device from (mask, kpt_2d), which shrinks
        # host→device traffic from a [B,H,W,2·vn] float tensor to [B,vn,2]
        # and moves the dense per-pixel math onto the VPU
        if "vertex" in batch:
            vertex_gt = batch["vertex"]
        else:
            from clean_pvnet_tpu.geometry.vertex import compute_vertex_field

            vertex_gt = jax.vmap(compute_vertex_field)(
                batch["mask"], batch["kpt_2d"]
            )

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["inp"],
                train=True,
                mutable=["batch_stats"],
            )
            loss, stats = pvnet_loss(
                out["seg"], out["vertex"], batch["mask"], vertex_gt
            )
            return loss, (stats, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (stats, new_bs)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads=grads, new_batch_stats=new_bs)
        return state, stats

    def eval_step(state: TrainState, inp: jax.Array):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            inp,
            train=False,
        )

    return train_step, eval_step


class Trainer:
    """Host-side loop: feed sharded batches, log, checkpoint, evaluate.

    Mirrors the responsibilities of reference Trainer.train/val
    (trainer.py:28-102) with the recorder's eta/lr console line (:56-65).
    """

    def __init__(self, cfg: Config, model, steps_per_epoch: int, mesh=None,
                 recorder=None):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.tx = make_optimizer(cfg.train, steps_per_epoch)
        self.steps_per_epoch = steps_per_epoch
        self.recorder = recorder
        train_step, eval_step = TRAINERS.build(cfg.task, cfg)
        self._train_step = jax.jit(train_step, donate_argnums=0)
        self._eval_step = jax.jit(eval_step)

    def init_state(self, rng, input_shape) -> TrainState:
        state = create_train_state(self.model, self.tx, rng, input_shape)
        return jax.device_put(state, replicated_sharding(self.mesh))

    def run_epoch(
        self,
        state: TrainState,
        batches: Iterable[Mapping[str, Any]],
        epoch: int,
        log_every: int = 20,
    ) -> TrainState:
        t0 = time.time()
        n = 0
        for batch in batches:
            batch = shard_batch(batch, self.mesh, self.cfg.mesh.data_axis)
            state, stats = self._train_step(state, batch)
            n += 1
            if n % log_every == 0:
                stats = {k: float(v) for k, v in stats.items()}
                dt = (time.time() - t0) / n
                eta = dt * (self.steps_per_epoch - n)
                line = " ".join(f"{k}: {v:.4f}" for k, v in sorted(stats.items()))
                print(
                    f"epoch {epoch} step {n}/{self.steps_per_epoch} "
                    f"{line} {dt*1000:.0f} ms/it eta {eta:.0f}s"
                )
                if self.recorder is not None:
                    self.recorder.record(
                        "train", int(state.step), stats
                    )
        return state

    def make_scan_step(self, gather_fn: Callable):
        """Fuse many train steps into ONE jitted dispatch via `lax.scan`.

        For device-resident datasets on dispatch-latency-bound hosts (e.g.
        an RPC-tunneled chip, where each dispatch costs a network round
        trip), the per-step host input is just an index vector — so an
        entire chunk of steps can run as one program: the scan carries the
        train state and maps over a [steps, ...] index array, gathering
        each step's batch on-device with `gather_fn(data, idx)`.

        Numerically identical to the sequential loop: the step RNG folds
        in `state.step`, which advances inside the scan exactly as it does
        between dispatches (tests/test_train.py::test_scan_step_matches_
        sequential).

        Returns `chunk(state, data, idx_chunk) -> (state, last_stats)`;
        `data` is any pytree of device arrays passed through to gather_fn
        as jit arguments (so multi-GB staged datasets are not serialized
        into the program as constants).
        """
        raw_step, _ = TRAINERS.build(self.cfg.task, self.cfg)

        @partial(jax.jit, donate_argnums=0)
        def chunk(state, data, idx_chunk):
            def body(st, idx):
                return raw_step(st, gather_fn(data, idx))

            state, stats_seq = jax.lax.scan(body, state, idx_chunk)
            return state, jax.tree_util.tree_map(lambda x: x[-1], stats_seq)

        return chunk

    def predict(self, state: TrainState, inp):
        inp = jax.device_put(
            inp, jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(self.cfg.mesh.data_axis)
            )
        )
        return self._eval_step(state, inp)
