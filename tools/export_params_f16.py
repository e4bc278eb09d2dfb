"""Export a trained checkpoint as a small float16 params-only artifact.

Orbax checkpoints (~140 MB with optimizer state) are gitignored; this
writes just {params, batch_stats} in float16 (~30 MB) so a converged
benchmark model can be committed as a fixture and reloaded across rounds
without retraining.

  python tools/export_params_f16.py --root data/synth_r3 \
      --out data/synth_r3_params_f16.npz
  # reload: tools/eval_ablations.py --params <npz>  (or load_params_f16)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def save_params_f16(path: str, variables: dict) -> None:
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        arr = np.asarray(leaf)
        if arr.dtype == np.float32 and not key.startswith("batch_stats"):
            # params are tiny-magnitude; batch_stats variances can exceed
            # f16 max (65504) and would silently round-trip as inf
            # (ADVICE r2) — keep stats in f32, they are small anyway.
            arr = arr.astype(np.float16)
            assert np.isfinite(arr).all(), f"f16 overflow in {key}"
        out[key] = arr
    np.savez_compressed(path, **out)


def load_params_f16(path: str, like: dict) -> dict:
    """Restore into the structure of `like` (an initialized variables dict),
    casting back to each leaf's original dtype."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        arr = np.asarray(data[key]).astype(np.asarray(leaf).dtype)
        assert arr.shape == np.asarray(leaf).shape, (key, arr.shape)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/synth_r3")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(args.root + "_params_f16.npz")

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from clean_pvnet_tpu.config import Config
    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.parallel import make_mesh
    from clean_pvnet_tpu.train import CheckpointIO, Trainer

    cfg = Config().with_overrides(
        {"cls_type": "synth", "data_root": args.root}
    )
    model = make_network(cfg)
    trainer = Trainer(cfg, model, steps_per_epoch=1,
                      mesh=make_mesh(num_devices=1))
    # conv param shapes are spatial-size independent: init tiny for speed
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3))
    state, epoch = CheckpointIO(os.path.join(args.root, "ckpt")).restore(state)
    if epoch < 0:
        raise SystemExit("no checkpoint found")
    save_params_f16(out, {"params": state.params,
                          "batch_stats": state.batch_stats})
    print(f"epoch {epoch} → {out} "
          f"({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
