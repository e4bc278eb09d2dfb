"""Orbax checkpointing with auto-resume-latest semantics.

Counterpart of reference lib/utils/net_utils.py:265-324 (save_model /
load_model / load_network): epoch-granularity checkpoints of
params/batch_stats/opt_state/step, resume from the newest, bounded
retention. Orbax handles sharded arrays natively, so the same code covers
single-chip and pod-slice states.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from clean_pvnet_tpu.train.state import TrainState


class CheckpointIO:
    def __init__(self, directory: str, max_to_keep: int = 200):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, epoch: int, wait: bool = False) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self.manager.save(epoch, args=ocp.args.StandardSave(payload))
        if wait:
            self.manager.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, state: TrainState, epoch: int | None = None) -> tuple[TrainState, int]:
        """Restore into an abstract-compatible state. Returns (state, epoch).

        epoch=None → newest (ref net_utils.py:273-279 picks max(epoch));
        missing dir → (state, -1), matching the reference's cold-start path.
        """
        if epoch is None or epoch < 0:
            epoch = self.latest_epoch()
        if epoch is None:
            return state, -1
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        restored = self.manager.restore(
            epoch, args=ocp.args.StandardRestore(abstract)
        )
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return state, epoch

    def restore_weights(self, state: TrainState, epoch: int | None = None) -> TrainState:
        """Weights-only load for eval/cascade submodels
        (ref net_utils.py:306-324 load_network)."""
        state, _ = self.restore(state, epoch)
        return state

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
