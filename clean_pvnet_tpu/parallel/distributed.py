"""Multi-host SPMD session setup.

The reference has no multi-node support (SURVEY.md §2.8: an unused
`is_distributed` flag, dead `torch.distributed` import). Here multi-host is
first-class: every host runs the same program, `jax.distributed.initialize`
performs the DCN rendezvous, the mesh spans all global devices (ICI within
a slice, DCN across hosts), and each host feeds only its shard of the
global batch through `host_local_batch_to_global`.

Usage (same script on every host):
    session = init_distributed()          # no-op on single host
    mesh = make_mesh(cfg.mesh)            # global devices
    global_batch = session.host_local_batch_to_global(local_batch, mesh)
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class DistributedSession:
    process_index: int
    process_count: int

    @property
    def is_primary(self) -> bool:
        return self.process_index == 0

    def host_local_batch_to_global(
        self, batch: Mapping[str, Any], mesh: Mesh, axis: str = "data"
    ):
        """Assemble a global sharded batch from this host's local shard.

        Each host passes its [local_B, ...] arrays; the result is a global
        [P·local_B, ...] jax.Array sharded over `axis` without any host
        ever materializing the full batch (the multi-host replacement for
        the reference's single-process DataLoader scatter)."""
        sharding = NamedSharding(mesh, P(axis))

        def to_global(x):
            if not hasattr(x, "shape") or x.ndim == 0:
                return x
            x = np.asarray(x)
            global_shape = (x.shape[0] * self.process_count,) + x.shape[1:]
            local_devices = [d for d in mesh.devices.flat
                            if d.process_index == self.process_index]
            per_dev = np.array_split(x, len(local_devices), axis=0)
            buffers = [jax.device_put(s, d)
                       for s, d in zip(per_dev, local_devices)]
            return jax.make_array_from_single_device_arrays(
                global_shape, sharding, buffers
            )

        return {k: to_global(v) for k, v in dict(batch).items()}


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> DistributedSession:
    """Initialize the multi-host runtime when launched as one process per
    host. Falls back to a single-process session when no coordinator is
    configured (env: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or TPU metadata auto-detection)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        kwargs = {}
        if coordinator_address:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(
                num_processes or os.environ["JAX_NUM_PROCESSES"]
            )
        if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(
                process_id if process_id is not None
                else os.environ["JAX_PROCESS_ID"]
            )
        jax.distributed.initialize(**kwargs)
    return DistributedSession(
        process_index=jax.process_index(), process_count=jax.process_count()
    )
