"""Device mesh and sharding layer.

This is the SPMD replacement for the reference's single-process
`nn.DataParallel` replicate/scatter/gather (ref lib/train/trainers/
trainer.py:9-12): a 1-D (or 2-D, with a hypothesis axis for sharded voting)
`jax.sharding.Mesh`, with the global batch sharded over the `data` axis and
parameters replicated. Gradient reduction is XLA's business — the train step
is written as a global-batch program and the partitioner inserts the
`psum`s over ICI (SURVEY.md §2.8).

Multi-host: `jax.distributed.initialize()` (DCN rendezvous) happens in the
entry point; every function here operates on the global device list.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clean_pvnet_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, num_devices: int | None = None) -> Mesh:
    """Build a mesh over the visible devices.

    1-D ('data',) when hyp_shards == 1, else 2-D ('data', 'hyp') where the
    hypothesis axis shards RANSAC hypothesis populations (BASELINE.json
    north star: per-keypoint hypotheses sharded + psum-reduced).
    """
    cfg = cfg or MeshConfig()
    devices = jax.devices()
    n = num_devices or (len(devices) if cfg.num_devices < 0 else cfg.num_devices)
    if n > len(devices):
        raise ValueError(
            f"make_mesh: {n} devices requested but only {len(devices)} "
            f"visible on backend {jax.default_backend()!r} — a silent "
            "truncation here would build a smaller mesh than the caller's "
            "sharding assumes (e.g. an 8-way dryrun collapsing to 1 device). "
            "For CPU dryruns set XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={n} (with JAX_PLATFORMS=cpu) to expose {n} virtual devices."
        )
    devices = devices[:n]
    if cfg.hyp_shards > 1:
        assert n % cfg.hyp_shards == 0, (n, cfg.hyp_shards)
        arr = np.asarray(devices).reshape(n // cfg.hyp_shards, cfg.hyp_shards)
        return Mesh(arr, (cfg.data_axis, cfg.hyp_axis))
    return Mesh(np.asarray(devices), (cfg.data_axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for batched arrays."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping[str, Any], mesh: Mesh, axis: str = "data"):
    """Place a host-global batch dict onto the mesh, sharded over `axis`.

    Replaces the reference DataParallel scatter (ref trainer.py:38); array
    leaves keep trailing dims replicated.
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") and x.ndim > 0 else x,
        dict(batch),
    )
