"""Distributed multi-object pose refinement: block-diagonal LM over a mesh.

The reference refines each detection's pose one at a time on the host, each
one a separate Ceres solve (ref lib/csrc/uncertainty_pnp/src/
uncertainty_pnp.cpp:61-92 called per instance from
lib/evaluators/tless_test/pvnet.py:208-256). A multi-object scene's joint
refinement problem is a single least-squares system whose normal matrix is
block-diagonal — one 6×6 SE(3) block per instance, no cross-instance
terms — so the TPU-native formulation is: assemble every instance's
residuals/Jacobians batched, solve all 6×6 blocks at once, and shard the
instance axis over the device mesh. Each device owns N/n_dev blocks of the
global system; the only collective is the final `all_gather` of refined
poses (weights/updates never cross devices because the off-diagonal blocks
are exactly zero).

This feeds off the cascade's padded detections (models/cascade.py emits
fixed `max_dets` slots with validity masks), so the whole scene refines in
one fixed-shape program regardless of how many objects were found.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from clean_pvnet_tpu.geometry.pnp import (
    _lm_refine,
    dlt_init,
    inv_sqrtm_2x2,
)


def _refine_block(kpt_3d, kpt_2d, covars, K, valid, iters):
    """One instance's 6×6 LM block: covariance weights + DLT init + LM.

    Mirrors solve_pnp_uncertainty (geometry/pnp.py) but is kept separate so
    the sharded driver can weight invalid (padded) instances to identity
    without branching."""
    bad = (covars[..., 0, 0] < 1e-6) | jnp.any(jnp.isnan(covars), axis=(-1, -2))
    safe = jnp.where(bad[..., None, None], jnp.eye(2), covars)
    W = inv_sqrtm_2x2(safe)
    W = jnp.where(bad[..., None, None], 0.0, W)
    all_bad = jnp.all(bad)
    W = jnp.where(all_bad, jnp.broadcast_to(jnp.eye(2), W.shape), W)

    n = kpt_3d.shape[0]
    Kinv = jnp.linalg.inv(K)
    rays = (jnp.concatenate([kpt_2d, jnp.ones((n, 1))], -1) @ Kinv.T)[:, :2]
    w_row = 0.5 * (W[:, 0, 0] + W[:, 1, 1])
    R0, t0 = dlt_init(kpt_3d, rays, w_row)
    R, t = _lm_refine(kpt_3d, kpt_2d, K, W, R0, t0, iters, 1e-3, 10.0, 0.1)
    pose = jnp.concatenate([R, t[:, None]], -1)
    # padded slots return identity-rotation zero-translation poses
    idle = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
    return jnp.where(valid, pose, idle)


@partial(jax.jit, static_argnames=("iters",))
def refine_instances(kpt_3d, kpt_2d, covars, K, valid, iters: int = 30):
    """Single-device batched block solve: all instances' 6×6 LM blocks at
    once. kpt_3d [N,vn,3] (per-instance keypoint models), kpt_2d [N,vn,2],
    covars [N,vn,2,2], K [N,3,3], valid [N] bool → poses [N,3,4]."""
    return jax.vmap(
        lambda a, b, c, d, e: _refine_block(a, b, c, d, e, iters)
    )(kpt_3d, kpt_2d, covars, K, valid)


def make_sharded_refiner(mesh, axis: str = "data", iters: int = 30):
    """Build the mesh-sharded multi-instance refiner.

    Returns fn(kpt_3d [N,vn,3], kpt_2d [N,vn,2], covars [N,vn,2,2],
    K [N,3,3], valid [N]) → poses [N,3,4], with the instance axis sharded
    over `mesh.shape[axis]` devices (N must divide evenly; pad with
    valid=False slots — the cascade's fixed max_dets layout already does).
    """
    n_dev = mesh.shape[axis]

    def body(kpt_3d, kpt_2d, covars, K, valid):
        local = jax.vmap(
            lambda a, b, c, d, e: _refine_block(a, b, c, d, e, iters)
        )(kpt_3d, kpt_2d, covars, K, valid)
        return jax.lax.all_gather(local, axis, tiled=True)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )

    def run(kpt_3d, kpt_2d, covars, K, valid):
        n = kpt_2d.shape[0]
        if n % n_dev != 0:
            raise ValueError(
                f"instance count {n} must divide over {n_dev} devices — pad "
                "with valid=False slots (cascade emits fixed max_dets)"
            )
        return sharded(kpt_3d, kpt_2d, covars, K,
                       valid.astype(jnp.bool_)[:, None, None])

    return run
