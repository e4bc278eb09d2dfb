"""On-device nearest-neighbor distance queries.

Replaces the reference's brute-force CUDA NN extension used by the ADD(-S)
metric for symmetric objects (ref lib/csrc/nn/src/nearest_neighborhood.cu:
48-117, nn_utils.py:5-20; consumed at lib/evaluators/linemod/pvnet.py:74).
On TPU a tiled pairwise-distance reduction is a plain fused matmul-style
computation; no custom kernel or host round trip needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbor_dists(
    query: jax.Array, ref: jax.Array, chunk: int = 2048
) -> jax.Array:
    """Min distance from each query point to the ref cloud.

    query [N, D], ref [M, D] -> [N] float32 (euclidean distances).
    Uses |q - r|^2 = |q|^2 - 2 q·r + |r|^2 so the cross term rides the MXU,
    chunked over queries to bound the [chunk, M] distance tile.
    """
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    n = query.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    qc = q.reshape(-1, chunk, q.shape[-1])
    r2 = jnp.sum(ref * ref, -1)  # [M]

    def body(_, qb):
        q2 = jnp.sum(qb * qb, -1, keepdims=True)  # [chunk, 1]
        cross = qb @ ref.T  # [chunk, M] — MXU
        d2 = q2 - 2.0 * cross + r2[None]
        return None, jnp.min(d2, -1)

    _, mins = jax.lax.scan(body, None, qc)
    d2 = mins.reshape(-1)[:n]
    return jnp.sqrt(jnp.clip(d2, 0.0, None))
