"""Farthest-point sampling.

Behavioral counterpart of the reference's cffi C extension
(ref lib/csrc/fps/src/farthest_point_sampling.cpp:76-160, fps_utils.py:5-20):
greedy O(K·N) selection keeping a running min-distance array.  On TPU the
inner distance update is one fused vector op per step, so a `lax.fori_loop`
maps cleanly; no native code needed (the reference uses it offline only,
ref tools/handle_custom_dataset.py:19-24).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_samples", "init_center"))
def farthest_point_sampling(
    pts: jax.Array, num_samples: int, init_center: bool = False
) -> jax.Array:
    """pts [N, 3] -> [num_samples, 3].

    init_center=True starts from the point nearest the bbox center (matching
    ref farthest_point_sampling.cpp:122-160's init_center variant); otherwise
    from pts[0] (ref :76-105).
    """
    n = pts.shape[0]
    pts = pts.astype(jnp.float32)

    if init_center:
        center = (jnp.max(pts, 0) + jnp.min(pts, 0)) / 2.0
        first = jnp.argmin(jnp.sum((pts - center) ** 2, -1))
    else:
        first = jnp.asarray(0, jnp.int32)

    def body(i, carry):
        idxs, min_d2 = carry
        last = pts[idxs[i - 1]]
        d2 = jnp.sum((pts - last) ** 2, -1)
        min_d2 = jnp.minimum(min_d2, d2)
        idxs = idxs.at[i].set(jnp.argmax(min_d2).astype(jnp.int32))
        return idxs, min_d2

    idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first.astype(jnp.int32))
    init_d2 = jnp.full((n,), jnp.inf, jnp.float32)
    idxs, _ = jax.lax.fori_loop(1, num_samples, body, (idxs0, init_d2))
    return pts[idxs]


def farthest_point_sampling_np(pts: np.ndarray, num_samples: int, init_center: bool = False) -> np.ndarray:
    """Host/numpy reference oracle for tests and offline tools."""
    pts = np.asarray(pts, np.float32)
    if init_center:
        center = (pts.max(0) + pts.min(0)) / 2.0
        first = int(np.argmin(((pts - center) ** 2).sum(-1)))
    else:
        first = 0
    idxs = [first]
    min_d2 = np.full(pts.shape[0], np.inf, np.float32)
    for _ in range(1, num_samples):
        d2 = ((pts - pts[idxs[-1]]) ** 2).sum(-1)
        min_d2 = np.minimum(min_d2, d2)
        idxs.append(int(np.argmax(min_d2)))
    return pts[np.asarray(idxs)]
