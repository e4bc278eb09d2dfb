"""Per-pixel unit-vector ("vertex") field targets.

Behavioral counterpart of reference
lib/utils/pvnet/pvnet_data_utils.py:30-44 (compute_vertex): for every
foreground pixel, the unit direction from the pixel to each 2D keypoint.

Two implementations: a fully vectorized numpy one for the host data pipeline
(no per-pixel Python, unlike the reference's argwhere/scatter) and a jnp one
usable on-device (e.g. for augmentation-on-TPU or tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_vertex_field_np(mask: np.ndarray, kpt_2d: np.ndarray) -> np.ndarray:
    """mask [H, W] {0,1}, kpt_2d [K, 2] (x, y) -> [H, W, K*2] float32.

    Background pixels are zero. Norms are floored at 1e-3 like the reference
    (ref pvnet_data_utils.py:37-38: norm[norm < 1e-3] += 1e-3).
    """
    from clean_pvnet_tpu import native

    fast = native.compute_vertex_f32(mask, np.asarray(kpt_2d, np.float32))
    if fast is not None:
        return fast

    h, w = mask.shape
    k = kpt_2d.shape[0]
    ys, xs = np.nonzero(mask == 1)
    diff = kpt_2d[None, :, :].astype(np.float32) - np.stack([xs, ys], -1)[:, None, :].astype(np.float32)
    norm = np.linalg.norm(diff, axis=2, keepdims=True)
    norm = np.where(norm < 1e-3, norm + 1e-3, norm)
    unit = diff / norm
    out = np.zeros((h, w, k, 2), np.float32)
    out[ys, xs] = unit
    return out.reshape(h, w, k * 2)


def compute_vertex_field(mask: jax.Array, kpt_2d: jax.Array) -> jax.Array:
    """jnp version; mask [H, W], kpt_2d [K, 2] -> [H, W, K*2].

    Dense (computes every pixel then masks) — trades FLOPs for static shape,
    which is what the TPU wants.
    """
    h, w = mask.shape
    k = kpt_2d.shape[0]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    pix = jnp.stack([xs, ys], -1)  # [H, W, 2]
    diff = kpt_2d[None, None].astype(jnp.float32) - pix[:, :, None, :]  # [H,W,K,2]
    norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    norm = jnp.where(norm < 1e-3, norm + 1e-3, norm)
    unit = diff / norm
    unit = unit * (mask == 1).astype(jnp.float32)[:, :, None, None]
    return unit.reshape(h, w, k * 2)
