"""Per-task losses.

Counterpart of reference lib/train/trainers/pvnet.py:15-39 (NetworkWrapper):
masked smooth-L1 on the vertex field normalized by foreground area and
channel count, plus softmax cross-entropy on segmentation. Shapes are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """Elementwise Huber/smooth-L1 matching torch's F.smooth_l1_loss (beta=1)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def pvnet_loss(
    seg_logits: jax.Array,   # [B, H, W, C]
    vertex_pred: jax.Array,  # [B, H, W, 2*vn]
    mask_gt: jax.Array,      # [B, H, W] int
    vertex_gt: jax.Array,    # [B, H, W, 2*vn]
) -> tuple[jax.Array, dict]:
    """Returns (total_loss, scalar_stats); matches the reference's
    normalization: sum(smooth_l1 over masked pixels) / n_fg / ver_dim
    (ref trainers/pvnet.py:26-29), CE mean over all pixels (:31-34)."""
    w = (mask_gt > 0).astype(vertex_pred.dtype)[..., None]
    ver_dim = vertex_pred.shape[-1]
    vote = jnp.sum(smooth_l1(vertex_pred * w, vertex_gt * w))
    vote = vote / (jnp.sum(w) + 1e-6) / ver_dim

    # CE = logsumexp(logits) - logits[label], with the label pick written as
    # a one-hot contraction instead of optax's take_along_axis: on TPU the
    # per-pixel class gather (and its backward scatter) ran at ~8 ns/elem
    # and cost 34+11 ms/step at [8,480,640,2] — the one-hot dot is a pure
    # VPU elementwise+reduce that fuses into the logits producer.
    labels = mask_gt.astype(jnp.int32)
    n_cls = seg_logits.shape[-1]
    lse = jax.nn.logsumexp(seg_logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n_cls, dtype=seg_logits.dtype)
    picked = jnp.sum(seg_logits * onehot, axis=-1)
    seg = (lse - picked).mean()

    total = vote + seg
    return total, {"vote_loss": vote, "seg_loss": seg, "loss": total}
