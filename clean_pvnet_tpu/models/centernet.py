"""CenterNet-style detector: DLASeg wrapper, box decode, and losses.

Behavioral counterparts:
  box decode    — ref lib/utils/ct/ct_decode.py:6-75 (3×3 maxpool NMS,
                  top-K over all class heatmaps, wh gather → boxes)
  focal loss    — ref lib/utils/net_utils.py (CornerNet-style penalty-
                  reduced focal loss used by trainers/ct.py:14-31)
  network       — ref lib/networks/ct/dla.py:20-33 (DLASeg + decode)
All fixed-shape and jittable; detections are padded to `max_dets` with a
validity mask instead of the reference's dynamic-size outputs.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models.dla import DLASeg
from clean_pvnet_tpu.registry import NETWORKS, TRAINERS


@partial(jax.jit, static_argnames=("max_dets",))
def decode_ct_heatmap(ct_hm: jax.Array, wh: jax.Array, max_dets: int = 100):
    """ct_hm [B, H, W, C] logits, wh [B, H, W, 2] →
    dict(bboxes [B,K,4], scores [B,K], classes [B,K]) in output-grid coords.

    (ref ct_decode.py:52-75 decode_ct_hm; NMS via maxpool equality :6-11.)
    """
    b, h, w, c = ct_hm.shape
    heat = jax.nn.sigmoid(ct_hm)
    hmax = nn.max_pool(heat, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
    heat = jnp.where(jnp.abs(hmax - heat) < 1e-9, heat, 0.0)

    flat = heat.reshape(b, -1)  # over H*W*C
    scores, idx = jax.lax.top_k(flat, max_dets)
    cls = (idx % c).astype(jnp.int32)
    pix = idx // c
    ys = (pix // w).astype(jnp.float32)
    xs = (pix % w).astype(jnp.float32)

    wh_flat = wh.reshape(b, h * w, 2)
    wh_k = jnp.take_along_axis(wh_flat, pix[..., None], axis=1)  # [B,K,2]
    bboxes = jnp.stack(
        [
            xs - wh_k[..., 0] / 2,
            ys - wh_k[..., 1] / 2,
            xs + wh_k[..., 0] / 2,
            ys + wh_k[..., 1] / 2,
        ],
        -1,
    )
    return {"bboxes": bboxes, "scores": scores, "classes": cls,
            "centers": jnp.stack([xs, ys], -1)}


def ct_focal_loss(pred_logits: jax.Array, gt_hm: jax.Array) -> jax.Array:
    """Penalty-reduced pixelwise focal loss (CornerNet), matching the
    reference's neg_loss (ref lib/utils/net_utils.py _neg_loss):
      pos: (1-p)^2 log(p) at gt==1
      neg: (1-gt)^4 p^2 log(1-p) elsewhere, normalized by #pos."""
    p = jax.nn.sigmoid(pred_logits)
    p = jnp.clip(p, 1e-6, 1 - 1e-6)
    pos = (gt_hm >= 1.0).astype(p.dtype)
    neg_weight = jnp.power(1.0 - gt_hm, 4.0)
    pos_loss = -jnp.log(p) * jnp.power(1.0 - p, 2.0) * pos
    neg_loss = -jnp.log(1.0 - p) * jnp.power(p, 2.0) * neg_weight * (1.0 - pos)
    num_pos = jnp.sum(pos)
    total = jnp.sum(pos_loss) + jnp.sum(neg_loss)
    return jnp.where(num_pos > 0, total / jnp.maximum(num_pos, 1.0), jnp.sum(neg_loss))


def ct_wh_loss(wh_pred: jax.Array, ct_ind: jax.Array, wh_gt: jax.Array,
               valid: jax.Array) -> jax.Array:
    """Smooth-L1 on wh at gt center indices (ref trainers/ct.py:24-27).

    wh_pred [B,H,W,2]; ct_ind [B,N] flat HW indices; wh_gt [B,N,2];
    valid [B,N]."""
    b, h, w, _ = wh_pred.shape
    flat = wh_pred.reshape(b, h * w, 2)
    picked = jnp.take_along_axis(flat, ct_ind[..., None], axis=1)  # [B,N,2]
    diff = jnp.abs(picked - wh_gt)
    l1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    m = valid[..., None].astype(l1.dtype)
    return jnp.sum(l1 * m) / jnp.maximum(jnp.sum(m) * 2.0, 1.0) * 2.0


class CenterNet(nn.Module):
    """Detector network (ref lib/networks/ct/dla.py Network)."""

    num_classes: int = 30
    head_conv: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DLASeg(
            heads={"ct_hm": self.num_classes, "wh": 2},
            head_conv=self.head_conv,
            dtype=self.dtype,
            name="dla",
        )(x, train)


@NETWORKS.register("dla34")
def build_centernet(cfg: Config) -> CenterNet:
    return CenterNet(
        num_classes=cfg.network.ct_num_classes,
        head_conv=cfg.network.ct_head_conv,
        dtype=jnp.bfloat16 if cfg.network.use_bfloat16 else jnp.float32,
    )


@TRAINERS.register("ct")
def ct_step_fns(cfg: Config):
    """(train_step, eval_step) for the detector task; loss = focal(ct_hm) +
    0.1 · smoothL1(wh) (ref trainers/ct.py:14-31)."""

    def train_step(state, batch):
        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["inp"],
                train=True,
                mutable=["batch_stats"],
            )
            hm_loss = ct_focal_loss(out["ct_hm"], batch["ct_hm"])
            wh_loss = ct_wh_loss(
                out["wh"], batch["ct_ind"], batch["wh"], batch["ct_valid"]
            )
            loss = hm_loss + 0.1 * wh_loss
            stats = {"hm_loss": hm_loss, "wh_loss": wh_loss, "loss": loss}
            return loss, (stats, mutated["batch_stats"])

        (_, (stats, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads, new_batch_stats=new_bs)
        return state, stats

    def eval_step(state, inp):
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            inp,
            train=False,
        )
        return {**out, **decode_ct_heatmap(out["ct_hm"], out["wh"])}

    return train_step, eval_step
