"""Detector → PVNet cascade (ct_pvnet task), fully on-device.

Behavioral counterpart of reference lib/networks/ct_pvnet/res.py:14-84: the
CenterNet detector proposes boxes, each box is cropped/affine-warped to a
fixed square patch, PVNet votes keypoints per crop, and keypoints map back
to image coordinates through the inverse crop transform.

The reference round-trips GPU→CPU→GPU per crop through cv2.warpAffine
(ref res.py:36-44); here cropping is a batched bilinear gather inside the
same jitted program, detections are padded to a static `max_dets` with a
score-threshold validity mask, and every crop goes through PVNet in one
batched forward.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models.centernet import decode_ct_heatmap
from clean_pvnet_tpu.models.pvnet import decode_keypoints


def crop_bilinear(img: jax.Array, center: jax.Array, size: jax.Array,
                  out_s: int) -> jax.Array:
    """Sample a square window (center, size in px) to [out_s, out_s, C].

    Equivalent to the reference's warpAffine crop (ref res.py:31-44);
    out-of-frame samples are zero."""
    h, w, c = img.shape
    step = size / out_s
    # pixel centers sit at integer coords (same convention as keypoints and
    # voting); window [c-s/2, c+s/2) sampled at half-pixel offsets
    base = (jnp.arange(out_s, dtype=jnp.float32) + 0.5) * step - size / 2.0 - 0.5
    xs = center[0] + base  # [S]
    ys = center[1] + base
    gx = jnp.broadcast_to(xs[None, :], (out_s, out_s))
    gy = jnp.broadcast_to(ys[:, None], (out_s, out_s))

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    flat = img.reshape(h * w, c)

    def tap(yy, xx, wgt):
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = (
            jnp.clip(yy, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        )
        return flat[idx.reshape(-1)].reshape(out_s, out_s, c) * (
            wgt * inb
        )[..., None]

    return (
        tap(y0, x0, (1 - fy) * (1 - fx))
        + tap(y0, x0 + 1, (1 - fy) * fx)
        + tap(y0 + 1, x0, fy * (1 - fx))
        + tap(y0 + 1, x0 + 1, fy * fx)
    )


class CascadePipeline:
    """Composed detector + per-crop PVNet, one jitted program.

    (counterpart of ref ct_pvnet/res.py Network.forward :74-84; the two
    sub-networks load independently trained weights like ref :63-72.)
    """

    def __init__(
        self,
        cfg: Config,
        detector,
        pvnet,
        max_dets: int = 8,
        crop_size: int = 128,
        scale_ratio: float = 1.8,
        score_thresh: float = 0.3,
        down_ratio: int = 4,
    ):
        self.cfg = cfg
        self.detector = detector
        self.pvnet = pvnet
        self.max_dets = max_dets
        self.crop_size = crop_size
        self.scale_ratio = scale_ratio
        self.score_thresh = score_thresh
        self.down_ratio = down_ratio
        self._run = jax.jit(self._build())

    def _build(self):
        cfg = self.cfg
        k, s = self.max_dets, self.crop_size

        def run(det_vars, pvnet_vars, inp, key):
            det_out = self.detector.apply(det_vars, inp, train=False)
            dec = decode_ct_heatmap(det_out["ct_hm"], det_out["wh"], max_dets=k)
            boxes = dec["bboxes"] * self.down_ratio  # to input pixels
            scores = dec["scores"]
            valid = scores > self.score_thresh

            centers = jnp.stack(
                [
                    (boxes[..., 0] + boxes[..., 2]) / 2,
                    (boxes[..., 1] + boxes[..., 3]) / 2,
                ],
                -1,
            )  # [B,K,2]
            sizes = (
                jnp.maximum(
                    boxes[..., 2] - boxes[..., 0], boxes[..., 3] - boxes[..., 1]
                )
                * self.scale_ratio
            )  # [B,K]
            sizes = jnp.maximum(sizes, 8.0)

            crops = jax.vmap(
                lambda img, cs, szs: jax.vmap(
                    lambda c0, s0: crop_bilinear(img, c0, s0, s)
                )(cs, szs)
            )(inp, centers, sizes)  # [B,K,S,S,3]

            b = inp.shape[0]
            flat = crops.reshape(b * k, s, s, 3)
            out = self.pvnet.apply(pvnet_vars, flat, train=False)
            dec_kpt = decode_keypoints(
                out["seg"], out["vertex"], key, cfg, un_pnp=False
            )
            kpt_crop = dec_kpt["kpt_2d"].reshape(b, k, -1, 2)
            # inverse crop transform (matches crop_bilinear's sampling):
            # img = (crop_px + 0.5)·step + (center − size/2) − 0.5
            step = (sizes / s)[..., None, None]
            corner = centers - sizes[..., None] / 2.0
            kpt_img = (kpt_crop + 0.5) * step + corner[:, :, None, :] - 0.5
            return {
                "bboxes": boxes,
                "scores": scores,
                "classes": dec["classes"],
                "valid": valid & dec_kpt["valid"].reshape(b, k),
                "kpt_2d": kpt_img,
                "crop_mask": dec_kpt["mask"].reshape(b, k, s, s),
            }

        return run

    def __call__(self, det_vars, pvnet_vars, inp, key):
        return self._run(det_vars, pvnet_vars, inp, key)
