"""PVNet: segmentation + per-pixel keypoint-direction ("vertex") network.

Behavioral counterpart of reference lib/networks/pvnet/resnet18.py:9-108:
a dilated ResNet-18 trunk with a skip-fusion decoder that upsamples back to
full resolution and predicts `seg_dim` segmentation logits plus
`2*num_keypoints` unit-vector components per pixel.

Differences by design (TPU-first):
  * NHWC; optional bfloat16 compute (params fp32).
  * each decoder stage resizes to the skip tensor's exact spatial shape,
    generalizing the reference's hard-coded 136→(135,180) interpolation fixup
    (ref resnet18.py:83-84) to any input size.
  * the eval-time voting decode is NOT embedded in the module (the reference
    calls the CUDA voting layer inside forward, ref resnet18.py:98-101);
    here `decode_keypoints` is a separate jittable function so training,
    inference, and decode stages compose and shard independently.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.models.resnet import ResNetStride8
from clean_pvnet_tpu.ops.voting import ransac_vote, ransac_vote_with_cov
from clean_pvnet_tpu.ops.voting_vanish import ransac_vote_projective
from clean_pvnet_tpu.registry import NETWORKS


def _upsample_to(x, ref_hw):
    """Bilinear upsample to an explicit (H, W)."""
    b, h, w, c = x.shape
    if (h, w) == tuple(ref_hw):
        return x
    return jax.image.resize(x, (b, ref_hw[0], ref_hw[1], c), method="bilinear")


class PVNet(nn.Module):
    """seg + vertex head network. Input [B, H, W, 3] → dict of outputs."""

    ver_dim: int = 18
    seg_dim: int = 2
    fc_dim: int = 256
    s8_dim: int = 128
    s4_dim: int = 64
    s2_dim: int = 32
    raw_dim: int = 32
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    bn_axis_name: str | None = None
    # cast seg/vertex to fp32 at the head. Training keeps this on (loss
    # precision); the inference pipeline turns it off so the 20-channel
    # full-resolution output is materialized in bf16 — half the HBM traffic
    # and footprint of the largest tensor in the program. The voting decode
    # only *gathers* O(max_pixels) rows from it and upcasts after the gather,
    # so keypoint precision is unaffected.
    cast_output: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.astype(self.dtype)
        x2s, x4s, x8s, x16s, x32s, xfc = ResNetStride8(
            fc_dim=self.fc_dim,
            dtype=self.dtype,
            bn_momentum=self.bn_momentum,
            bn_axis_name=self.bn_axis_name,
            name="backbone",
        )(inp, train)

        conv = partial(nn.Conv, kernel_size=(3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype)
        bn = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.bn_axis_name,
        )

        def stage(features, a, b, name):
            y = conv(features, name=f"conv_{name}")(jnp.concatenate([a, b], -1))
            y = bn(name=f"bn_{name}")(y)
            return nn.leaky_relu(y, 0.1)

        fm = stage(self.s8_dim, xfc, x8s, "8s")
        fm = _upsample_to(fm, x4s.shape[1:3])
        fm = stage(self.s4_dim, fm, x4s, "4s")
        fm = _upsample_to(fm, x2s.shape[1:3])
        fm = stage(self.s2_dim, fm, x2s, "2s")
        fm = _upsample_to(fm, inp.shape[1:3])
        fm = stage(self.raw_dim, fm, inp, "raw")
        out = nn.Conv(self.seg_dim + self.ver_dim, (1, 1), dtype=self.dtype,
                      name="head")(fm)
        if self.cast_output:
            out = out.astype(jnp.float32)
        seg = out[..., : self.seg_dim]
        vertex = out[..., self.seg_dim:]
        return {"seg": seg, "vertex": vertex}


@NETWORKS.register("res18")
def build_pvnet(cfg: Config) -> PVNet:
    net = cfg.network
    return PVNet(
        ver_dim=net.vote_dim,
        seg_dim=net.seg_dim,
        fc_dim=net.fc_dim,
        s8_dim=net.s8_dim,
        s4_dim=net.s4_dim,
        s2_dim=net.s2_dim,
        raw_dim=net.raw_dim,
        dtype=jnp.bfloat16 if net.use_bfloat16 else jnp.float32,
        bn_momentum=net.bn_momentum,
        bn_axis_name=cfg.mesh.data_axis if net.sync_bn else None,
    )


@partial(jax.jit, static_argnames=("cfg", "un_pnp"))
def decode_keypoints(
    seg: jax.Array,
    vertex: jax.Array,
    key: jax.Array,
    cfg: Config,
    un_pnp: bool = False,
):
    """Batched voting decode (counterpart of ref resnet18.py:65-76).

    seg [B, H, W, seg_dim] logits, vertex [B, H, W, 2*vn] →
      {mask [B,H,W], kpt_2d [B,vn,2], inlier_ratio [B,vn], valid [B]}
      (+ var [B,vn,2,2] when un_pnp, ref decode_keypoint's 512-hyp path).
    """
    v = cfg.voting
    b, h, w, _ = vertex.shape
    vn = vertex.shape[-1] // 2
    mask = jnp.argmax(seg, -1)
    vtx = vertex.reshape(b, h, w, vn, 2)
    keys = jax.random.split(key, b)

    if v.projective:
        # truncation-tolerant decode: homogeneous hypotheses, so keypoints
        # pushed outside (or to infinity of) the crop still vote coherently
        # (ref ransac_voting_kernel.cu:170-310, shipped unwired upstream).
        hom, ratio = jax.vmap(
            lambda m, vv, k: ransac_vote_projective(
                m,
                vv,
                k,
                num_hypotheses=v.num_hypotheses,
                inlier_thresh=v.inlier_thresh,
                max_pixels=v.max_pixels,
                min_pixels=v.min_pixels,
            )
        )(mask, vtx, keys)
        z = hom[..., 2]
        # finite ⇔ the intersection isn't (numerically) a vanishing direction
        finite = jnp.abs(z) > 1e-6 * jnp.maximum(
            jnp.max(jnp.abs(hom[..., :2]), -1), 1.0
        )
        kpt_2d = hom[..., :2] / jnp.where(finite, z, 1.0)[..., None]
        kpt_valid = finite & (ratio > 0)
        return {
            "mask": mask,
            "kpt_2d": jnp.where(kpt_valid[..., None], kpt_2d, 0.0),
            "kpt_hom": hom,
            "inlier_ratio": ratio,
            "kpt_valid": kpt_valid,
            "valid": jnp.any(kpt_valid, -1),
        }

    # optional seg-confidence weighting of the pixel sample (beyond-reference;
    # neural-guided-RANSAC-style): weight = P(foreground) from the softmax
    fg_w = (
        (1.0 - jax.nn.softmax(seg.astype(jnp.float32), -1)[..., 0],)
        if v.weighted_fg
        else ()
    )

    if not un_pnp:
        res = jax.vmap(
            lambda m, vv, k, *fw: ransac_vote(
                m,
                vv,
                k,
                num_hypotheses=v.num_hypotheses,
                num_rounds=v.num_rounds,
                inlier_thresh=v.inlier_thresh,
                max_pixels=v.max_pixels,
                min_pixels=v.min_pixels,
                confidence=v.confidence,
                approx_fg=v.approx_fg,
                strided_fg=v.strided_fg,
                fg_weights=fw[0] if fw else None,
            )
        )(mask, vtx, keys, *fg_w)
        return {
            "mask": mask,
            "kpt_2d": res.kpt_2d,
            "inlier_ratio": res.inlier_ratio,
            "valid": res.valid,
        }

    res, var = jax.vmap(
        lambda m, vv, k, *fw: ransac_vote_with_cov(
            m,
            vv,
            k,
            num_hypotheses=v.un_hypotheses,
            num_rounds=v.num_rounds,
            inlier_thresh=v.cov_inlier_thresh,
            max_pixels=v.un_max_pixels,
            min_pixels=v.min_pixels,
            hyp_chunk=128,
            confidence=v.confidence,
            cov_hypotheses=v.cov_hypotheses,
            cov_pixels=v.cov_pixels,
            cov_reuse=v.cov_reuse,
            approx_fg=v.approx_fg,
            strided_fg=v.strided_fg,
            fg_weights=fw[0] if fw else None,
        )
    )(mask, vtx, keys, *fg_w)
    return {
        "mask": mask,
        "kpt_2d": res.kpt_2d,
        "inlier_ratio": res.inlier_ratio,
        "valid": res.valid,
        "var": var,
    }
