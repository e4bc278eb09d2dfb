"""Geometric + photometric training augmentation (host-side numpy).

Behavioral counterparts of reference lib/datasets/augmentation.py:
  rotate_instance            (:61-71)  rotate about the instance centroid
  crop_or_padding_to_fixed_size_instance (:131-170) overlap-constrained crop
  crop_resize_instance_v1    (:266-295) crop a scaled window then resize back
  crop_or_padding_to_fixed_size (:173-199) for empty-mask samples
and of transforms.py's RandomBlur/ColorJitter/Normalize (:29-99).

Keypoints ride along as homogeneous rows `hcoords [K, 3]` exactly like the
reference so downstream vertex-field math is identical.
"""

from __future__ import annotations

import numpy as np

from clean_pvnet_tpu.utils.image import (
    color_jitter,
    gaussian_blur,
    resize,
    rotation_matrix_2d,
    warp_affine,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def rotate_instance(img, mask, hcoords, rot_min, rot_max, rng):
    degree = rng.uniform(rot_min, rot_max)
    hs, ws = np.nonzero(mask)
    center = (float(np.mean(ws)), float(np.mean(hs)))
    M = rotation_matrix_2d(center, degree)
    img = warp_affine(img, M, img.shape[:2], interp="linear")
    mask = warp_affine(mask, M, mask.shape[:2], interp="nearest")
    last = np.asarray([[0, 0, 1]], np.float64)
    hcoords = hcoords @ np.concatenate([M, last], 0).T
    return img, mask, hcoords


def crop_or_padding_to_fixed_size_instance(img, mask, hcoords, th, tw,
                                           overlap_ratio, rng):
    h, w = img.shape[:2]
    hs, ws = np.nonzero(mask)
    hmin, hmax = np.min(hs), np.max(hs)
    wmin, wmax = np.min(ws), np.max(ws)
    fh, fw = hmax - hmin, wmax - wmin
    hpad, wpad = th >= h, tw >= w

    hrmax = int(min(hmin + overlap_ratio * fh, h - th))
    hrmin = int(max(hmin + overlap_ratio * fh - th, 0))
    wrmax = int(min(wmin + overlap_ratio * fw, w - tw))
    wrmin = int(max(wmin + overlap_ratio * fw - tw, 0))

    hbeg = 0 if hpad else rng.randint(hrmin, max(hrmax, hrmin + 1))
    wbeg = 0 if wpad else rng.randint(wrmin, max(wrmax, wrmin + 1))
    img = img[hbeg : hbeg + th, wbeg : wbeg + tw]
    mask = mask[hbeg : hbeg + th, wbeg : wbeg + tw]
    hcoords = hcoords.copy()
    hcoords[:, 0] -= wbeg * hcoords[:, 2]
    hcoords[:, 1] -= hbeg * hcoords[:, 2]

    if hpad or wpad:
        nh, nw = img.shape[:2]
        new_img = np.zeros([th, tw, 3], img.dtype)
        new_mask = np.zeros([th, tw], mask.dtype)
        ob = 0 if not hpad else (th - h) // 2
        owb = 0 if not wpad else (tw - w) // 2
        new_img[ob : ob + nh, owb : owb + nw] = img
        new_mask[ob : ob + nh, owb : owb + nw] = mask
        hcoords[:, 0] += owb * hcoords[:, 2]
        hcoords[:, 1] += ob * hcoords[:, 2]
        img, mask = new_img, new_mask
    return img, mask, hcoords


def crop_resize_instance_v1(img, mask, hcoords, imheight, imwidth,
                            overlap_ratio, ratio_min, ratio_max, rng):
    resize_ratio = rng.uniform(ratio_min, ratio_max)
    th = int(imheight * resize_ratio)
    tw = int(imwidth * resize_ratio)
    img, mask, hcoords = crop_or_padding_to_fixed_size_instance(
        img, mask, hcoords, th, tw, overlap_ratio, rng
    )
    img = resize(img, (imheight, imwidth), interp="linear")
    mask = resize(mask, (imheight, imwidth), interp="nearest")
    hcoords = hcoords.copy()
    hcoords[:, 0] /= resize_ratio
    hcoords[:, 1] /= resize_ratio
    return img, mask, hcoords


def crop_or_padding_to_fixed_size(img, mask, th, tw, rng):
    h, w = img.shape[:2]
    hpad, wpad = th >= h, tw >= w
    hbeg = 0 if hpad else rng.randint(0, h - th)
    wbeg = 0 if wpad else rng.randint(0, w - tw)
    img = img[hbeg : hbeg + th, wbeg : wbeg + tw]
    mask = mask[hbeg : hbeg + th, wbeg : wbeg + tw]
    if hpad or wpad:
        nh, nw = img.shape[:2]
        new_img = np.zeros([th, tw, 3], img.dtype)
        new_mask = np.zeros([th, tw], mask.dtype)
        ob = 0 if not hpad else (th - h) // 2
        owb = 0 if not wpad else (tw - w) // 2
        new_img[ob : ob + nh, owb : owb + nw] = img
        new_mask[ob : ob + nh, owb : owb + nw] = mask
        img, mask = new_img, new_mask
    return img, mask


def augment_pvnet(img, mask, kpt_2d, height, width, train_cfg, rng):
    """Full train-time augmentation (ref lib/datasets/linemod/pvnet.py:62-78)."""
    hcoords = np.concatenate([kpt_2d, np.ones((len(kpt_2d), 1))], -1)
    img = np.asarray(img).astype(np.uint8)
    if mask.sum() > 0:
        img, mask, hcoords = rotate_instance(
            img, mask, hcoords, train_cfg.rotate_min, train_cfg.rotate_max, rng
        )
        img, mask, hcoords = crop_resize_instance_v1(
            img, mask, hcoords, height, width,
            train_cfg.overlap_ratio,
            train_cfg.resize_ratio_min,
            train_cfg.resize_ratio_max,
            rng,
        )
    else:
        img, mask = crop_or_padding_to_fixed_size(img, mask, height, width, rng)
    return img, mask, hcoords[:, :2]


def photometric_train(img, rng):
    """RandomBlur(0.5) + ColorJitter(0.1, 0.1, 0.05, 0.05)
    (ref transforms.py:81-90)."""
    if rng.rand() < 0.5:
        sigma = rng.choice([3, 5, 7, 9]) / 3.0  # kernel size → rough sigma
        img = gaussian_blur(img, sigma)
    img = color_jitter(img, rng, 0.1, 0.1, 0.05, 0.05)
    return img


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 HWC RGB → float32 HWC, ImageNet-normalized (ref transforms.py:35-47;
    NHWC kept — the TPU model is NHWC, no transpose)."""
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
