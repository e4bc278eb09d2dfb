"""Host-side numpy image ops (no OpenCV dependency).

The reference leans on cv2 for warps/resizes/blur
(ref lib/datasets/augmentation.py, transforms.py); the environment here has
no cv2, so these are self-contained vectorized numpy equivalents used by the
host data pipeline.  Convention: affine matrices M are 2×3 mapping
*output→?* no — mapping input→output pixel coords (like cv2.warpAffine),
and sampling inverts them internally.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def rotation_matrix_2d(center: tuple[float, float], degrees: float) -> np.ndarray:
    """2×3 affine rotating by `degrees` CCW about `center`
    (same semantics as cv2.getRotationMatrix2D with scale=1)."""
    a = np.deg2rad(degrees)
    ca, sa = np.cos(a), np.sin(a)
    cx, cy = center
    # cv2 convention: positive angle is counter-clockwise in image coords
    M = np.array([[ca, sa, (1 - ca) * cx - sa * cy],
                  [-sa, ca, sa * cx + (1 - ca) * cy]], np.float64)
    return M


def _invert_affine(M: np.ndarray) -> np.ndarray:
    A = M[:, :2]
    b = M[:, 2]
    Ainv = np.linalg.inv(A)
    return np.concatenate([Ainv, -Ainv @ b[:, None]], -1)


def warp_affine(
    img: np.ndarray,
    M: np.ndarray,
    out_hw: tuple[int, int],
    interp: str = "linear",
    border_value: float = 0.0,
) -> np.ndarray:
    """Apply 2×3 affine M (input→output mapping) like cv2.warpAffine."""
    th, tw = out_hw
    Minv = _invert_affine(np.asarray(M, np.float64))

    # native OpenMP fast path for uint8 (the data-loader hot case)
    if img.dtype == np.uint8:
        from clean_pvnet_tpu import native

        if interp == "linear" and (img.ndim == 3 or img.ndim == 2):
            out = native.warp_affine_u8(img, Minv, out_hw, border_value)
            if out is not None:
                return out
        elif interp == "nearest" and img.ndim == 2:
            out = native.warp_affine_nearest_u8(img, Minv, out_hw, border_value)
            if out is not None:
                return out
    xs, ys = np.meshgrid(np.arange(tw, dtype=np.float64),
                         np.arange(th, dtype=np.float64))
    sx = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    sy = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
    if interp == "nearest":
        sxi = np.round(sx).astype(np.int64)
        syi = np.round(sy).astype(np.int64)
        valid = (sxi >= 0) & (sxi < img.shape[1]) & (syi >= 0) & (syi < img.shape[0])
        sxi = np.clip(sxi, 0, img.shape[1] - 1)
        syi = np.clip(syi, 0, img.shape[0] - 1)
        out = img[syi, sxi]
        if out.ndim == 3:
            out = np.where(valid[..., None], out, border_value)
        else:
            out = np.where(valid, out, border_value)
        return out.astype(img.dtype)

    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    h, w = img.shape[:2]
    imgf = img.astype(np.float64)
    if imgf.ndim == 2:
        imgf = imgf[..., None]

    def sample(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xc = np.clip(xx, 0, w - 1)
        yc = np.clip(yy, 0, h - 1)
        v = imgf[yc, xc]
        return np.where(valid[..., None], v, border_value)

    out = (
        sample(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
        + sample(y0, x0 + 1) * (fx * (1 - fy))[..., None]
        + sample(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
        + sample(y0 + 1, x0 + 1) * (fx * fy)[..., None]
    )
    if img.ndim == 2:
        out = out[..., 0]
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.round(out), np.iinfo(img.dtype).min, np.iinfo(img.dtype).max)
    return out.astype(img.dtype)


def resize(img: np.ndarray, out_hw: tuple[int, int], interp: str = "linear") -> np.ndarray:
    """Resize like cv2.resize (align corners = False / half-pixel centers)."""
    th, tw = out_hw
    h, w = img.shape[:2]
    if (h, w) == (th, tw):
        return img.copy()
    sy, sx = h / th, w / tw
    # half-pixel center mapping: src = (dst + 0.5) * scale - 0.5
    M = np.array([[1.0 / sx, 0, 0.5 / sx - 0.5], [0, 1.0 / sy, 0.5 / sy - 0.5]])
    return warp_affine(img, M, (th, tw), interp=interp)


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    out = ndimage.gaussian_filter(
        img.astype(np.float32),
        sigma=(sigma, sigma, 0) if img.ndim == 3 else sigma,
        truncate=2.0,  # ±2σ support: visually identical, ~30% cheaper
    )
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.round(out), 0, 255)
    return out.astype(img.dtype)


def color_jitter(
    img: np.ndarray,
    rng: np.random.RandomState,
    brightness: float = 0.1,
    contrast: float = 0.1,
    saturation: float = 0.05,
    hue: float = 0.05,
) -> np.ndarray:
    """Approximate torchvision ColorJitter on uint8 RGB
    (ref transforms.py:50-66)."""
    # fused single-pass formulation (the loader hot path):
    #   y = b·c·s·x + b·c·(1−s)·gray + b·(1−c)·mean, then hue channel-mix
    b = rng.uniform(1 - brightness, 1 + brightness) if brightness > 0 else 1.0
    c = rng.uniform(1 - contrast, 1 + contrast) if contrast > 0 else 1.0
    s = rng.uniform(1 - saturation, 1 + saturation) if saturation > 0 else 1.0
    shift = rng.uniform(-hue, hue) if hue > 0 else 0.0

    x = img.astype(np.float32)
    gray = x.mean(-1, keepdims=True)
    mean = float(x.mean())
    y = (b * c * s) * x + (b * c * (1.0 - s)) * gray + (b * (1.0 - c)) * mean
    if shift != 0.0:
        a = abs(shift)
        y *= 1.0 - a
        y += a * np.roll(y, 1, axis=-1)
    return np.clip(y, 0, 255).astype(np.uint8)
