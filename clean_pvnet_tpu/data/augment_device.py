"""On-device (jitted) training augmentation.

TPU-native replacement for the host augmentation pipeline (data/augment.py,
itself the behavioral counterpart of ref lib/datasets/augmentation.py and
transforms.py:29-99). Motivation: TPU hosts are often CPU-poor — on this
machine the per-item numpy work (2 warps + jitter + blur ≈ 100 ms on 2
cores) can never feed the chip. Instead the host ships cached raw uint8
frames and the whole augmentation runs inside the jitted train step as one
fused gather+elementwise program over the batch:

  * rotation about the instance centroid     (ref augmentation.py:61-71)
  * overlap-constrained crop + resize-back   (ref augmentation.py:131-170,
                                              266-295)
  * random gaussian blur + color jitter      (ref transforms.py:50-99)

The rotate→crop→resize chain composes into ONE affine per sample, so the
image is resampled once (4-tap bilinear gather) instead of twice as on the
host. The crop window needs the bbox of the *rotated* mask; instead of
materializing a rotated mask we rotate the foreground pixel coordinates and
take masked min/max — pure VPU reductions, no gather.

Restriction: one source resolution per batch, output resolution = source
resolution (the LINEMOD-native 480×640 case). Multi-bucket multi-scale
training keeps the host path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from clean_pvnet_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

_BLUR_RADIUS = 6  # ±2σ support at the largest reference sigma (9/3)


def _rotated_bbox(mask, cx, cy, cos, sin):
    """bbox (hmin, hmax, wmin, wmax) of the FG pixels after rotating them
    about (cx, cy). Matches taking nonzero() of the rotated mask (ref
    augmentation.py:45-47 runs on the already-rotated mask) without the
    warp: coordinates rotate, then masked min/max."""
    h, w = mask.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    # cv2 convention (rotation_matrix_2d): x' = ca·x + sa·y + tx,
    # y' = -sa·x + ca·y + ty rotating CCW in image coords
    rx = cos * (xs - cx) + sin * (ys - cy) + cx
    ry = -sin * (xs - cx) + cos * (ys - cy) + cy
    fg = mask > 0
    big = jnp.float32(1e9)
    hmin = jnp.min(jnp.where(fg, ry, big))
    hmax = jnp.max(jnp.where(fg, ry, -big))
    wmin = jnp.min(jnp.where(fg, rx, big))
    wmax = jnp.max(jnp.where(fg, rx, -big))
    return hmin, hmax, wmin, wmax


def sample_affine(key, mask, out_hw, train_cfg):
    """Draw one sample's augmentation affine.

    Returns (A_fwd [2,3], A_inv [2,3]): A_fwd maps source→output pixel
    coords (the matrix keypoints ride through), A_inv the inverse sampling
    map. Mirrors rotate_instance + crop_resize_instance_v1 (non-empty mask)
    and crop_or_padding_to_fixed_size (empty mask, ratio pinned to 1, no
    rotation) — ref lib/datasets/linemod/pvnet.py:62-78."""
    h, w = mask.shape
    out_h, out_w = out_hw
    k_rot, k_ratio, k_h, k_w = jax.random.split(key, 4)

    fg = mask > 0
    n_fg = jnp.sum(fg)
    empty = n_fg == 0
    nz = jnp.maximum(n_fg, 1).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cx = jnp.sum(jnp.where(fg, xs, 0.0)) / nz
    cy = jnp.sum(jnp.where(fg, ys, 0.0)) / nz

    deg = jax.random.uniform(
        k_rot, (), minval=train_cfg.rotate_min, maxval=train_cfg.rotate_max
    )
    deg = jnp.where(empty, 0.0, deg)
    a = jnp.deg2rad(deg)
    ca, sa = jnp.cos(a), jnp.sin(a)

    ratio = jax.random.uniform(
        k_ratio,
        (),
        minval=train_cfg.resize_ratio_min,
        maxval=train_cfg.resize_ratio_max,
    )
    ratio = jnp.where(empty, 1.0, ratio)
    th = out_h * ratio
    tw = out_w * ratio

    hmin, hmax, wmin, wmax = _rotated_bbox(mask, cx, cy, ca, sa)
    # empty mask: crop anywhere in-frame (ref crop_or_padding_to_fixed_size)
    hmin = jnp.where(empty, 0.0, hmin)
    wmin = jnp.where(empty, 0.0, wmin)
    fh = jnp.where(empty, jnp.float32(h), hmax - hmin)
    fw = jnp.where(empty, jnp.float32(w), wmax - wmin)
    ov = jnp.where(empty, 0.0, jnp.float32(train_cfg.overlap_ratio))

    def begin(kk, lo_anchor, f, t, full):
        # ref augmentation.py:51-57: keep ≥(1-overlap) of the instance inside
        rmax = jnp.minimum(lo_anchor + ov * f, full - t)
        rmin = jnp.maximum(lo_anchor + ov * f - t, 0.0)
        # empty mask: crop anywhere in-frame (ref augmentation.py:94-98)
        rmax = jnp.where(empty, jnp.maximum(full - t, 0.0), rmax)
        rmin = jnp.where(empty, 0.0, rmin)
        u = jax.random.uniform(kk, ())
        beg = rmin + u * jnp.maximum(rmax - rmin, 0.0)
        # target ≥ source: center the frame in the larger window (ref :64-73)
        return jnp.where(t >= full, -(t - full) / 2.0, beg)

    hbeg = begin(k_h, hmin, fh, th, jnp.float32(h))
    wbeg = begin(k_w, wmin, fw, tw, jnp.float32(w))

    # forward affine: scale(out/t) ∘ translate(-beg) ∘ rotate(center, θ)
    s_y = out_h / th
    s_x = out_w / tw
    tx = (1.0 - ca) * cx - sa * cy
    ty = sa * cx + (1.0 - ca) * cy
    A_fwd = jnp.stack(
        [
            jnp.stack([s_x * ca, s_x * sa, s_x * (tx - wbeg)]),
            jnp.stack([-s_y * sa, s_y * ca, s_y * (ty - hbeg)]),
        ]
    )
    # inverse of [[p, q], [r, s]] x + b
    det = A_fwd[0, 0] * A_fwd[1, 1] - A_fwd[0, 1] * A_fwd[1, 0]
    inv2 = (
        jnp.stack(
            [
                jnp.stack([A_fwd[1, 1], -A_fwd[0, 1]]),
                jnp.stack([-A_fwd[1, 0], A_fwd[0, 0]]),
            ]
        )
        / det
    )
    A_inv = jnp.concatenate([inv2, -inv2 @ A_fwd[:, 2:3]], -1)
    return A_fwd, A_inv


def affine_sample_bilinear(img, A_inv, out_hw, fill=0.0):
    """img [H,W,C] float32, A_inv 2×3 output→source map → [out_h,out_w,C].
    4-tap gather; out-of-frame taps read `fill`."""
    h, w = img.shape[:2]
    out_h, out_w = out_hw
    gx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    sx = A_inv[0, 0] * gx + A_inv[0, 1] * gy + A_inv[0, 2]
    sy = A_inv[1, 0] * gx + A_inv[1, 1] * gy + A_inv[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    flat = img.reshape(h * w, -1)

    def tap(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        idx = (
            jnp.clip(yy, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        )
        v = jnp.take(flat, idx.reshape(-1), axis=0).reshape(out_h, out_w, -1)
        return jnp.where(valid[..., None], v, fill)

    return (
        tap(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
        + tap(y0, x0 + 1) * (fx * (1 - fy))[..., None]
        + tap(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
        + tap(y0 + 1, x0 + 1) * (fx * fy)[..., None]
    )


def warp_rgb_mask_packed(img_u8, mask, A_inv, out_hw):
    """Fused bilinear-RGB + nearest-mask affine warp via ONE row gather.

    The naive formulation (4 bilinear `jnp.take` taps on the image + 1
    nearest tap on the mask) costs 5 gathers; on TPU the gather engine runs
    at ~7–8 ns *per gathered row* regardless of row width (measured: 17 ms
    per tap at [8,480,640]), so the augmentation paid ~88 ms/step. Instead:

      * pack RGB + mask into one u32 per pixel (r | g<<8 | b<<16 | m<<24);
      * build the shifted-neighbor table T[y,x] = (P[y,x], P[y,x+1],
        P[y+1,x], P[y+1,x+1]) — 16 contiguous bytes per pixel, pure
        shifts/concats at VPU/HBM speed;
      * gather ONE [4]-u32 row per output pixel at the clipped window start
        (y0c, x0c) = clip(floor(s), 0, dim-2), then select each tap from
        the 4-vector with elementwise `where`s.

    A valid tap always lands inside the clipped 2×2 window (x0c = clip(x0,
    0, w-2) shifts the window only when the tap itself is out of frame, and
    out-of-frame taps are masked to the fill value), so the result is
    bit-identical to the 4-tap formulation (asserted for the RGB path in
    tests/test_augment_device.py). The nearest mask tap round(s) =
    floor(s) + (frac ≥ 0.5) is one of the 4 corners; this differs from the
    previous `jnp.round` (half-to-even) only on exact .5 ties — measure-zero
    under the continuous random affines. Measured: 88.3 → 17.6 ms for the
    batch-8 480×640 warp.

    img_u8 [H,W,3] uint8, mask [H,W] integer in [0,255], A_inv [2,3]
    output→source map → (rgb float32 [oh,ow,3] fill 0, mask int32 [oh,ow]
    fill 0).
    """
    h, w = mask.shape
    out_h, out_w = out_hw
    i32 = img_u8.astype(jnp.uint32)
    packed = (i32[..., 0] | (i32[..., 1] << 8) | (i32[..., 2] << 16)
              | (mask.astype(jnp.uint32) << 24))
    px = jnp.concatenate([packed[:, 1:], packed[:, -1:]], 1)
    py = jnp.concatenate([packed[1:], packed[-1:]], 0)
    pxy = jnp.concatenate([py[:, 1:], py[:, -1:]], 1)
    T = jnp.stack([packed, px, py, pxy], -1).reshape(h * w, 4)

    gx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    sx = A_inv[0, 0] * gx + A_inv[0, 1] * gy + A_inv[0, 2]
    sy = A_inv[1, 0] * gx + A_inv[1, 1] * gy + A_inv[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0c = jnp.clip(x0i, 0, w - 2)
    y0c = jnp.clip(y0i, 0, h - 2)
    win = jnp.take(T, (y0c * w + x0c).reshape(-1), axis=0)
    win = win.reshape(out_h, out_w, 4)

    def tap(dy, dx):
        ry = jnp.clip(y0i + dy - y0c, 0, 1)
        rx = jnp.clip(x0i + dx - x0c, 0, 1)
        k = ry * 2 + rx
        v = jnp.where(k == 0, win[..., 0],
                      jnp.where(k == 1, win[..., 1],
                                jnp.where(k == 2, win[..., 2], win[..., 3])))
        valid = ((x0i + dx >= 0) & (x0i + dx < w)
                 & (y0i + dy >= 0) & (y0i + dy < h))
        return v, valid

    def rgb(v):
        return jnp.stack(
            [v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], -1
        ).astype(jnp.float32)

    acc = 0.0
    wts = [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy]
    for (dy, dx), wt in zip(((0, 0), (0, 1), (1, 0), (1, 1)), wts):
        v, valid = tap(dy, dx)
        acc = acc + jnp.where(valid[..., None], rgb(v), 0.0) * wt[..., None]

    ndy = (fy >= 0.5).astype(jnp.int32)
    ndx = (fx >= 0.5).astype(jnp.int32)
    vn, validn = tap(ndy, ndx)
    m = jnp.where(validn, (vn >> 24).astype(jnp.int32), 0)
    return acc, m


def affine_sample_nearest(img, A_inv, out_hw, fill=0):
    """Integer/nearest variant for masks; img [H,W] int."""
    h, w = img.shape
    out_h, out_w = out_hw
    gx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    sx = jnp.round(A_inv[0, 0] * gx + A_inv[0, 1] * gy + A_inv[0, 2])
    sy = jnp.round(A_inv[1, 0] * gx + A_inv[1, 1] * gy + A_inv[1, 2])
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    idx = (
        jnp.clip(sy, 0, h - 1).astype(jnp.int32) * w
        + jnp.clip(sx, 0, w - 1).astype(jnp.int32)
    )
    v = jnp.take(img.reshape(-1), idx.reshape(-1), axis=0).reshape(out_h, out_w)
    return jnp.where(valid, v, fill)


def randomize_background_device(key, img, mask, p):
    """Train-time background domain randomization, fully on device.

    With probability `p` per sample, replace the background pixels
    (mask == 0) of the warped float image [B,h,w,3] in [0,255] with a
    procedurally drawn background. Families (per-sample uniform):
      0. solid random color
      1. hard-edge two-color plaid (thresholded oriented sinusoid —
         hard-boundary periodic structure)
      2. blocky random noise (8×8 cells)
      3. linear two-color gradient at a random angle
    All pure iota/elementwise math + one tiny per-cell uniform tensor —
    no HBM gathers. Runs BEFORE the gaussian blur so composite edges get
    the same sensor blur as the rest of the frame (the same ordering the
    tless cut-paste pathway uses).

    Scope note for honest evals: the held-out `domain` stress split draws
    from a *different* generator (hard checkerboards / floor-division
    stripes / solids + photometric shifts, data/synthetic.py
    `_domain_background`); the solid family overlaps in character, the
    periodic families differ in construction. See ROUND4.md item 10.
    """
    b, h, w, _ = img.shape
    k_apply, k_fam, k_ca, k_cb, k_ang, k_per, k_ph, k_cell = (
        jax.random.split(key, 8)
    )
    apply = jax.random.uniform(k_apply, (b,)) < p
    fam = jax.random.randint(k_fam, (b,), 0, 4)
    col_a = jax.random.uniform(k_ca, (b, 1, 1, 3), maxval=255.0)
    col_b = jax.random.uniform(k_cb, (b, 1, 1, 3), maxval=255.0)
    ang = jax.random.uniform(k_ang, (b, 1, 1), maxval=jnp.pi)
    period = jax.random.uniform(k_per, (b, 1, 1), minval=16.0, maxval=96.0)
    phase = jax.random.uniform(k_ph, (b, 1, 1), maxval=2 * jnp.pi)

    xs = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 1)
    t = xs * jnp.cos(ang) + ys * jnp.sin(ang)  # [b, h, w]

    plaid_m = (jnp.sin(2 * jnp.pi * t / period + phase) > 0.0)
    plaid = jnp.where(plaid_m[..., None], col_a, col_b)

    grad_m = jnp.clip((t - jnp.min(t, (1, 2), keepdims=True))
                      / (jnp.max(t, (1, 2), keepdims=True)
                         - jnp.min(t, (1, 2), keepdims=True) + 1e-6),
                      0.0, 1.0)
    grad = grad_m[..., None] * col_a + (1.0 - grad_m[..., None]) * col_b

    cell = jax.random.uniform(
        k_cell, (b, (h + 7) // 8, (w + 7) // 8, 3), maxval=255.0
    )
    blocks = jnp.repeat(jnp.repeat(cell, 8, 1), 8, 2)[:, :h, :w]

    fam_b = fam[:, None, None, None]
    bg = jnp.where(fam_b == 0, col_a,
                   jnp.where(fam_b == 1, plaid,
                             jnp.where(fam_b == 2, blocks, grad)))
    replace = apply[:, None, None, None] & (mask[..., None] == 0)
    return jnp.where(replace, bg, img)


def wide_photometric_device(key, img, p):
    """Wide photometric augmentation: with probability `p` per sample,
    apply gain U(0.6,1.4) × per-channel cast U(0.85,1.15), gamma
    U(0.7,1.3), and 3× the base sensor noise — the appearance-shift axes
    the held-out domain split stresses (data/synthetic.py domain
    photometrics; matching the RANGES is standard photometric
    augmentation, and the domain split stays held-out in its background
    generator and concrete draws). img float [B,h,w,3] in [0,255]."""
    b = img.shape[0]
    k_apply, k_gain, k_cast, k_gamma, k_noise = jax.random.split(key, 5)
    apply = (jax.random.uniform(k_apply, (b,)) < p)[:, None, None, None]
    gain = jax.random.uniform(k_gain, (b, 1, 1, 1), minval=0.6, maxval=1.4)
    cast = jax.random.uniform(k_cast, (b, 1, 1, 3), minval=0.85, maxval=1.15)
    gamma = jax.random.uniform(k_gamma, (b, 1, 1, 1), minval=0.7, maxval=1.3)
    y = jnp.clip(img / 255.0 * gain * cast, 0.0, 1.0)
    y = jnp.power(jnp.maximum(y, 1e-6), gamma)
    y = y + jax.random.normal(k_noise, img.shape) * 0.03
    y = jnp.clip(y, 0.0, 1.0) * 255.0
    return jnp.where(apply, y, img)


def color_jitter_device(key, img):
    """Fused ColorJitter(0.1, 0.1, 0.05, 0.05) on float [B,H,W,3] in
    [0,255]; identical formulation to the host fast path
    (utils/image.color_jitter, ref transforms.py:50-66)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    n = img.shape[0]
    b = jax.random.uniform(kb, (n,), minval=0.9, maxval=1.1)
    c = jax.random.uniform(kc, (n,), minval=0.9, maxval=1.1)
    s = jax.random.uniform(ks, (n,), minval=0.95, maxval=1.05)
    shift = jax.random.uniform(kh, (n,), minval=-0.05, maxval=0.05)
    bb = b[:, None, None, None]
    cc = c[:, None, None, None]
    ss = s[:, None, None, None]
    gray = jnp.mean(img, -1, keepdims=True)
    mean = jnp.mean(img, (1, 2, 3), keepdims=True)
    y = (bb * cc * ss) * img + (bb * cc) * (1.0 - ss) * gray + bb * (1.0 - cc) * mean
    aa = jnp.abs(shift)[:, None, None, None]
    y = (1.0 - aa) * y + aa * jnp.roll(y, 1, axis=-1)
    return jnp.clip(y, 0.0, 255.0)


def gaussian_blur_device(key, img, p=0.5):
    """RandomBlur(p) with per-sample σ ∈ {3,5,7,9}/3 (ref transforms.py:81-86
    via the host photometric_train); separable 13-tap pass, non-blurred
    samples get a delta kernel — all static shapes."""
    bsz = img.shape[0]
    k_apply, k_sigma = jax.random.split(key)
    apply = jax.random.uniform(k_apply, (bsz,)) < p
    sigma = jax.random.choice(
        k_sigma, jnp.asarray([1.0, 5.0 / 3.0, 7.0 / 3.0, 3.0]), (bsz,)
    )
    offs = jnp.arange(-_BLUR_RADIUS, _BLUR_RADIUS + 1, dtype=jnp.float32)
    # ±2σ truncation like the host path: zero taps beyond 2σ
    win = jnp.abs(offs)[None, :] <= 2.0 * sigma[:, None] + 0.5
    kern = jnp.exp(-0.5 * (offs[None, :] / sigma[:, None]) ** 2) * win
    kern = kern / jnp.sum(kern, -1, keepdims=True)
    delta = (offs == 0).astype(jnp.float32)
    kern = jnp.where(apply[:, None], kern, delta[None, :])  # [B, 13]

    taps = 2 * _BLUR_RADIUS + 1
    h, w = img.shape[1:3]
    xp = jnp.pad(img, ((0, 0), (_BLUR_RADIUS, _BLUR_RADIUS), (0, 0), (0, 0)),
                 mode="symmetric")
    img = sum(
        kern[:, i, None, None, None] * jax.lax.slice_in_dim(xp, i, i + h, axis=1)
        for i in range(taps)
    )
    xp = jnp.pad(img, ((0, 0), (0, 0), (_BLUR_RADIUS, _BLUR_RADIUS), (0, 0)),
                 mode="symmetric")
    return sum(
        kern[:, i, None, None, None] * jax.lax.slice_in_dim(xp, i, i + w, axis=2)
        for i in range(taps)
    )


@partial(jax.jit, static_argnames=("train_cfg", "out_hw"))
def augment_batch_device(key, img_u8, mask, kpt_2d, train_cfg, out_hw=None):
    """Full train-time augmentation on device.

    img_u8 [B,H,W,3] uint8 raw frames, mask [B,H,W] {0,1}, kpt_2d [B,K,2]
    (source-frame coords) → (inp [B,h,w,3] float32 ImageNet-normalized,
    mask [B,h,w] int32, kpt_2d [B,K,2]). `train_cfg` must be hashable
    (frozen dataclass) — it parameterizes the trace, not the data.
    """
    bsz, h, w = img_u8.shape[:3]
    out_hw = (h, w) if out_hw is None else out_hw
    k_aff, k_blur, k_jit, k_bg, k_photo = jax.random.split(key, 5)

    affs = jax.vmap(lambda kk, m: sample_affine(kk, m, out_hw, train_cfg))(
        jax.random.split(k_aff, bsz), mask
    )
    A_fwd, A_inv = affs

    img, mask_w = jax.vmap(
        lambda im, m, ai: warp_rgb_mask_packed(im, m, ai, out_hw)
    )(img_u8, mask, A_inv)
    ones = jnp.ones(kpt_2d.shape[:-1] + (1,), kpt_2d.dtype)
    kpt_w = jnp.einsum(
        "bij,bkj->bki", A_fwd, jnp.concatenate([kpt_2d, ones], -1)
    )

    bg_p = float(getattr(train_cfg, "bg_randomize", 0.0))
    if bg_p > 0.0:
        img = randomize_background_device(k_bg, img, mask_w, bg_p)
    img = gaussian_blur_device(k_blur, img)
    img = color_jitter_device(k_jit, img)
    photo_p = float(getattr(train_cfg, "wide_photometric", 0.0))
    if photo_p > 0.0:
        img = wide_photometric_device(k_photo, img, photo_p)
    inp = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return inp, mask_w, kpt_w
