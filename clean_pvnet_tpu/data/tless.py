"""T-LESS-style multi-instance data pipeline.

Behavioral counterparts of the reference's T-LESS stack:
  * cut-and-paste scene composition for detector training — target +
    distractor object crops pasted onto backgrounds with occlusion-ratio
    rejection (ref lib/datasets/tless/ct.py:26-57,
    lib/datasets/tless_train/pvnet.py:33-125)
  * CenterNet training targets: per-instance gaussian splat on the class
    heatmap + wh regression at the center index (ref lib/utils/ct/
    ct_utils.py draw_umich_gaussian semantics)
  * symmetry canonicalization: continuous-z and discrete rotation groups
    rectified to a canonical pose so symmetric views share targets
    (ref lib/datasets/tless/symmetry_utils.py:6-56, applied in
    tless_to_coco.py:228-266)

Scenes are composed from rendered single-object sprites (data/synthetic.py
renders them without Blender), so the full detector → crop → vote cascade
trains and evaluates hermetically.
"""

from __future__ import annotations

import numpy as np


def gaussian_radius(det_size: tuple[float, float], min_overlap: float = 0.7) -> float:
    """CornerNet radius heuristic (ref ct_utils.gaussian_radius)."""
    h, w = det_size
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(max(b1**2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = np.sqrt(max(b2**2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = np.sqrt(max(b3**2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / 2
    return max(min(r1, r2, r3), 0)


def draw_gaussian(heatmap: np.ndarray, center: tuple[int, int], radius: int):
    """Splat a 2D gaussian with max-combine (ref draw_umich_gaussian)."""
    r = max(int(radius), 1)
    diameter = 2 * r + 1
    sigma = diameter / 6.0
    xs = np.arange(-r, r + 1)
    g = np.exp(-(xs[None] ** 2 + xs[:, None] ** 2) / (2 * sigma * sigma))
    cx, cy = int(center[0]), int(center[1])
    h, w = heatmap.shape
    l, rr = min(cx, r), min(w - cx, r + 1)
    t, b = min(cy, r), min(h - cy, r + 1)
    if l + rr <= 0 or t + b <= 0:
        return heatmap
    patch = heatmap[cy - t : cy + b, cx - l : cx + rr]
    np.maximum(patch, g[r - t : r + b, r - l : r + rr], out=patch)
    return heatmap


def make_ct_targets(
    boxes: np.ndarray,       # [N, 4] x1 y1 x2 y2 in input pixels
    classes: np.ndarray,     # [N] int
    hw: tuple[int, int],     # input size
    num_classes: int,
    down_ratio: int = 4,
    max_objs: int = 32,
):
    """Build CenterNet targets (heatmap, wh, flat ct indices, validity)."""
    oh, ow = hw[0] // down_ratio, hw[1] // down_ratio
    hm = np.zeros((oh, ow, num_classes), np.float32)
    wh = np.zeros((max_objs, 2), np.float32)
    ct_ind = np.zeros((max_objs,), np.int64)
    valid = np.zeros((max_objs,), bool)
    for i, (box, cls) in enumerate(zip(boxes[:max_objs], classes[:max_objs])):
        x1, y1, x2, y2 = box / down_ratio
        w_box, h_box = x2 - x1, y2 - y1
        if w_box <= 0 or h_box <= 0:
            continue
        cx = int(np.clip((x1 + x2) / 2, 0, ow - 1))
        cy = int(np.clip((y1 + y2) / 2, 0, oh - 1))
        radius = gaussian_radius((np.ceil(h_box), np.ceil(w_box)))
        draw_gaussian(hm[..., int(cls)], (cx, cy), int(radius))
        wh[i] = [w_box, h_box]
        ct_ind[i] = cy * ow + cx
        valid[i] = True
    return {"ct_hm": hm, "wh": wh, "ct_ind": ct_ind, "ct_valid": valid}


def rectify_symmetric_rotation(pose: np.ndarray, sym: str = "z") -> np.ndarray:
    """Canonicalize rotations of symmetric objects.

    For continuous z-symmetry (most T-LESS cylinders): choose the in-plane
    rotation about the object z-axis that maximizes alignment of the
    object x-axis with the camera's viewing-plane reference — the same goal
    as the reference's per-class rotation rectification
    (ref symmetry_utils.py:6-56); symmetric views then map to one pose.
    """
    if sym != "z":
        return pose
    R = pose[:, :3]
    # angle that rotates object x-axis (in camera frame) to zero azimuth
    # about the object z-axis
    z_axis = R[:, 2]
    x_axis = R[:, 0]
    y_axis = R[:, 1]
    # camera-frame reference direction orthogonal to z_axis
    ref = np.array([0.0, 0.0, 1.0])
    proj = ref - z_axis * (ref @ z_axis)
    n = np.linalg.norm(proj)
    if n < 1e-6:
        return pose
    proj /= n
    cos_t = x_axis @ proj
    sin_t = y_axis @ proj
    theta = np.arctan2(sin_t, cos_t)
    c, s = np.cos(theta), np.sin(theta)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    out = pose.copy()
    out[:, :3] = R @ Rz
    return out


def sample_background(
    rng: np.random.RandomState,
    hw: tuple[int, int],
    bg_dir: str | None = None,
) -> np.ndarray:
    """Background frame for cut-paste composition, in [0, 1] float.

    When `bg_dir` holds real photographs (the reference pastes T-LESS crops
    onto SUN2012 images, ref lib/datasets/tless_train/pvnet.py:33-125 —
    point this at such a directory), a random image is loaded and
    random-cropped/resized to `hw`; otherwise falls back to the procedural
    texture (data/synthetic.py), which keeps the pipeline hermetic in
    environments without the SUN2012 download.
    """
    h, w = hw
    if bg_dir:
        import os

        files = getattr(sample_background, "_cache", {}).get(bg_dir)
        if files is None:
            exts = (".jpg", ".jpeg", ".png", ".bmp")
            files = sorted(
                os.path.join(bg_dir, f)
                for f in os.listdir(bg_dir)
                if f.lower().endswith(exts)
            )
            sample_background._cache = {
                **getattr(sample_background, "_cache", {}), bg_dir: files,
            }
        if files:
            from PIL import Image

            img = Image.open(files[rng.randint(len(files))]).convert("RGB")
            iw, ih = img.size
            # random crop of the target aspect, then resize — same spirit as
            # the reference's random SUN2012 window
            scale = max(h / ih, w / iw)
            if scale > 1.0:  # upscale small backgrounds first
                img = img.resize((int(np.ceil(iw * scale)),
                                  int(np.ceil(ih * scale))))
                iw, ih = img.size
            x0 = rng.randint(max(iw - w, 0) + 1)
            y0 = rng.randint(max(ih - h, 0) + 1)
            img = img.crop((x0, y0, x0 + w, y0 + h))
            return np.asarray(img, np.float32) / 255.0
    from clean_pvnet_tpu.data.synthetic import _background

    return _background(rng, h, w)


def paste_sprite(
    scene: np.ndarray,       # [H, W, 3] float
    seg: np.ndarray,         # [H, W] int — instance id map
    sprite_rgb: np.ndarray,  # [h, w, 3]
    sprite_mask: np.ndarray, # [h, w]
    top_left: tuple[int, int],
    inst_id: int,
):
    """Cut-paste composite with occlusion bookkeeping
    (ref tless/fuse.py:21-78 semantics: later paste occludes earlier)."""
    H, W = seg.shape
    y0, x0 = top_left
    h, w = sprite_mask.shape
    ys0, xs0 = max(0, -y0), max(0, -x0)
    ys1 = min(h, H - y0)
    xs1 = min(w, W - x0)
    if ys1 <= ys0 or xs1 <= xs0:
        return
    sub_m = sprite_mask[ys0:ys1, xs0:xs1] > 0
    dy0, dx0 = y0 + ys0, x0 + xs0
    region_rgb = scene[dy0 : dy0 + ys1 - ys0, dx0 : dx0 + xs1 - xs0]
    region_seg = seg[dy0 : dy0 + ys1 - ys0, dx0 : dx0 + xs1 - xs0]
    region_rgb[sub_m] = sprite_rgb[ys0:ys1, xs0:xs1][sub_m]
    region_seg[sub_m] = inst_id


def visible_ratio(seg: np.ndarray, inst_id: int, full_area: int) -> float:
    """Fraction of an instance still visible after later pastes
    (ref tless_train/pvnet.py occlusion-ratio rejection)."""
    if full_area <= 0:
        return 0.0
    return float((seg == inst_id).sum()) / float(full_area)
