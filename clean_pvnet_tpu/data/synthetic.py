"""Synthetic LINEMOD-style dataset generator.

The reference assumes the LINEMOD archives are downloaded
(ref README.md:84-124); this environment has no dataset, so this module
renders one: an irregular convex mesh with vertex colors, posed randomly
over textured backgrounds, annotated in the exact COCO-style schema that
the reference's converter emits (fps_2d/fps_3d/center_2d/center_3d/K/pose/
mask_path/type/cls, ref lib/datasets/linemod/linemod_to_coco.py:260-308).
Everything downstream (dataset class, trainer, evaluator) is therefore
exercised end-to-end with real geometry, and swapping in actual LINEMOD
data is just pointing at different json.
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from clean_pvnet_tpu.geometry.fps import farthest_point_sampling_np
from clean_pvnet_tpu.ops.rasterize import render_mesh_np
from clean_pvnet_tpu.utils.ply import save_ply

LINEMOD_K = np.array(
    [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
    np.float64,
)


def icosphere(subdiv: int = 1) -> tuple[np.ndarray, np.ndarray]:
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        cache: dict[tuple[int, int], int] = {}
        vlist = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (vlist[a] + vlist[b]) / 2.0
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m)
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, np.int64)
    return verts, faces


def make_synthetic_mesh(seed: int = 0, radius: float = 0.06):
    """Irregular star-convex mesh ≈ LINEMOD 'cat'-scale (diameter ~15 cm)."""
    rng = np.random.RandomState(seed)
    verts, faces = icosphere(2)
    # smooth radial perturbation from a few random spherical harmonics-ish lobes
    dirs = rng.randn(6, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    amp = rng.uniform(0.1, 0.35, 6)
    r = np.ones(len(verts))
    for d, a in zip(dirs, amp):
        r += a * np.maximum(verts @ d, 0.0) ** 2
    verts = verts * (r[:, None] * radius)
    colors = 0.25 + 0.75 * np.abs(
        np.stack(
            [np.sin(verts @ rng.randn(3) * 40),
             np.cos(verts @ rng.randn(3) * 40),
             np.sin(verts @ rng.randn(3) * 40 + 1.0)],
            -1,
        )
    )
    return verts, faces, colors


def procedural_texture(pos01: np.ndarray, seed: int) -> np.ndarray:
    """Sharp per-pixel 3D texture: seeded color cells + sine gratings.

    `pos01` [..., 3] are object-space surface positions normalized to
    [0, 1] (obtained by rasterizing vertex positions as 'colors', which
    render_mesh_np interpolates perspective-correctly per pixel). The cell
    component quantizes position into an 8³ lattice hashed into a color
    LUT — hard edges that carry orientation information the way LINEMOD's
    dense object textures do; the per-vertex-color texture the generator
    used before is resolution-limited by the 162-vertex icosphere and
    renders too blurry to disambiguate the pose of a near-convex object.
    """
    rs = np.random.RandomState(seed)
    w1 = rs.randn(3, 3) * 14.0
    phase = rs.rand(3) * 6.0
    grat = 0.5 + 0.5 * np.sin(pos01 @ w1 + phase)
    cell = np.floor(pos01 * 8.0).astype(np.int64)
    hsh = (cell @ rs.randint(1, 10**6, 3)) % 251
    lut = rs.rand(251, 3) * 0.9 + 0.05
    cells = lut[hsh]
    return np.clip(0.6 * cells + 0.4 * grat, 0.0, 1.0)


def render_textured(verts, faces, K, rt, hw, tex_seed: int):
    """Rasterize with the per-pixel procedural texture: first pass renders
    normalized object-space positions as 'colors', second maps them through
    `procedural_texture`. Returns (color, depth, mask) like render_mesh_np."""
    vmin = verts.min(0)
    vspan = verts.max(0) - vmin
    pos_map, dep, mask = render_mesh_np(
        verts, faces, K, rt, hw, (verts - vmin) / vspan
    )
    color = procedural_texture(np.clip(pos_map, 0.0, 1.0), tex_seed)
    return np.where(mask[..., None] > 0, color, 0.0), dep, mask


def random_rotation(rng) -> np.ndarray:
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def _background(rng, h, w):
    """Cheap textured background: low-freq gradients + noise."""
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    base = np.stack(
        [
            0.3 + 0.4 * np.sin(xx * rng.uniform(2, 8) + rng.rand() * 6),
            0.3 + 0.4 * np.cos(yy * rng.uniform(2, 8) + rng.rand() * 6),
            0.3 + 0.4 * np.sin((xx + yy) * rng.uniform(2, 6)),
        ],
        -1,
    )
    # ceil-divide so non-multiple-of-4 sizes still tile the full frame
    noise = rng.rand((h + 3) // 4, (w + 3) // 4, 3)
    noise = np.kron(noise, np.ones((4, 4, 1)))[:h, :w]
    return np.clip(0.7 * base + 0.3 * noise, 0, 1)


def _composite_occluders(rng, occluders, K, hw, x, y, z, zbuf, frame_color,
                         vis, n_occ, z_near=(0.7, 0.92), obj_radius=0.08):
    """Render `n_occ` distractor meshes in front of the target and composite
    them into (zbuf, frame_color, vis). Shared by the occlusion stress split
    and train-time occluder augmentation (the reference's fuse pathway,
    ref lib/datasets/linemod/linemod_to_coco.py:260-301 'fuse' records and
    lib/datasets/tless/fuse.py:21-78 compose distractors into train scenes).
    Returns the updated (zbuf, frame_color, vis)."""
    h, w = hw
    for _ in range(n_occ):
        ov, of, oc = occluders[rng.randint(len(occluders))]
        oR = random_rotation(rng)
        oz = z * rng.uniform(*z_near)
        # aim at the target's silhouette: offset the occluder center by
        # ~0.5-1.5 object radii in a random direction so it clips a side
        # instead of blotting out the whole object (partial occlusion is
        # what the fuse pathway trains against)
        ang = rng.uniform(0.0, 2.0 * np.pi)
        mag = rng.uniform(0.5, 1.5) * obj_radius
        jx = x * oz / z + np.cos(ang) * mag
        jy = y * oz / z + np.sin(ang) * mag
        ort = np.concatenate([oR, np.array([[jx], [jy], [oz]])], -1)
        ocolor, odep, omask = render_mesh_np(ov, of, K, ort, hw, oc)
        in_front = omask.astype(bool) & (
            np.where(odep > 0, odep, np.inf) < zbuf
        )
        zbuf = np.where(in_front, odep, zbuf)
        frame_color = np.where(in_front[..., None], ocolor, frame_color)
        vis = vis & ~in_front
    return zbuf, frame_color, vis


def _border_xy(rng, K, hw, z):
    """Aim the object center at a frame border so ~30-60% is cut off —
    the Truncation-LINEMOD pose family (ref TRUNCATION_LINEMOD.md:1-10).
    Shared by the truncation stress split and train-time truncation
    augmentation."""
    h, w = hw
    edge = rng.randint(4)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = rng.uniform(0.05, 0.95) * w
    v = rng.uniform(0.05, 0.95) * h
    if edge == 0:
        u = rng.uniform(-0.02, 0.04) * w
    elif edge == 1:
        u = w * (1.0 + rng.uniform(-0.04, 0.02))
    elif edge == 2:
        v = rng.uniform(-0.02, 0.04) * h
    else:
        v = h * (1.0 + rng.uniform(-0.04, 0.02))
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    return x, y


def generate_synthetic_dataset(
    root: str,
    cls: str = "synth",
    n_train: int = 64,
    n_test: int = 16,
    hw: tuple[int, int] = (480, 640),
    seed: int = 0,
    n_keypoints: int = 8,
    depth: bool = False,
    texture_seed: int | None = None,
    occlude_frac: float = 0.0,
    truncate_frac: float = 0.0,
    mesh_seed: int | None = None,
) -> dict:
    """Write images/masks/ply/jsons under `root`; returns summary paths.
    texture_seed is not None: sharp per-pixel procedural texture
    (see `procedural_texture`) instead of the blurry per-vertex colors.
    occlude_frac > 0: that fraction of TRAIN images get 1-2 distractor
    meshes composited in front of the target (visible ratio kept in
    [0.35, 0.95]); the mask records only visible pixels — train-time
    occluder augmentation mirroring the reference's fuse data
    (ref linemod_to_coco.py:260-301), which is what makes the occlusion
    eval measure decode robustness instead of distribution shift.
    truncate_frac > 0: that fraction of TRAIN images pose the target so the
    image border cuts it (the Truncation-LINEMOD family, ref
    TRUNCATION_LINEMOD.md — eval-only upstream, but synthetic data can
    train on it). mesh_seed (default = seed) decouples the object identity
    from the pose/aug rng so extra splits of the SAME object can be
    generated with fresh randomness."""
    rng = np.random.RandomState(seed)
    h, w = hw
    # scale intrinsics with the frame so geometry stays LINEMOD-like at any
    # test resolution
    K = LINEMOD_K.copy()
    K[0] *= w / 640.0
    K[1] *= h / 480.0
    verts, faces, colors = make_synthetic_mesh(
        seed if mesh_seed is None else mesh_seed
    )
    cls_dir = os.path.join(root, cls)
    os.makedirs(os.path.join(cls_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(cls_dir, "mask"), exist_ok=True)
    if depth:
        os.makedirs(os.path.join(cls_dir, "depth"), exist_ok=True)
    save_ply(os.path.join(cls_dir, f"{cls}.ply"), verts, faces,
             (colors * 255).astype(np.uint8))

    d2 = ((verts[:, None] - verts[None]) ** 2).sum(-1)
    diameter = float(np.sqrt(d2.max()))
    with open(os.path.join(cls_dir, "diameter.txt"), "w") as f:
        f.write(str(diameter))

    fps_3d = farthest_point_sampling_np(verts, n_keypoints, init_center=True)
    center_3d = (verts.max(0) + verts.min(0)) / 2.0
    corner_3d = np.array(
        [
            [x, y, z]
            for x in (verts[:, 0].min(), verts[:, 0].max())
            for y in (verts[:, 1].min(), verts[:, 1].max())
            for z in (verts[:, 2].min(), verts[:, 2].max())
        ]
    )

    occluders = (
        [make_synthetic_mesh(seed=200 + i, radius=0.05) for i in range(4)]
        if occlude_frac > 0
        else []
    )

    def render_split(split, n, id_base):
        images, annotations = [], []
        for i in range(n):
            img_id = id_base + i
            truncated = (split == "train" and truncate_frac > 0
                         and rng.rand() < truncate_frac)
            for _retry in range(10):
                R = random_rotation(rng)
                z = rng.uniform(0.45, 0.85)
                if truncated:
                    x, y = _border_xy(rng, K, hw, z)
                else:
                    # keep the object roughly in frustum
                    x = rng.uniform(-0.12, 0.12) * z
                    y = rng.uniform(-0.09, 0.09) * z
                rt = np.concatenate([R, np.array([[x], [y], [z]])], -1)
                if texture_seed is not None:
                    color, dep, mask = render_textured(
                        verts, faces, K, rt, hw, texture_seed)
                else:
                    color, dep, mask = render_mesh_np(
                        verts, faces, K, rt, hw, colors)
                if not truncated or int(mask.sum()) >= 64:
                    break

            vis = mask.astype(bool)
            frame_color = color
            full_area = max(int(mask.sum()), 1)
            if split == "train" and occluders and rng.rand() < occlude_frac:
                # train-time occluder augmentation (ref fuse pathway): draw a
                # few candidate composites and keep the one whose visible
                # ratio lands closest to the middle of [0.35, 0.95] — a
                # plain accept/reject leaves most images clean at small
                # scales where a foreground occluder covers nearly all or
                # nearly none of the target.
                zbuf0 = np.where(mask > 0, dep, np.inf)
                best = None
                best_score = np.inf
                for _ in range(6):
                    zb2, fc2, vis2 = _composite_occluders(
                        rng, occluders, K, hw, x, y, z,
                        zbuf0, frame_color, vis, n_occ=rng.randint(1, 3),
                    )
                    ratio = vis2.sum() / full_area
                    if ratio < 0.35:
                        continue  # occluded into oblivion
                    score = abs(ratio - 0.65)
                    if score < best_score:
                        best, best_score = (zb2, fc2, vis2), score
                    if 0.35 <= ratio <= 0.95:
                        break
                if best is not None:
                    zbuf0, frame_color, vis = best
                covered = np.isfinite(zbuf0) | vis
            else:
                covered = vis

            bg = _background(rng, h, w)
            frame = np.where(covered[..., None], frame_color, bg)
            # mild lighting variation + sensor noise
            frame = np.clip(frame * rng.uniform(0.85, 1.15) + rng.randn(h, w, 3) * 0.01, 0, 1)

            img_path = os.path.join(cls_dir, "rgb", f"{split}_{i:05d}.png")
            mask_path = os.path.join(cls_dir, "mask", f"{split}_{i:05d}.png")
            Image.fromarray((frame * 255).astype(np.uint8)).save(img_path)
            Image.fromarray(
                (vis.astype(np.uint8) * 255)
            ).save(mask_path)
            if depth:
                depth_path = os.path.join(cls_dir, "depth", f"{split}_{i:05d}.png")
                Image.fromarray(
                    (dep * 10000).astype(np.uint16), mode="I;16"
                ).save(depth_path)

            def proj(p):
                c = p @ R.T + rt[:, 3]
                q = c @ K.T
                return (q[:, :2] / q[:, 2:]).tolist()

            images.append(
                {"id": img_id, "file_name": img_path, "height": h, "width": w}
            )
            ann = {
                "id": img_id,
                "image_id": img_id,
                "category_id": 1,
                "mask_path": mask_path,
                "type": "real",
                "cls": cls,
                "pose": rt.tolist(),
                "K": K.tolist(),
                "fps_3d": fps_3d.tolist(),
                "fps_2d": proj(fps_3d),
                "center_3d": center_3d.tolist(),
                "center_2d": proj(center_3d[None])[0],
                "corner_3d": corner_3d.tolist(),
                "corner_2d": proj(corner_3d),
                "data_root": cls_dir,
            }
            if depth:
                ann["depth_path"] = depth_path
                ann["depth_scale"] = 10000.0  # PNG units per meter
            annotations.append(ann)
        out = {
            "images": images,
            "annotations": annotations,
            "categories": [{"supercategory": "none", "id": 1, "name": cls}],
        }
        path = os.path.join(root, f"{cls}_{split}.json")
        with open(path, "w") as f:
            json.dump(out, f)
        return path

    train_json = render_split("train", n_train, 0)
    test_json = render_split("test", n_test, 100000)
    return {
        "cls": cls,
        "model_path": os.path.join(cls_dir, f"{cls}.ply"),
        "diameter": diameter,
        "train_json": train_json,
        "test_json": test_json,
        "fps_3d": fps_3d,
        "center_3d": center_3d,
        "K": K,
    }


def generate_stress_split(
    root: str,
    cls: str = "synth",
    kind: str = "occlusion",
    n: int = 100,
    hw: tuple[int, int] = (480, 640),
    seed: int = 7,
    n_keypoints: int = 8,
    min_visible: float = 0.15,
    texture_seed: int | None = None,
    depth: bool = False,
) -> str:
    """Occlusion / truncation test split over the SAME object as
    `generate_synthetic_dataset` (same mesh seed → same fps_3d/diameter),
    so a model trained on the standard split can be stress-tested.

    kind="occlusion": 1-2 distractor meshes composited in front of the
      target with a scene z-buffer; the annotation keeps the full GT pose
      but the mask records only visible pixels — the Occ-LINEMOD protocol
      (ref lib/datasets/dataset_catalog.py:20-24, paper eval on
      LinemodOccTest).
    kind="truncation": the target is posed so the image border cuts it,
      like Truncation-LINEMOD (ref TRUNCATION_LINEMOD.md:1-10); keypoints
      may project outside the frame — the projective decode's case.
    kind="domain": held-out appearance — same object/texture, but
      backgrounds from an UNSEEN family (checker/stripe/solid), wider
      lighting gain with per-channel color cast, gamma jitter, and 3x
      sensor noise. External-validity check: a model that memorized the
      train-time background/lighting statistics degrades here, one that
      learned the object does not (VERDICT r3 weak 8).

    Returns the written json path (`<root>/<cls>_<kind>.json`).
    """
    assert kind in ("occlusion", "truncation", "domain"), kind
    rng = np.random.RandomState(seed)
    h, w = hw
    K = LINEMOD_K.copy()
    K[0] *= w / 640.0
    K[1] *= h / 480.0
    verts, faces, colors = make_synthetic_mesh(0)  # seed 0 = training object
    fps_3d = farthest_point_sampling_np(verts, n_keypoints, init_center=True)
    center_3d = (verts.max(0) + verts.min(0)) / 2.0
    corner_3d = np.array(
        [
            [x, y, z]
            for x in (verts[:, 0].min(), verts[:, 0].max())
            for y in (verts[:, 1].min(), verts[:, 1].max())
            for z in (verts[:, 2].min(), verts[:, 2].max())
        ]
    )
    occluders = [make_synthetic_mesh(seed=200 + i, radius=0.05) for i in range(4)]

    cls_dir = os.path.join(root, cls)
    os.makedirs(os.path.join(cls_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(cls_dir, "mask"), exist_ok=True)
    if depth:
        os.makedirs(os.path.join(cls_dir, "depth"), exist_ok=True)

    def _domain_background(rng_, h_, w_):
        """Background families the training generator never produces."""
        fam = rng_.randint(3)
        if fam == 0:  # checkerboard
            c = rng_.randint(8, 40)
            yy, xx = np.meshgrid(np.arange(h_), np.arange(w_), indexing="ij")
            tile = ((yy // c + xx // c) % 2).astype(np.float64)
            col_a, col_b = rng_.rand(3), rng_.rand(3)
            return tile[..., None] * col_a + (1 - tile[..., None]) * col_b
        if fam == 1:  # hard stripes
            ang = rng_.uniform(0, np.pi)
            yy, xx = np.meshgrid(np.arange(h_), np.arange(w_), indexing="ij")
            t = (xx * np.cos(ang) + yy * np.sin(ang)) / rng_.uniform(10, 50)
            tile = (np.floor(t) % 2).astype(np.float64)
            col_a, col_b = rng_.rand(3), rng_.rand(3)
            return tile[..., None] * col_a + (1 - tile[..., None]) * col_b
        return np.ones((h_, w_, 3)) * rng_.rand(3)  # solid color

    images, annotations = [], []
    made = 0
    attempt = 0
    id_base = {"occlusion": 200000, "truncation": 300000,
               "domain": 400000}[kind]
    while made < n and attempt < 20 * n:
        attempt += 1
        R = random_rotation(rng)
        z = rng.uniform(0.45, 0.85)
        if kind == "truncation":
            x, y = _border_xy(rng, K, hw, z)
        else:
            x = rng.uniform(-0.12, 0.12) * z
            y = rng.uniform(-0.09, 0.09) * z
        rt = np.concatenate([R, np.array([[x], [y], [z]])], -1)
        if texture_seed is not None:
            color, dep, mask = render_textured(
                verts, faces, K, rt, hw, texture_seed)
        else:
            color, dep, mask = render_mesh_np(verts, faces, K, rt, hw, colors)
        full_area = int(mask.sum())
        if full_area < 64:
            continue

        zbuf = np.where(mask > 0, dep, np.inf)
        frame_color = color
        vis = mask.astype(bool)
        if kind == "occlusion":
            zbuf, frame_color, vis = _composite_occluders(
                rng, occluders, K, hw, x, y, z, zbuf, frame_color, vis,
                n_occ=rng.randint(1, 3),
            )
            visible_ratio = vis.sum() / max(full_area, 1)
            if visible_ratio < min_visible or visible_ratio > 0.85:
                continue  # not occluded enough / nothing left to see

        bg = (_domain_background(rng, h, w) if kind == "domain"
              else _background(rng, h, w))
        covered = np.isfinite(zbuf) | vis
        frame = np.where(covered[..., None], frame_color, bg)
        if kind == "domain":
            # held-out photometrics: wide gain + per-channel color cast +
            # gamma jitter + 3x the training sensor noise
            gain = rng.uniform(0.6, 1.4)
            cast = rng.uniform(0.85, 1.15, 3)
            gamma = rng.uniform(0.7, 1.3)
            frame = np.clip(frame * gain * cast, 0, 1) ** gamma
            frame = np.clip(frame + rng.randn(h, w, 3) * 0.03, 0, 1)
        else:
            frame = np.clip(
                frame * rng.uniform(0.85, 1.15)
                + rng.randn(h, w, 3) * 0.01, 0, 1
            )

        img_id = id_base + made
        img_path = os.path.join(cls_dir, "rgb", f"{kind}_{made:05d}.png")
        mask_path = os.path.join(cls_dir, "mask", f"{kind}_{made:05d}.png")
        Image.fromarray((frame * 255).astype(np.uint8)).save(img_path)
        Image.fromarray((vis * 255).astype(np.uint8)).save(mask_path)
        depth_path = None
        if depth:
            # OBSERVED scene depth — target + occluders, like a real sensor
            # frame (the reference's occ-LINEMOD ICP consumes the captured
            # depth map, ref lib/evaluators/linemod/pvnet.py:102-116)
            scene_depth = np.where(np.isfinite(zbuf), zbuf, 0.0)
            depth_path = os.path.join(
                cls_dir, "depth", f"{kind}_{made:05d}.png")
            Image.fromarray(
                (scene_depth * 10000).astype(np.uint16), mode="I;16"
            ).save(depth_path)

        def proj(p):
            c = p @ R.T + rt[:, 3]
            q = c @ K.T
            return (q[:, :2] / q[:, 2:]).tolist()

        images.append(
            {"id": img_id, "file_name": img_path, "height": h, "width": w}
        )
        annotations.append(
            {
                "id": img_id,
                "image_id": img_id,
                "category_id": 1,
                "mask_path": mask_path,
                "type": "real",
                "cls": cls,
                "pose": rt.tolist(),
                "K": K.tolist(),
                "fps_3d": fps_3d.tolist(),
                "fps_2d": proj(fps_3d),
                "center_3d": center_3d.tolist(),
                "center_2d": proj(center_3d[None])[0],
                "corner_3d": corner_3d.tolist(),
                "corner_2d": proj(corner_3d),
                "data_root": cls_dir,
                **(
                    {"depth_path": depth_path, "depth_scale": 10000.0}
                    if depth_path else {}
                ),
            }
        )
        made += 1

    if made < n:
        raise RuntimeError(f"stress split '{kind}': only {made}/{n} scenes")
    out = {
        "images": images,
        "annotations": annotations,
        "categories": [{"supercategory": "none", "id": 1, "name": cls}],
    }
    path = os.path.join(root, f"{cls}_{kind}.json")
    with open(path, "w") as f:
        json.dump(out, f)
    return path


def generate_multiobject_dataset(
    root: str,
    num_classes: int = 3,
    n_scenes: int = 24,
    max_inst: int = 4,
    hw: tuple[int, int] = (256, 320),
    seed: int = 0,
    bg_dir: str | None = None,
):
    """Multi-instance scenes for the detector/cascade path.

    Stand-in for the reference's Blender-rendered + cut-paste T-LESS scene
    composition (ref lib/datasets/tless/ct.py:26-57, fuse.py:21-78): each
    scene holds several posed instances of `num_classes` object classes with
    full per-instance annotations (class, bbox, pose, K, keypoints) in the
    same COCO-style schema.
    """
    rng = np.random.RandomState(seed)
    h, w = hw
    K = LINEMOD_K.copy()
    K[0] *= w / 640.0
    K[1] *= h / 480.0

    classes = []
    os.makedirs(root, exist_ok=True)
    for c in range(num_classes):
        verts, faces, colors = make_synthetic_mesh(seed=100 + c, radius=0.05)
        fps_3d = farthest_point_sampling_np(verts, 8, init_center=True)
        center_3d = (verts.max(0) + verts.min(0)) / 2.0
        cls_dir = os.path.join(root, f"obj_{c + 1:02d}")
        os.makedirs(cls_dir, exist_ok=True)
        save_ply(os.path.join(cls_dir, f"obj_{c + 1:02d}.ply"), verts, faces,
                 (colors * 255).astype(np.uint8))
        d2 = ((verts[:, None] - verts[None]) ** 2).sum(-1)
        classes.append(
            dict(verts=verts, faces=faces, colors=colors, fps_3d=fps_3d,
                 center_3d=center_3d, diameter=float(np.sqrt(d2.max())),
                 dir=cls_dir)
        )

    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "mask"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    from clean_pvnet_tpu.data.tless import sample_background

    images, annotations = [], []
    ann_id = 0
    for si in range(n_scenes):
        bg = sample_background(rng, (h, w), bg_dir)
        zbuf = np.full((h, w), np.inf, np.float32)
        seg = np.zeros((h, w), np.int32)
        frame = bg.copy()
        n_inst = rng.randint(1, max_inst + 1)
        insts = []
        for ii in range(n_inst):
            c = rng.randint(num_classes)
            cl = classes[c]
            R = random_rotation(rng)
            z = rng.uniform(0.5, 0.9)
            x = rng.uniform(-0.12, 0.12) * z
            y = rng.uniform(-0.1, 0.1) * z
            rt = np.concatenate([R, np.array([[x], [y], [z]])], -1)
            color, dep, mask = render_mesh_np(cl["verts"], cl["faces"], K, rt,
                                              hw, cl["colors"])
            vis = mask.astype(bool) & (np.where(dep > 0, dep, np.inf) < zbuf)
            if vis.sum() < 40:
                continue
            zbuf[vis] = dep[vis]
            frame[vis] = color[vis]
            seg[vis] = ii + 1
            insts.append((ii + 1, c, rt, mask.sum()))

        img_path = os.path.join(root, "rgb", f"{si:05d}.png")
        mask_path = os.path.join(root, "mask", f"{si:05d}.png")
        depth_path = os.path.join(root, "depth", f"{si:05d}.png")
        frame = np.clip(frame + rng.randn(h, w, 3) * 0.01, 0, 1)
        Image.fromarray((frame * 255).astype(np.uint8)).save(img_path)
        Image.fromarray(seg.astype(np.uint8)).save(mask_path)
        # scene z-buffer → depth map (the reference's T-LESS test images ship
        # a depth_path per image, consumed by ICP/VSD eval,
        # ref lib/evaluators/tless_test/pvnet.py:213,69)
        scene_depth = np.where(np.isfinite(zbuf), zbuf, 0.0)
        Image.fromarray(
            (scene_depth * 10000).astype(np.uint16), mode="I;16"
        ).save(depth_path)
        images.append({"id": si, "file_name": img_path, "height": h, "width": w,
                       "depth_path": depth_path, "depth_scale": 10000.0})

        for inst_id, c, rt, full_area in insts:
            vis_mask = seg == inst_id
            if vis_mask.sum() < 0.25 * full_area:  # occlusion rejection
                continue
            ys, xs = np.nonzero(vis_mask)
            cl = classes[c]

            def proj(p):
                cam = p @ rt[:, :3].T + rt[:, 3]
                q = cam @ K.T
                return (q[:, :2] / q[:, 2:]).tolist()

            annotations.append(
                {
                    "id": ann_id,
                    "image_id": si,
                    "category_id": c + 1,
                    "inst_id": int(inst_id),
                    "bbox": [float(xs.min()), float(ys.min()),
                             float(xs.max() - xs.min()),
                             float(ys.max() - ys.min())],
                    "mask_path": mask_path,
                    "type": "fuse",
                    "cls": f"obj_{c + 1:02d}",
                    "pose": rt.tolist(),
                    "K": K.tolist(),
                    "fps_3d": cl["fps_3d"].tolist(),
                    "fps_2d": proj(cl["fps_3d"]),
                    "center_3d": cl["center_3d"].tolist(),
                    "center_2d": proj(cl["center_3d"][None])[0],
                }
            )
            ann_id += 1

    out = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"supercategory": "none", "id": c + 1, "name": f"obj_{c + 1:02d}"}
            for c in range(num_classes)
        ],
    }
    path = os.path.join(root, "scenes.json")
    with open(path, "w") as f:
        json.dump(out, f)
    return {
        "scenes_json": path,
        "num_classes": num_classes,
        "K": K,
        "classes": [
            {
                "model_path": os.path.join(cl["dir"], os.path.basename(cl["dir"]) + ".ply"),
                "diameter": cl["diameter"],
                "fps_3d": cl["fps_3d"],
                "center_3d": cl["center_3d"],
            }
            for cl in classes
        ],
    }
