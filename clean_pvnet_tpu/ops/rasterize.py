"""Triangle-mesh rasterization (color + depth) without OpenGL.

Replaces the reference's OpenGL/glumpy/EGL render stack for the purposes of
synthetic data generation, VSD depth rendering, and ICP model depth
(ref lib/utils/renderer/opengl_utils.py:405-531 DepthRender,
ref lib/utils/linemod/opengl_renderer.py:19-171). Two implementations:

  * `render_mesh_np` — host numpy scanline-free rasterizer (per-face bbox +
    barycentric, z-buffer). Used by the offline synthetic-data tools.
  * `render_depth_jax` — fixed-shape jittable rasterizer: barycentric test of
    every (face, pixel-tile) pair with a z-min reduction, vmap-able over
    poses. Faces are padded to a static count; tiles keep the working set in
    registers/VMEM. Used by the on-device VSD metric path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _project_np(pts, K, rt):
    cam = pts @ rt[:, :3].T + rt[:, 3]
    pix = cam @ K.T
    return pix[:, :2] / np.clip(pix[:, 2:], 1e-9, None), cam[:, 2]


def render_mesh_np(
    verts: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    rt: np.ndarray,
    hw: tuple[int, int],
    vert_colors: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rasterize a mesh. Returns (color [H,W,3] float in [0,1], depth [H,W]
    float (0 = background), mask [H,W] uint8)."""
    h, w = hw
    pix, z = _project_np(verts, K, rt)
    depth = np.zeros((h, w), np.float32)
    color = np.zeros((h, w, 3), np.float32)
    zbuf = np.full((h, w), np.inf, np.float32)
    if vert_colors is None:
        vert_colors = np.ones((len(verts), 3), np.float32) * 0.7

    for f in faces:
        p = pix[f]  # [3, 2]
        fz = z[f]
        if (fz <= 1e-6).any():
            continue
        x0, y0 = np.floor(p.min(0)).astype(int)
        x1, y1 = np.ceil(p.max(0)).astype(int)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1 + 1, w), min(y1 + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        # barycentric coordinates
        v0 = p[1] - p[0]
        v1 = p[2] - p[0]
        den = v0[0] * v1[1] - v1[0] * v0[1]
        if abs(den) < 1e-12:
            continue
        qx = xs + 0.5 - p[0, 0]
        qy = ys + 0.5 - p[0, 1]
        b1 = (qx * v1[1] - v1[0] * qy) / den
        b2 = (v0[0] * qy - qx * v0[1]) / den
        b0 = 1.0 - b1 - b2
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
        if not inside.any():
            continue
        # perspective-correct interpolation of depth and color
        iz = b0 / fz[0] + b1 / fz[1] + b2 / fz[2]
        zi = 1.0 / np.clip(iz, 1e-12, None)
        closer = inside & (zi < zbuf[y0:y1, x0:x1])
        cy, cx = np.nonzero(closer)
        zbuf[y0 + cy, x0 + cx] = zi[cy, cx]
        col = (
            b0[..., None] * vert_colors[f[0]] / fz[0]
            + b1[..., None] * vert_colors[f[1]] / fz[1]
            + b2[..., None] * vert_colors[f[2]] / fz[2]
        ) * zi[..., None]
        color[y0 + cy, x0 + cx] = col[cy, cx]

    mask = (zbuf < np.inf).astype(np.uint8)
    depth = np.where(mask, zbuf, 0.0).astype(np.float32)
    return color, depth, mask


@partial(jax.jit, static_argnames=("hw", "face_chunk"))
def render_depth_jax(
    verts: jax.Array,
    faces: jax.Array,
    K: jax.Array,
    rt: jax.Array,
    hw: tuple[int, int],
    face_chunk: int = 256,
) -> jax.Array:
    """Depth-only rasterization on device. verts [V,3], faces [F,3] int,
    -> depth [H, W] float32 (0 = background).

    Scans over face chunks; for each chunk computes barycentric coverage of
    the full image and takes a z-min. Peak memory is [face_chunk, H, W].
    Pad faces with degenerate (0,0,0) entries to a static count.
    """
    h, w = hw
    cam = verts @ rt[:, :3].T + rt[:, 3]
    pixh = cam @ K.T
    z = pixh[:, 2]
    pix = pixh[:, :2] / jnp.clip(z[:, None], 1e-9, None)

    f = faces.shape[0]
    pad = (-f) % face_chunk
    faces = jnp.pad(faces, ((0, pad), (0, 0)))  # padded faces are (0,0,0): degenerate
    fchunks = faces.reshape(-1, face_chunk, 3)

    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5

    def body(zbuf, fc):
        p = pix[fc]  # [C, 3, 2]
        fz = z[fc]  # [C, 3]
        v0 = p[:, 1] - p[:, 0]
        v1 = p[:, 2] - p[:, 0]
        den = v0[:, 0] * v1[:, 1] - v1[:, 0] * v0[:, 1]  # [C]
        ok = (jnp.abs(den) > 1e-12) & jnp.all(fz > 1e-6, -1)
        den = jnp.where(ok, den, 1.0)
        qx = xs[None] - p[:, 0, 0, None, None]  # [C, H, W]
        qy = ys[None] - p[:, 0, 1, None, None]
        b1 = (qx * v1[:, 1, None, None] - v1[:, 0, None, None] * qy) / den[:, None, None]
        b2 = (v0[:, 0, None, None] * qy - qx * v0[:, 1, None, None]) / den[:, None, None]
        b0 = 1.0 - b1 - b2
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & ok[:, None, None]
        iz = (
            b0 / fz[:, 0, None, None]
            + b1 / fz[:, 1, None, None]
            + b2 / fz[:, 2, None, None]
        )
        zi = 1.0 / jnp.clip(iz, 1e-12, None)
        zi = jnp.where(inside, zi, jnp.inf)
        return jnp.minimum(zbuf, jnp.min(zi, 0)), None

    zbuf0 = jnp.full((h, w), jnp.inf, jnp.float32)
    zbuf, _ = jax.lax.scan(body, zbuf0, fchunks)
    return jnp.where(jnp.isfinite(zbuf), zbuf, 0.0)
