"""Depth-based ICP pose refinement, fully on-device.

Behavioral counterpart of reference lib/utils/icp/icp_utils.py:7-176:
render a synthetic depth map at the estimated pose, back-project both the
synthetic and observed depths to point clouds, gate observed points by
distance to the synthetic centroid, subsample to a fixed budget, and run
SVD best-fit ICP with `depth_only` / `no_depth` modes and the 20° rotation
clamp (ref :129-176).

Fixed-shape re-design: clouds are padded to a static N with validity
weights; the NN correspondence is the same |a-b|² = |a|²-2a·b+|b|² MXU
reduction as ops/nn_query (replacing sklearn NearestNeighbors); the ICP
loop is a `lax.fori_loop` with a static iteration cap (the reference's
convergence break becomes a no-op update once converged).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from clean_pvnet_tpu.ops.rasterize import render_depth_jax


def depth_to_cloud_fixed(depth: jax.Array, K: jax.Array, n: int, key):
    """Back-project valid depth pixels to a fixed-size [n, 3] cloud + weights.

    (ref icp_utils.py:7-13 rgbd_to_point_cloud, with the dynamic nonzero
    replaced by randomized top-k selection.)"""
    h, w = depth.shape
    valid = depth > 0
    pri = jax.random.uniform(key, (h, w), minval=1e-6, maxval=1.0)
    pri = jnp.where(valid, pri, -1.0)
    vals, idx = jax.lax.top_k(pri.reshape(-1), n)
    ok = vals > 0
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    zs = depth.reshape(-1)[idx]
    pts = jnp.stack(
        [(xs - K[0, 2]) * zs / K[0, 0], (ys - K[1, 2]) * zs / K[1, 1], zs], -1
    )
    return pts, ok.astype(jnp.float32)


def _nn_correspond(src, dst, dst_w):
    """For each src point: index + distance of nearest valid dst point."""
    d2 = (
        jnp.sum(src * src, -1, keepdims=True)
        - 2.0 * src @ dst.T
        + jnp.sum(dst * dst, -1)[None]
    )
    d2 = jnp.where(dst_w[None, :] > 0, d2, jnp.inf)
    idx = jnp.argmin(d2, -1)
    return idx, jnp.sqrt(jnp.clip(jnp.min(d2, -1), 0, None))


def _best_fit(A, B, w, depth_only: bool, no_depth: bool):
    """Weighted SVD best-fit transform A→B (ref icp_utils.py:35-81)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    ca = jnp.sum(A * w[:, None], 0) / wsum
    cb = jnp.sum(B * w[:, None], 0) / wsum
    if depth_only:
        return jnp.eye(3), cb - ca
    AA = (A - ca) * w[:, None]
    BB = B - cb
    H = AA.T @ BB
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.stack([1.0, 1.0, det]))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    if no_depth:
        t = t.at[2].set(0.0)
    return R, t


@partial(jax.jit, static_argnames=("iters", "depth_only", "no_depth"))
def icp_fixed(
    src: jax.Array, src_w: jax.Array,
    dst: jax.Array, dst_w: jax.Array,
    iters: int = 30,
    depth_only: bool = False,
    no_depth: bool = False,
):
    """Iterative closest point with static iteration count.

    Returns (R [3,3], t [3]) mapping src→dst (accumulated transform, like
    the reference's final best_fit_transform of A onto the moved source,
    ref icp_utils.py:84-126)."""

    def body(_, carry):
        R, t = carry
        moved = src @ R.T + t
        idx, _ = _nn_correspond(moved, dst, dst_w)
        matched = dst[idx]
        dR, dt = _best_fit(moved, matched, src_w, depth_only, no_depth)
        return dR @ R, dR @ t + dt

    R, t = jax.lax.fori_loop(0, iters, body, (jnp.eye(3), jnp.zeros(3)))
    return R, t


class ICPRefiner:
    """Render + gate + ICP refine (ref icp_utils.py:129-176 ICPRefiner).

    Operates in the caller's units (the reference uses mm for LINEMOD).
    """

    def __init__(self, verts, faces, hw, n_points: int = 2048,
                 max_mean_dist_factor: float = 2.0):
        self.verts = jnp.asarray(verts, jnp.float32)
        self.faces = jnp.asarray(faces, jnp.int32)
        self.hw = tuple(hw)
        self.n = n_points
        self.factor = max_mean_dist_factor
        self._refine = jax.jit(
            self._build(), static_argnames=("depth_only", "no_depth")
        )

    def _build(self):
        def refine(pose, depth_obs, K, key, factor, depth_only=False,
                   no_depth=False):
            d_syn = render_depth_jax(self.verts, self.faces, K, pose, self.hw)
            k1, k2 = jax.random.split(key)
            syn_pts, syn_w = depth_to_cloud_fixed(d_syn, K, self.n, k1)
            obs_pts, obs_w = depth_to_cloud_fixed(depth_obs, K, self.n, k2)

            # gate observed points by distance to synthetic centroid
            # (ref icp_utils.py:139-147)
            wsum = jnp.maximum(jnp.sum(syn_w), 1e-6)
            centroid = jnp.sum(syn_pts * syn_w[:, None], 0) / wsum
            syn_d = jnp.linalg.norm(syn_pts - centroid, axis=-1) * syn_w
            max_d = jnp.max(syn_d)
            obs_d = jnp.linalg.norm(obs_pts - centroid, axis=-1)
            obs_w = obs_w * (obs_d < factor * max_d)

            enough = jnp.sum(obs_w) >= jnp.sum(syn_w) / 20.0
            R_icp, t_icp = icp_fixed(
                syn_pts, syn_w, obs_pts, obs_w,
                depth_only=depth_only, no_depth=no_depth,
            )
            if no_depth:
                # clamp rotation change to 20° (ref icp_utils.py:160-164)
                trace = jnp.clip(jnp.trace(R_icp), -1.0, 3.0)
                ang = jnp.arccos((trace - 1.0) / 2.0)
                keep = ang <= jnp.deg2rad(20.0)
                R_icp = jnp.where(keep, R_icp, jnp.eye(3))
                t_icp = jnp.where(keep, t_icp, jnp.zeros(3))

            R_new = R_icp @ pose[:, :3]
            t_new = R_icp @ pose[:, 3] + t_icp
            refined = jnp.concatenate([R_new, t_new[:, None]], -1)
            return jnp.where(enough, refined, pose)

        return refine

    def refine(self, pose, depth_obs, K, key, depth_only=False,
               no_depth=False, factor: float | None = None):
        return self._refine(
            jnp.asarray(pose, jnp.float32),
            jnp.asarray(depth_obs, jnp.float32),
            jnp.asarray(K, jnp.float32),
            key,
            jnp.float32(self.factor if factor is None else factor),
            depth_only=depth_only,
            no_depth=no_depth,
        )

    def refine_two_stage(self, pose, depth_obs, K, key):
        """depth-only pass with a loose distance gate (factor 5, ref
        pvnet.py:111), then no-depth pass with the default gate (:112)."""
        k1, k2 = jax.random.split(key)
        p1 = self.refine(pose, depth_obs, K, k1, depth_only=True, factor=5.0)
        return self.refine(p1, depth_obs, K, k2, no_depth=True)

    def residual(self, pose, depth_obs, K, key):
        """Point-to-model residual: mean distance from the observed
        (mask-gated) depth cloud to the nearest model point under `pose`.
        The accept-on-improvement gate compares this between the initial
        and ICP-refined poses — both scored against the SAME observed
        cloud, so the comparison is occlusion-fair."""
        if not hasattr(self, "_residual"):
            sub = self.verts
            if sub.shape[0] > 4096:
                step = sub.shape[0] // 4096 + 1
                sub = sub[::step]
            self._verts_sub = sub

            @jax.jit
            def resid(pose, depth_obs, K, key):
                obs_pts, obs_w = depth_to_cloud_fixed(
                    depth_obs, K, self.n, key)
                model = self._verts_sub @ pose[:, :3].T + pose[:, 3]
                d2 = (
                    jnp.sum(obs_pts * obs_pts, -1, keepdims=True)
                    - 2.0 * obs_pts @ model.T
                    + jnp.sum(model * model, -1)[None]
                )
                dmin = jnp.sqrt(jnp.clip(jnp.min(d2, -1), 0.0, None))
                wsum = jnp.maximum(jnp.sum(obs_w), 1e-6)
                return jnp.sum(dmin * obs_w) / wsum

            self._residual = resid
        return self._residual(
            jnp.asarray(pose, jnp.float32),
            jnp.asarray(depth_obs, jnp.float32),
            jnp.asarray(K, jnp.float32), key,
        )


def make_linemod_refiner(verts, faces, hw, n_points: int = 2048,
                         accept_improve: bool = False,
                         improve_margin: float = 1.0):
    """Adapter with the LinemodEvaluator's refiner contract
    (pose_pred, ann, mask_pred, K) → refined pose, implementing the
    reference's eval-time ICP (ref lib/evaluators/linemod/pvnet.py:102-116):
    read the annotation's depth map, keep depth only where the predicted
    mask is foreground, skip when the predicted pose is behind the camera,
    two-stage refine. Depth PNGs are in `ann['depth_scale']` units per
    meter (1000 for real LINEMOD depth, ref read_depth mm convention)."""
    from PIL import Image

    if faces is None:
        raise ValueError(
            "ICP refinement needs a triangulated mesh (the class .ply has "
            "no faces); disable test.icp or provide a mesh with faces"
        )
    refiner = ICPRefiner(verts, faces, hw, n_points=n_points)

    def refine(pose_pred, ann, mask_pred, K):
        pose_pred = np.asarray(pose_pred, np.float32)
        # skip behind-camera AND non-finite poses (NaN compares False to 0,
        # so the z-guard alone would fall through)
        if not np.all(np.isfinite(pose_pred)) or pose_pred[2, 3] <= 0:
            return pose_pred
        depth = np.asarray(Image.open(ann["depth_path"]), np.float32)
        depth = depth / float(ann.get("depth_scale", 1000.0))
        mask = np.asarray(mask_pred)
        if mask.shape != depth.shape:
            mask = np.asarray(
                Image.fromarray(mask.astype(np.uint8)).resize(
                    (depth.shape[1], depth.shape[0]), Image.NEAREST
                )
            )
        depth = depth * (mask == 1)
        counter[0] += 1
        key = jax.random.PRNGKey(counter[0])
        refined = refiner.refine_two_stage(
            pose_pred, depth, np.asarray(K, np.float32), key
        )
        if accept_improve:
            # accept-on-improvement gate (VERDICT r4 item 3): keep the
            # refined pose only when the point-to-model residual against
            # the observed cloud drops. Unlike the inlier-ratio gate, this
            # reads the DEPTH evidence, which stays honest when a
            # self-consistently wrong vertex field keeps voting confidence
            # high under appearance shift.
            # `improve_margin < 1` demands a PROPORTIONAL residual drop:
            # a converged pose refined onto a depth-consistent-but-wrong
            # nearby fit only shaves the residual marginally, while a
            # genuinely bad pose pulled onto the object drops it severalfold
            # — the margin separates the two regimes.
            Kf = np.asarray(K, np.float32)
            kr = jax.random.PRNGKey(1_000_000 + counter[0])
            r0 = float(refiner.residual(pose_pred, depth, Kf, kr))
            r1 = float(refiner.residual(np.asarray(refined), depth, Kf, kr))
            if not (r1 < improve_margin * r0):
                refine.rejected += 1
                return pose_pred
            refine.accepted += 1
        return np.asarray(refined)

    counter = [0]
    refine.accepted = 0
    refine.rejected = 0
    return refine
