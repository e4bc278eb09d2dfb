"""On-device Perspective-n-Point solvers.

Replaces the reference's host-side OpenCV `solvePnP(SOLVEPNP_ITERATIVE)`
(ref lib/utils/pvnet/pvnet_pose_utils.py:5-38) and the Ceres Levenberg-
Marquardt uncertainty PnP (ref lib/csrc/uncertainty_pnp/src/
uncertainty_pnp.cpp:7-92, un_pnp_utils.py:6-57) with a fully jittable,
vmap-able pipeline:

  1. DLT initialization on normalized camera rays (SVD of the 2N×12 system).
  2. Levenberg-Marquardt refinement over SE(3) with a left-multiplicative
     rotation update; residuals are (optionally 2×2-weighted) pixel
     reprojection errors; each step solves the 6×6 normal equations — the
     problem is 6-dof so the reference's DENSE_SCHUR is just this solve.

Everything is fixed-shape: batch over instances with vmap, no host round
trips (the reference crosses device→host→C++ per image).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from clean_pvnet_tpu.geometry.transforms import hat, angle_axis_to_matrix


def dlt_init(
    pts3d: jax.Array, rays: jax.Array, w: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """DLT initialization; pts3d [N,3], rays [N,2] -> (R [3,3], t [3]).

    `w` [N]: optional per-correspondence row weights — zero drops a point
    from the least-squares system (used when a voted keypoint is invalid,
    e.g. at infinity in the projective/truncation decode)."""
    n = pts3d.shape[0]
    mean = jnp.mean(pts3d, 0)
    scale = jnp.sqrt(jnp.mean(jnp.sum((pts3d - mean) ** 2, -1))) + 1e-12
    Xn = (pts3d - mean) / scale

    ones = jnp.ones((n, 1), Xn.dtype)
    zeros = jnp.zeros((n, 4), Xn.dtype)
    Xh = jnp.concatenate([Xn, ones], -1)
    u = rays[:, 0:1]
    v = rays[:, 1:2]
    A = jnp.concatenate(
        [
            jnp.concatenate([Xh, zeros, -u * Xh], -1),
            jnp.concatenate([zeros, Xh, -v * Xh], -1),
        ],
        0,
    )
    if w is not None:
        # all-zero guard: fall back to unweighted rather than a null system
        w = jnp.where(jnp.all(w <= 0), jnp.ones_like(w), w)
        w = w / jnp.maximum(jnp.max(w), 1e-12)
        # rank floor: with fewer than 6 effective correspondences the 2n×12
        # system drops below rank 11 and eigh returns an arbitrary
        # null-space mix. Keep every row faintly alive — valid points
        # dominate 20×, and the LM refinement (well-posed from 4 points)
        # uses the true zero weights.
        w = jnp.maximum(w, 0.05)
        A = A * jnp.tile(w, 2)[:, None]
    ata = A.T @ A
    _, vecs = jnp.linalg.eigh(ata)
    P = vecs[:, 0].reshape(3, 4)

    # depths of the (centered) points under P; flip so the majority is positive
    depths = Xh @ P[2]
    sign = jnp.where(jnp.sum(jnp.sign(depths)) < 0, -1.0, 1.0)
    P = P * sign

    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    R = U @ jnp.diag(jnp.stack([1.0, 1.0, det])) @ Vt
    lam = 3.0 / (jnp.sum(S) + 1e-12)
    t_cond = lam * P[:, 3]
    # P acted on conditioned coords: x_cam = R ((X - mean)/scale) + t_cond
    # → in world units: x_cam/unit = R X + (scale·t_cond − R·mean), up to the
    # global scale which is irrelevant for bearing rays; recover metric t by
    # noting the conditioned problem is metric in units of `scale`.
    t = scale * t_cond - R @ mean
    return R, t


def _project_with_jac(pts3d, R, t, K):
    """Returns projections [N,2] and Jacobian wrt (δw, δt) [N,2,6]."""
    q = pts3d @ R.T  # [N, 3]
    p = q + t
    z = p[:, 2:3]
    z = jnp.where(jnp.abs(z) < 1e-9, jnp.where(z < 0, -1e-9, 1e-9), z)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = fx * p[:, 0:1] / z + cx
    v = fy * p[:, 1:2] / z + cy
    proj = jnp.concatenate([u, v], -1)

    inv_z = 1.0 / z[:, 0]
    zeros = jnp.zeros_like(inv_z)
    # dproj/dp [N, 2, 3]
    A = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * p[:, 0] * inv_z**2], -1),
            jnp.stack([zeros, fy * inv_z, -fy * p[:, 1] * inv_z**2], -1),
        ],
        1,
    )
    # p = exp(δw)ˆ q + t + δt  →  dp/dδw = -hat(q),  dp/dδt = I
    J_w = A @ (-hat(q))  # [N, 2, 3]
    J_t = A  # [N, 2, 3]
    return proj, jnp.concatenate([J_w, J_t], -1)  # [N, 2, 6]


def _lm_refine(pts3d, pts2d, K, W, R0, t0, iters, lam0, lam_up, lam_down):
    """Weighted LM over SE(3). W [N, 2, 2] weight matrices (I for unweighted)."""

    def cost_fn(R, t):
        proj, _ = _project_with_jac(pts3d, R, t, K)
        r = jnp.einsum("nij,nj->ni", W, proj - pts2d)
        return jnp.sum(r * r), r

    def body(_, state):
        R, t, lam, cost = state
        proj, J = _project_with_jac(pts3d, R, t, K)
        r = jnp.einsum("nij,nj->ni", W, proj - pts2d)  # [N, 2]
        Jw = jnp.einsum("nij,njk->nik", W, J)  # [N, 2, 6]
        Jf = Jw.reshape(-1, 6)
        rf = r.reshape(-1)
        H = Jf.T @ Jf
        g = Jf.T @ rf
        H_lm = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-12 * jnp.eye(6)
        delta = -jnp.linalg.solve(H_lm, g)
        R_new = angle_axis_to_matrix(delta[:3]) @ R
        t_new = t + delta[3:]
        new_cost, _ = cost_fn(R_new, t_new)
        accept = new_cost < cost
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * lam_down, lam * lam_up)
        lam = jnp.clip(lam, 1e-10, 1e8)
        return R, t, lam, cost

    cost0, _ = cost_fn(R0, t0)
    R, t, _, _ = jax.lax.fori_loop(0, iters, body, (R0, t0, lam0, cost0))
    return R, t


@partial(jax.jit, static_argnames=("iters",))
def solve_pnp(
    pts3d: jax.Array,
    pts2d: jax.Array,
    K: jax.Array,
    weights: jax.Array | None = None,
    iters: int = 30,
) -> jax.Array:
    """PnP: pts3d [N,3], pts2d [N,2] (pixels), K [3,3] -> pose [3,4].

    `weights`: optional [N,2,2] residual-weight matrices (e.g. inverse-sqrt
    voting covariances). Batch with jax.vmap over leading dims.
    """
    pts3d = pts3d.astype(jnp.float32)
    pts2d = pts2d.astype(jnp.float32)
    K = K.astype(jnp.float32)
    n = pts3d.shape[0]
    Kinv = jnp.linalg.inv(K)
    rays = (jnp.concatenate([pts2d, jnp.ones((n, 1))], -1) @ Kinv.T)[:, :2]
    w_row = None
    if weights is not None:
        # scalar row weight per correspondence for the (linear) DLT init;
        # the LM refinement below uses the full 2×2 weights
        w_row = 0.5 * (weights[:, 0, 0] + weights[:, 1, 1])
    R0, t0 = dlt_init(pts3d, rays, w_row)
    W = jnp.broadcast_to(jnp.eye(2), (n, 2, 2)) if weights is None else weights
    R, t = _lm_refine(pts3d, pts2d, K, W, R0, t0, iters, 1e-3, 10.0, 0.1)
    return jnp.concatenate([R, t[:, None]], -1)


def inv_sqrtm_2x2(cov: jax.Array) -> jax.Array:
    """Closed-form inverse square root of SPD 2×2 matrices [..., 2, 2].

    Counterpart of the reference's scipy.linalg.sqrtm + np.linalg.inv per
    keypoint (ref lib/evaluators/linemod/pvnet.py:120-126).
    For SPD M: sqrtm(M) = (M + √det·I)/τ, τ = √(tr M + 2√det).
    """
    a = cov[..., 0, 0]
    b = cov[..., 0, 1]
    c = cov[..., 1, 1]
    s = jnp.sqrt(jnp.clip(a * c - b * b, 1e-20, None))
    tau = jnp.sqrt(jnp.clip(a + c + 2.0 * s, 1e-20, None))
    # sqrtm = [[a+s, b], [b, c+s]] / tau; invert it in closed form
    det_sq = (a + s) * (c + s) - b * b
    inv = jnp.stack(
        [
            jnp.stack([c + s, -b], -1),
            jnp.stack([-b, a + s], -1),
        ],
        -2,
    ) * (tau / jnp.clip(det_sq, 1e-20, None))[..., None, None]
    return inv


@partial(jax.jit, static_argnames=("iters",))
def solve_pnp_uncertainty(
    pts3d: jax.Array,
    pts2d: jax.Array,
    covars: jax.Array,
    K: jax.Array,
    iters: int = 30,
) -> jax.Array:
    """Uncertainty-weighted PnP from voting covariances.

    Mirrors reference Evaluator.uncertainty_pnp (lib/evaluators/linemod/
    pvnet.py:118-132): weight = inv(sqrtm(cov)), zeroed when cov is
    degenerate (cov_xx < 1e-6 or NaN), then covariance-weighted LM.
    """
    bad = (covars[..., 0, 0] < 1e-6) | jnp.any(
        jnp.isnan(covars), axis=(-1, -2)
    )
    safe = jnp.where(bad[..., None, None], jnp.eye(2), covars)
    W = inv_sqrtm_2x2(safe)
    W = jnp.where(bad[..., None, None], 0.0, W)
    # guard: if everything is bad, fall back to identity weights
    all_bad = jnp.all(bad)
    W = jnp.where(all_bad, jnp.broadcast_to(jnp.eye(2), W.shape), W)
    return solve_pnp(pts3d, pts2d, K, weights=W, iters=iters)


@partial(jax.jit, static_argnames=("iters",))
def solve_pnp_uncertainty_scalar(
    pts3d: jax.Array,
    pts2d: jax.Array,
    covars: jax.Array,
    K: jax.Array,
    iters: int = 30,
) -> jax.Array:
    """Scalar-weight variant of uncertainty PnP.

    Mirrors reference `uncertainty_pnp_v2` (lib/csrc/uncertainty_pnp/
    un_pnp_utils.py:60-121): each keypoint's 2×2 covariance collapses to one
    isotropic weight 1/λ_max (largest eigenvalue), zeroed when degenerate
    (cov_xx < 1e-5). The eigenvalue of an SPD 2×2 is closed-form, so the
    whole thing stays jittable/vmap-able (the reference loops per keypoint
    on the host and seeds OpenCV P3P; here the shared DLT init in solve_pnp
    plays that role).
    """
    a = covars[..., 0, 0]
    b = covars[..., 0, 1]
    c = covars[..., 1, 1]
    lam_max = 0.5 * (a + c) + jnp.sqrt(
        jnp.clip(0.25 * (a - c) ** 2 + b * b, 0.0, None)
    )
    bad = (a < 1e-5) | jnp.isnan(lam_max)
    w = jnp.where(bad, 0.0, 1.0 / jnp.clip(lam_max, 1e-12, None))
    # all-degenerate guard: fall back to unweighted
    w = jnp.where(jnp.all(bad), jnp.ones_like(w), w)
    W = w[..., None, None] * jnp.eye(2)
    return solve_pnp(pts3d, pts2d, K, weights=W, iters=iters)
