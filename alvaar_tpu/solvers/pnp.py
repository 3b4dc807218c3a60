"""Motion-only PnP: masked Levenberg-Marquardt pose refinement.

TPU-native replacement for the reference's ``MultiViewGeometry::ceresPnP``
(reference src/slam/src/multi_view_geometry.cpp:129-223): motion-only
bundle adjustment of one SE(3) pose against fixed 3D points — Huber loss
(√5.9915), LM with ≤5 iterations (DENSE_QR there; the normal equations are
6x6, solved in closed form here), followed by chi²/negative-depth outlier
pruning and an L2 re-solve (multi_view_geometry.cpp:192-218).

Design: residuals are undistorted-pixel reprojection errors; the Jacobian
is assembled analytically per point (2x6: projection chain rule times the
left-retraction generator [I | −[X_c]×], matching the reference's
``ReprojectionErrorSE3`` factor, ceres_parametrization.cpp:96-155).  The
LM loop is a fixed-length ``lax.scan`` with branch-free accept/reject
(no dynamic control flow), and invalid points carry zero weight — the
whole solve is one fused XLA program, and ``vmap`` batches it across
streams.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvaar_tpu.geom.camera import Camera
from alvaar_tpu.geom.lie import SE3, so3_hat

CHI2_THRESH_2DOF = 5.9915  # 95% chi-square, 2 dof (reference mvg.cpp:160)


class PnPResult(NamedTuple):
    pose: SE3              # refined T_c_w
    inliers: jax.Array     # [N] bool (chi2 + positive depth)
    num_inliers: jax.Array
    cost: jax.Array


def _residuals_jacobian(pose_cw: SE3, cam: Camera, points_w, px_obs):
    """Per-point residual [N, 2], Jacobian [N, 2, 6], depth [N]."""
    Xc = pose_cw.apply(points_w)
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    r = jnp.stack([u, v], axis=-1) - px_obs

    # d(u,v)/dXc
    zero = jnp.zeros_like(z)
    J_proj = jnp.stack([
        jnp.stack([cam.fx * inv_z, zero, -cam.fx * Xc[..., 0] * inv_z * inv_z], -1),
        jnp.stack([zero, cam.fy * inv_z, -cam.fy * Xc[..., 1] * inv_z * inv_z], -1),
    ], axis=-2)  # [N, 2, 3]

    # dXc/dxi for left update Exp(xi)·T: [I | -hat(Xc)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3))
    J_gen = jnp.concatenate([eye, -so3_hat(Xc)], axis=-1)  # [N, 3, 6]
    J = J_proj @ J_gen  # [N, 2, 6]
    return r, J, z


def _robust_weights(r2, huber_delta):
    """IRLS Huber weights on squared pixel error; huber_delta<=0 → L2."""
    if huber_delta <= 0:
        return jnp.ones_like(r2)
    rn = jnp.sqrt(r2.clip(1e-12))
    return jnp.where(rn <= huber_delta, 1.0, huber_delta / rn)


def _chol_solve6(H, g):
    """x = H⁻¹ g for SPD [..., 6, 6] H via fully unrolled Cholesky.

    ``jnp.linalg.solve`` lowers to pivoted LU (while_loops + dynamic
    slices) — ~50-100 µs per call on TPU for a 6x6, which dominated the
    PnP iteration.  The damped normal matrix is SPD by construction, so
    an unrolled Cholesky (static scalar indexing, ~100 fused VPU ops,
    vmap-safe) solves it in nanoseconds."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _lm_solve(pose0: SE3, cam: Camera, points_w, px_obs, weights_fixed, *,
              iters: int, huber_delta: float):
    """Fixed-length branch-free LM; weights_fixed [N] masks invalid points.

    Deferred accept/reject: each iteration linearizes ONCE (at the trial
    point) and that same evaluation provides the trial cost — the carried
    best-point normal equations (6x6 + 6, cheap) are reused when the trial
    is rejected, halving residual evaluations vs the textbook loop."""

    def linearize(pose):
        r, J, z = _residuals_jacobian(pose, cam, points_w, px_obs)
        r2 = jnp.sum(r * r, axis=-1)
        w = _robust_weights(r2, huber_delta) * weights_fixed
        H = jnp.einsum("n,nki,nkj->ij", w, J, J)
        g = jnp.einsum("n,nki,nk->i", w, J, r)
        if huber_delta > 0:
            rn = jnp.sqrt(r2.clip(1e-12))
            rho = jnp.where(rn <= huber_delta, r2,
                            2 * huber_delta * rn - huber_delta ** 2)
        else:
            rho = r2
        cost = jnp.sum(rho * weights_fixed)
        return H, g, cost

    def step(carry, _):
        pose_best, H_b, g_b, cost_best, pose_trial, lam = carry
        H_t, g_t, cost_t = linearize(pose_trial)
        accept = cost_t < cost_best
        sel = lambda a, b: jnp.where(accept, a, b)
        pose_best = jax.tree.map(sel, pose_trial, pose_best)
        H_b = sel(H_t, H_b)
        g_b = sel(g_t, g_b)
        cost_best = sel(cost_t, cost_best)
        lam = jnp.where(accept, lam * 0.33, lam * 10.0).clip(1e-8, 1e6)
        H_lm = H_b + lam * jnp.diag(jnp.diagonal(H_b)).clip(1e-8)
        delta = -_chol_solve6(
            H_lm + 1e-9 * jnp.eye(6, dtype=H_b.dtype), g_b)
        pose_trial = pose_best.retract(delta)
        return (pose_best, H_b, g_b, cost_best, pose_trial, lam), None

    H0, g0, cost0 = linearize(pose0)
    lam0 = jnp.asarray(1e-3, points_w.dtype)
    delta0 = -_chol_solve6(
        H0 + lam0 * jnp.diag(jnp.diagonal(H0)).clip(1e-8)
        + 1e-9 * jnp.eye(6, dtype=H0.dtype), g0)
    carry = (pose0, H0, g0, cost0, pose0.retract(delta0), lam0)
    (pose, _, _, cost, _, _), _ = jax.lax.scan(step, carry, None,
                                               length=iters)
    return pose, cost


def pnp_refine(pose0: SE3, cam: Camera, points_w, px_obs, valid, *,
               iters: int = 5, huber_delta: float = CHI2_THRESH_2DOF ** 0.5,
               chi2_thresh: float = CHI2_THRESH_2DOF,
               refine_l2: bool = True) -> PnPResult:
    """Motion-only PnP with the reference's two-phase semantics.

    Phase 1: Huber LM over all valid points (≤``iters`` iterations).
    Phase 2: prune residuals with chi² > thresh or non-positive depth,
    then L2 re-solve on the surviving inliers
    (reference multi_view_geometry.cpp:192-218).

    Args:
      pose0: initial T_c_w (motion-model or P3P output).
      points_w: [N, 3]; px_obs: [N, 2] undistorted pixels; valid: [N].
    """
    wfix = valid.astype(points_w.dtype)
    pose1, _ = _lm_solve(pose0, cam, points_w, px_obs, wfix,
                         iters=iters, huber_delta=huber_delta)

    r, _, z = _residuals_jacobian(pose1, cam, points_w, px_obs)
    chi2 = jnp.sum(r * r, axis=-1)
    inl = valid & (chi2 <= chi2_thresh) & (z > 0)

    if refine_l2:
        w2 = inl.astype(points_w.dtype)
        pose2, cost = _lm_solve(pose1, cam, points_w, px_obs, w2,
                                iters=max(1, iters - 2), huber_delta=0.0)
    else:
        pose2, cost = pose1, jnp.sum(chi2 * inl)

    r, _, z = _residuals_jacobian(pose2, cam, points_w, px_obs)
    chi2 = jnp.sum(r * r, axis=-1)
    inliers = valid & (chi2 <= chi2_thresh) & (z > 0)
    return PnPResult(pose=pose2.normalize(), inliers=inliers,
                     num_inliers=jnp.sum(inliers), cost=cost)
