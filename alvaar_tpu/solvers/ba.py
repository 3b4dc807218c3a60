"""Local bundle adjustment: masked Levenberg-Marquardt with Schur elimination.

TPU-native replacement for the reference's Ceres local BA
(reference src/slam/src/optimizer.cpp:20-530): sliding-window BA over the
covisible keyframe set with anchored inverse-depth landmarks
(ceres_parametrization.cpp:157-269 ReprojectionErrorKSE3AnchInvDepth),
Huber loss, LM with ≤5 iterations + SPARSE_SCHUR (optimizer.cpp:251-262),
gauge fixing by holding low-covisibility keyframes constant
(optimizer.cpp:94-107,235-247), then chi²/negative-depth outlier pruning
and an L2 re-solve (optimizer.cpp:264-359).

TPU-first design (not a port):
  * the problem NEVER gets "built" — the observation tables are fixed-shape
    ``[W, K]`` arrays with validity masks, so the whole solve is one XLA
    program with zero host round-trips;
  * inverse-depth landmark blocks are 1-parameter, so H_ll is a diagonal
    vector and the Schur complement S = H_cc − H_clᵀ D⁻¹ H_cl is two dense
    matmuls (MXU work) plus a [6W × 6W] solve — W=30 keyframes → 180×180,
    trivially dense (Ceres needs sparse machinery for this; we don't);
  * per-observation Jacobians come from forward-mode autodiff of the
    13-parameter residual (ξ_observer[6], ξ_anchor[6], δλ[1]) at the zero
    retraction, vmapped over all W·K observation slots;
  * constant keyframes are handled by masking their rows/columns of S
    (identity diagonal), not by rebuilding the problem;
  * accept/reject LM steps are branch-free (jnp.where on the whole state).

Pose convention: window poses are T_cw (world→camera); landmark i lives at
``X_w = T_cw[anchor]⁻¹ · ([m_i, 1] / λ_i)`` with m the anchor-frame
normalized image coords and λ the inverse z-depth.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvaar_tpu.geom.camera import Camera
from alvaar_tpu.geom.lie import SE3
from alvaar_tpu.solvers.pnp import CHI2_THRESH_2DOF


class BAProblem(NamedTuple):
    """Fixed-shape local-BA inputs (the window slice of the map state)."""
    poses: SE3           # [W] T_cw keyframe poses
    kf_valid: jax.Array  # [W] bool — live ring slots
    constant: jax.Array  # [W] bool — gauge-fixed poses
    anchor_kf: jax.Array   # [L] int32 — ring slot of each landmark's anchor
    anchor_mxy: jax.Array  # [L, 2] normalized coords in anchor frame
    invdepth: jax.Array    # [L] inverse depth (anchor z)
    lm_valid: jax.Array    # [L] bool
    obs_lm: jax.Array      # [W, K] int32 landmark ids
    obs_px: jax.Array      # [W, K, 2] undistorted pixel observations
    obs_valid: jax.Array   # [W, K] bool


class BAResult(NamedTuple):
    poses: SE3
    invdepth: jax.Array
    obs_inlier: jax.Array  # [W, K] chi2/depth-gated inliers after the solve
    cost: jax.Array
    num_obs: jax.Array


def _obs_residual(params13, q_o, t_o, q_a, t_a, mxy, lam, px, fx, fy, cx, cy):
    """Reprojection residual of one observation at a 13-dim retraction.

    params13 = [ξ_observer(6), ξ_anchor(6), δλ(1)].  Returns (r [2], z_obs).
    """
    xi_o, xi_a, dl = params13[:6], params13[6:12], params13[12]
    T_o = SE3.exp(xi_o).compose(SE3(q_o, t_o))
    T_a = SE3.exp(xi_a).compose(SE3(q_a, t_a))
    lam_new = lam + dl
    lam_safe = jnp.where(jnp.abs(lam_new) < 1e-6, 1e-6, lam_new)
    X_a = jnp.concatenate([mxy, jnp.ones(1, mxy.dtype)]) / lam_safe
    X_w = T_a.inverse().apply(X_a)
    X_c = T_o.apply(X_w)
    z = X_c[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = fx * X_c[0] / z_safe + cx
    v = fy * X_c[1] / z_safe + cy
    return jnp.stack([u - px[0], v - px[1]]), z


def _residuals_and_jacobians(prob: BAProblem, cam: Camera):
    """All residuals [O, 2], Jacobians [O, 2, 13], depths [O], flattened
    over the [W, K] observation table."""
    W, K = prob.obs_lm.shape
    O = W * K
    kf_idx = jnp.repeat(jnp.arange(W), K)           # [O]
    lm_idx = prob.obs_lm.reshape(O)
    px = prob.obs_px.reshape(O, 2)

    q_o = prob.poses.q[kf_idx]
    t_o = prob.poses.t[kf_idx]
    a_idx = prob.anchor_kf[lm_idx]
    q_a = prob.poses.q[a_idx]
    t_a = prob.poses.t[a_idx]
    mxy = prob.anchor_mxy[lm_idx]
    lam = prob.invdepth[lm_idx]

    zero13 = jnp.zeros(13, px.dtype)

    def r_only(p, *args):
        return _obs_residual(p, *args)[0]

    def one(q_o, t_o, q_a, t_a, mxy, lam, px):
        args = (q_o, t_o, q_a, t_a, mxy, lam, px,
                cam.fx, cam.fy, cam.cx, cam.cy)
        r, z = _obs_residual(zero13, *args)
        J = jax.jacfwd(r_only)(zero13, *args)
        return r, J, z

    r, J, z = jax.vmap(one)(q_o, t_o, q_a, t_a, mxy, lam, px)

    valid = (prob.obs_valid.reshape(O)
             & prob.lm_valid[lm_idx]
             & prob.kf_valid[kf_idx])
    return r, J, z, valid, kf_idx, lm_idx, a_idx


def _huber_w(r2, delta):
    rn = jnp.sqrt(r2.clip(1e-12))
    return jnp.where(rn <= delta, 1.0, delta / rn)


def _huber_rho(r2, delta):
    rn = jnp.sqrt(r2.clip(1e-12))
    return jnp.where(rn <= delta, r2, 2 * delta * rn - delta * delta)


def _build_and_solve(prob: BAProblem, cam: Camera, huber_delta, lam_lm):
    """One LM linearization: build the Schur system, solve, return updates.

    Returns (delta_pose [W, 6], delta_lm [L], cost, r2_per_obs, valid_obs).
    """
    W = prob.obs_lm.shape[0]
    L = prob.invdepth.shape[0]
    r, J, z, valid, kf_idx, lm_idx, a_idx = _residuals_and_jacobians(prob, cam)

    r2 = jnp.sum(r * r, axis=-1)
    w = jnp.where(valid, _huber_w(r2, huber_delta), 0.0)
    cost = jnp.sum(jnp.where(valid, _huber_rho(r2, huber_delta), 0.0))

    J_o = J[:, :, :6]                     # observer pose block
    J_a = J[:, :, 6:12]                   # anchor pose block
    J_l = J[:, :, 12]                     # landmark block [O, 2]

    # anchor pose of a landmark may be constant → zero its Jacobian;
    # same for observer (gauge fixing, reference optimizer.cpp:235-247)
    const_o = prob.constant[kf_idx]
    const_a = prob.constant[a_idx]
    J_o = jnp.where(const_o[:, None, None], 0.0, J_o)
    J_a = jnp.where(const_a[:, None, None], 0.0, J_a)

    wJ_o = J_o * w[:, None, None]
    wJ_a = J_a * w[:, None, None]

    # --- camera-camera block [W, W, 6, 6] ---
    H_cc = jnp.zeros((W, W, 6, 6), r.dtype)
    blk_oo = jnp.einsum("oki,okj->oij", wJ_o, J_o)
    blk_oa = jnp.einsum("oki,okj->oij", wJ_o, J_a)
    blk_aa = jnp.einsum("oki,okj->oij", wJ_a, J_a)
    H_cc = H_cc.at[kf_idx, kf_idx].add(blk_oo)
    H_cc = H_cc.at[kf_idx, a_idx].add(blk_oa)
    H_cc = H_cc.at[a_idx, kf_idx].add(jnp.swapaxes(blk_oa, -1, -2))
    H_cc = H_cc.at[a_idx, a_idx].add(blk_aa)

    # --- camera-landmark block [L, W, 6] and landmark diagonal [L] ---
    H_cl = jnp.zeros((L, W, 6), r.dtype)
    v_lo = jnp.einsum("ok,oki->oi", J_l * w[:, None], J_o)
    v_la = jnp.einsum("ok,oki->oi", J_l * w[:, None], J_a)
    H_cl = H_cl.at[lm_idx, kf_idx].add(v_lo)
    H_cl = H_cl.at[lm_idx, a_idx].add(v_la)
    D = jnp.zeros((L,), r.dtype).at[lm_idx].add(
        w * jnp.sum(J_l * J_l, axis=-1))

    # --- gradients ---
    g_c = jnp.zeros((W, 6), r.dtype)
    g_c = g_c.at[kf_idx].add(jnp.einsum("oki,ok->oi", wJ_o, r))
    g_c = g_c.at[a_idx].add(jnp.einsum("oki,ok->oi", wJ_a, r))
    g_l = jnp.zeros((L,), r.dtype).at[lm_idx].add(
        w * jnp.sum(J_l * r, axis=-1))

    # --- LM damping ---
    Hcc_flat = H_cc.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    diag = jnp.diagonal(Hcc_flat)
    Hcc_flat = Hcc_flat + jnp.diag(lam_lm * diag.clip(1e-8))
    D_damped = D * (1.0 + lam_lm)

    # --- Schur complement over landmarks ---
    lm_active = prob.lm_valid & (D > 1e-12)
    D_safe = jnp.where(lm_active, D_damped, 1.0)
    Hcl_flat = H_cl.reshape(L, 6 * W)
    Hcl_eff = jnp.where(lm_active[:, None], Hcl_flat, 0.0)
    S = Hcc_flat - Hcl_eff.T @ (Hcl_eff / D_safe[:, None])
    g_s = g_c.reshape(6 * W) - Hcl_eff.T @ (
        jnp.where(lm_active, g_l, 0.0) / D_safe)

    # mask constant/dead keyframes: identity rows/cols, zero gradient
    free = (prob.kf_valid & ~prob.constant)
    free6 = jnp.repeat(free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 1e-9, 1.0))
    g_s = jnp.where(free6, g_s, 0.0)

    delta_c = -jnp.linalg.solve(S, g_s)
    delta_c = jnp.where(free6, delta_c, 0.0)

    # back-substitute landmarks
    delta_l = -(jnp.where(lm_active, g_l, 0.0)
                + Hcl_eff @ delta_c) / D_safe
    delta_l = jnp.where(lm_active, delta_l, 0.0)
    return delta_c.reshape(W, 6), delta_l, cost, r2, valid


def _total_cost(prob: BAProblem, cam: Camera, huber_delta):
    r, J, z, valid, *_ = _residuals_and_jacobians(prob, cam)
    r2 = jnp.sum(r * r, axis=-1)
    return jnp.sum(jnp.where(valid, _huber_rho(r2, huber_delta), 0.0))


@partial(jax.jit, static_argnames=("iters", "refine_iters"))
def local_ba(prob: BAProblem, cam: Camera, *, iters: int = 5,
             refine_iters: int = 2,
             huber_delta: float = CHI2_THRESH_2DOF ** 0.5,
             chi2_thresh: float = CHI2_THRESH_2DOF) -> BAResult:
    """Two-phase local BA with the reference's semantics: Huber LM solve,
    chi²/depth outlier pruning, short L2 re-solve on inliers
    (reference optimizer.cpp:249-359).

    Runs under float32 matmul precision: TPU's default bf16 passes cap the
    Schur solve's convergence at ~centimeter level; full f32 restores
    millimeter convergence at negligible cost for these shapes."""
    with jax.default_matmul_precision("float32"):
        return _local_ba_impl(prob, cam, iters=iters,
                              refine_iters=refine_iters,
                              huber_delta=huber_delta,
                              chi2_thresh=chi2_thresh)


def _local_ba_impl(prob: BAProblem, cam: Camera, *, iters, refine_iters,
                   huber_delta, chi2_thresh) -> BAResult:

    def lm_phase(prob, obs_mask, delta_huber, n_iters):
        p = prob._replace(obs_valid=obs_mask)

        def step(carry, _):
            poses, invd, lam_lm, cost = carry
            cur = p._replace(poses=poses, invdepth=invd)
            dc, dl, _, _, _ = _build_and_solve(cur, cam, delta_huber, lam_lm)
            new_poses = SE3.exp(dc).compose(SE3(poses.q, poses.t)).normalize()
            new_invd = invd + dl
            new_cost = _total_cost(
                p._replace(poses=new_poses, invdepth=new_invd), cam,
                delta_huber)
            accept = new_cost < cost
            poses = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                                 new_poses, poses)
            invd = jnp.where(accept, new_invd, invd)
            cost = jnp.where(accept, new_cost, cost)
            lam_lm = jnp.where(accept, lam_lm * 0.33, lam_lm * 10.0)
            lam_lm = lam_lm.clip(1e-8, 1e8)
            return (poses, invd, lam_lm, cost), None

        cost0 = _total_cost(p, cam, delta_huber)
        (poses, invd, _, cost), _ = jax.lax.scan(
            step,
            (p.poses, p.invdepth, jnp.asarray(1e-4, p.invdepth.dtype), cost0),
            None, length=n_iters)
        return poses, invd, cost

    # phase 1: Huber
    poses1, invd1, _ = lm_phase(prob, prob.obs_valid, huber_delta, iters)

    # prune: chi2 or non-positive depth in the observer frame
    p1 = prob._replace(poses=poses1, invdepth=invd1)
    r, J, z, valid, kf_idx, lm_idx, a_idx = _residuals_and_jacobians(p1, cam)
    r2 = jnp.sum(r * r, axis=-1)
    W, K = prob.obs_lm.shape
    keep = valid & (r2 <= chi2_thresh) & (z > 0) & (invd1[lm_idx] > 1e-6)
    obs_mask2 = keep.reshape(W, K)

    # phase 2: L2 re-solve on inliers (reference's 1 ms refine pass —
    # fixed small iteration count here)
    huge = jnp.asarray(1e9, prob.invdepth.dtype)  # Huber with huge delta == L2
    poses2, invd2, cost = lm_phase(
        prob._replace(poses=poses1, invdepth=invd1), obs_mask2, huge,
        refine_iters)

    p2 = prob._replace(poses=poses2, invdepth=invd2)
    r, J, z, valid, kf_idx, lm_idx, a_idx = _residuals_and_jacobians(p2, cam)
    r2 = jnp.sum(r * r, axis=-1)
    inlier = valid & (r2 <= chi2_thresh) & (z > 0) & (invd2[lm_idx] > 1e-6)
    return BAResult(
        poses=SE3(poses2.q, poses2.t).normalize(),
        invdepth=invd2,
        obs_inlier=inlier.reshape(W, K),
        cost=cost,
        num_obs=jnp.sum(inlier),
    )
