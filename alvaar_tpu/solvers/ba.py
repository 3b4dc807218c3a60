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

  * the problem NEVER gets "built" — observations are the fixed-shape
    ``[W, K]`` keyframe tables with validity masks, one XLA program, zero
    host round-trips;

  * **virtual-landmark re-indexing** kills every scatter: by the stable-
    slot invariant (worldmap/keyframe.py) a landmark's observations all
    sit in ONE column k of the [W, K] table, so landmark parameters are
    re-indexed as (g, k) = (first observing row, column).  Membership is
    the dense boolean ``E[g, w, k]`` and every segment reduction
    (H_cl rows, landmark diagonal D, gradients, per-obs broadcast of
    landmark updates) becomes an einsum over the W axis — a TPU scatter
    serializes per row and is catastrophic under stream-batch vmap.
    The solve is therefore independent of the landmark-pool size L; the
    pool is touched only by O(1) gathers before and one masked scatter
    after the solve.  (A landmark merged across slots —
    worldmap/matching.py — briefly owns observations in two columns and
    is optimized as two split parameters; copies share the anchor and
    reconverge at the next keyframe's re-anchoring.)

  * inverse-depth blocks are 1-parameter, so H_ll is a vector and the
    Schur complement S = H_cc − H_clᵀ D⁻¹ H_cl is one [6W, WK]·[WK, 6W]
    MXU matmul plus a dense [6W × 6W] solve — W=30 → 180×180 (Ceres
    needs sparse machinery for this; we don't);

  * per-observation Jacobians come from forward-mode autodiff of the
    13-parameter residual (ξ_observer[6], ξ_anchor[6], δλ[1]) at the zero
    retraction, vmapped over all W·K observation slots; observer and
    anchor blocks assemble into full [6W] rows via the anchor one-hot so
    H_cc is a single self-adjoint matmul;

  * constant keyframes are handled by masking rows/columns of S
    (identity diagonal), never by rebuilding; accept/reject LM steps are
    branch-free (jnp.where on the whole state).

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


class _VirtualProblem(NamedTuple):
    """Scatter-free reformulation over the [W, K] observation grid."""
    poses: SE3            # [W]
    kf_valid: jax.Array   # [W]
    constant: jax.Array   # [W]
    valid: jax.Array      # [W, K] usable observations
    px: jax.Array         # [W, K, 2]
    E: jax.Array          # [W(g), W(w), K] f32 membership: obs (w,k) ∈ vlm (g,k)
    is_rep: jax.Array     # [W, K] bool — (g, k) is a live virtual landmark
    lam_v: jax.Array      # [W, K] inverse depth per virtual landmark
    mxy: jax.Array        # [W, K, 2] per-OBS anchor-frame coords (static)
    A1hot: jax.Array      # [W, K, W] f32 one-hot of each obs' anchor slot
    a_const: jax.Array    # [W, K] bool — anchor pose is constant
    a_valid: jax.Array    # [W, K] bool — anchor slot is a live keyframe


def _build_virtual(prob: BAProblem, cam: Camera) -> _VirtualProblem:
    """One-time gathers + membership structure (outside the LM loop)."""
    W, K = prob.obs_lm.shape
    lm = prob.obs_lm                                      # [W, K]
    valid = (prob.obs_valid & prob.lm_valid[lm]
             & prob.kf_valid[:, None])                    # [W, K]

    # anchor info per obs (gathered once; static during the solve)
    a_slot = prob.anchor_kf[lm]                           # [W, K]
    mxy = prob.anchor_mxy[lm]                             # [W, K, 2]
    lam_obs = prob.invdepth[lm]                           # [W, K]

    same = (lm[:, None, :] == lm[None, :, :])             # [g, w, k]
    both = valid[:, None, :] & valid[None, :, :]
    member = same & both
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (W, W, K), 0)
    first = jnp.min(jnp.where(member, g_iota, W), axis=0)  # [w, k]
    is_rep = valid & (first == jax.lax.broadcasted_iota(jnp.int32, (W, K), 0))
    E = (member & (first[None, :, :]
                   == g_iota)).astype(prob.obs_px.dtype)   # [g, w, k]

    lam_v = jnp.where(is_rep, lam_obs, 1.0)

    a_idx = jnp.clip(a_slot, 0, W - 1)
    A1hot = (a_idx[:, :, None]
             == jnp.arange(W)[None, None, :]).astype(prob.obs_px.dtype)
    a_const = prob.constant[a_idx]
    a_valid = prob.kf_valid[a_idx] & (a_slot >= 0)
    valid = valid & a_valid

    return _VirtualProblem(
        poses=prob.poses, kf_valid=prob.kf_valid, constant=prob.constant,
        valid=valid, px=prob.obs_px, E=E, is_rep=is_rep, lam_v=lam_v,
        mxy=mxy, A1hot=A1hot, a_const=a_const, a_valid=a_valid)


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


def _per_obs_inputs(vp: _VirtualProblem, poses: SE3, lam_v):
    """Per-observation solve inputs, all via dense contractions."""
    W, K = vp.valid.shape
    q_o = jnp.broadcast_to(poses.q[:, None, :], (W, K, 4))
    t_o = jnp.broadcast_to(poses.t[:, None, :], (W, K, 3))
    q_a = jnp.einsum("wkv,vq->wkq", vp.A1hot, poses.q)
    t_a = jnp.einsum("wkv,vq->wkq", vp.A1hot, poses.t)
    lam = jnp.einsum("gwk,gk->wk", vp.E, lam_v)
    lam = jnp.where(vp.valid, lam, 1.0)
    return q_o, t_o, q_a, t_a, lam


def _residuals_jacobians(vp: _VirtualProblem, poses: SE3, lam_v, cam: Camera,
                         with_jac: bool):
    """Residuals [W, K, 2] (+ Jacobians [W, K, 2, 13], depths [W, K]).

    Jacobians come from forward-mode autodiff of the 13-parameter
    residual at the zero retraction.  An analytic closed-form version
    (observer [I|−hat(X_c)], anchor R_o R_aᵀ[−I|hat(X_a)], depth
    −R_o R_aᵀ X_a/λ — validated equal to f32 roundoff) was measured 2x
    SLOWER on TPU: it assembles [W,K,3,3]/[W,K,3,13] tensors through
    tiny batched matmuls that pad to (8,128) vregs at ~3% utilization,
    while jacfwd lowers to fully fused elementwise chains."""
    W, K = vp.valid.shape
    q_o, t_o, q_a, t_a, lam = _per_obs_inputs(vp, poses, lam_v)
    zero13 = jnp.zeros(13, vp.px.dtype)

    def r_only(p, *args):
        return _obs_residual(p, *args)[0]

    def one(q_o, t_o, q_a, t_a, mxy, lam, px):
        args = (q_o, t_o, q_a, t_a, mxy, lam, px,
                cam.fx, cam.fy, cam.cx, cam.cy)
        r, z = _obs_residual(zero13, *args)
        if not with_jac:
            return r, z
        J = jax.jacfwd(r_only)(zero13, *args)
        return r, J, z

    flat = lambda x: x.reshape((W * K,) + x.shape[2:])
    out = jax.vmap(one)(flat(q_o), flat(t_o), flat(q_a), flat(t_a),
                        flat(vp.mxy), flat(lam), flat(vp.px))
    if not with_jac:
        r, z = out
        return r.reshape(W, K, 2), None, z.reshape(W, K)
    r, J, z = out
    return r.reshape(W, K, 2), J.reshape(W, K, 2, 13), z.reshape(W, K)


def _rot_soa(qw, qx, qy, qz, vx, vy, vz):
    """quat_rotate on component planes: v + 2*q×(q×v + w*v) — every
    operand a full [W, K] array, so the VPU runs at full lane width."""
    cx = qy * vz - qz * vy + qw * vx
    cy = qz * vx - qx * vz + qw * vy
    cz = qx * vy - qy * vx + qw * vz
    return (vx + 2.0 * (qy * cz - qz * cy),
            vy + 2.0 * (qz * cx - qx * cz),
            vz + 2.0 * (qx * cy - qy * cx))


def _residuals_fast(vp: _VirtualProblem, poses: SE3, lam_v, cam: Camera):
    """Jacobian-free residual/depth pass in SoA form.

    Identical semantics to ``_residuals_jacobians(..., with_jac=False)``
    but computed on [W, K] component planes instead of a vmap over W·K
    observations with 2-4-wide trailing dims — the vmapped form pads
    every intermediate to 128 lanes at ~3% utilization and measured
    ~4.3 ms at production shapes vs sub-millisecond here.  This pass
    runs every LM iteration (trial cost) and twice more for pruning, so
    it dominated the 10k-landmark BA budget (reference budget ≤10 ms,
    optimizer.cpp:251-262).
    """
    lam = jnp.einsum("gwk,gk->wk", vp.E, lam_v)
    lam = jnp.where(vp.valid, lam, 1.0)
    lam_safe = jnp.where(jnp.abs(lam) < 1e-6, 1e-6, lam)

    # anchor-frame point X_a = [mxy, 1] / lam
    Xax = vp.mxy[..., 0] / lam_safe
    Xay = vp.mxy[..., 1] / lam_safe
    Xaz = 1.0 / lam_safe

    # anchor pose per obs (gathered via the anchor one-hot)
    q_a = jnp.einsum("wkv,vq->wkq", vp.A1hot, poses.q)
    t_a = jnp.einsum("wkv,vq->wkq", vp.A1hot, poses.t)

    # X_w = R(q_a)ᵀ (X_a − t_a)   (T_a⁻¹ · X_a, conjugate rotation)
    vx = Xax - t_a[..., 0]
    vy = Xay - t_a[..., 1]
    vz = Xaz - t_a[..., 2]
    Xwx, Xwy, Xwz = _rot_soa(q_a[..., 0], -q_a[..., 1], -q_a[..., 2],
                             -q_a[..., 3], vx, vy, vz)

    # X_c = R(q_o) X_w + t_o  (observer pose broadcast along K)
    ow = poses.q[:, None, 0]
    Xcx, Xcy, Xcz = _rot_soa(ow, poses.q[:, None, 1], poses.q[:, None, 2],
                             poses.q[:, None, 3], Xwx, Xwy, Xwz)
    Xcx = Xcx + poses.t[:, None, 0]
    Xcy = Xcy + poses.t[:, None, 1]
    z = Xcz + poses.t[:, None, 2]

    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * Xcx / z_safe + cam.cx
    v = cam.fy * Xcy / z_safe + cam.cy
    r = jnp.stack([u - vp.px[..., 0], v - vp.px[..., 1]], axis=-1)
    return r, z


def _huber_w(r2, delta):
    rn = jnp.sqrt(r2.clip(1e-12))
    return jnp.where(rn <= delta, 1.0, delta / rn)


def _huber_rho(r2, delta):
    rn = jnp.sqrt(r2.clip(1e-12))
    return jnp.where(rn <= delta, r2, 2 * delta * rn - delta * delta)


class _Linearization(NamedTuple):
    """Damping-independent normal-equation blocks of one linearization."""
    H_cc: jax.Array   # [6W, 6W] raw camera block (no damping)
    g_c: jax.Array    # [6W]
    u: jax.Array      # [W, K, 6] wJl·J_o (observer coupling)
    va: jax.Array     # [W(g), K, 6] Σ_members wJl·J_a (anchor coupling)
    D: jax.Array      # [W(g), K] landmark diagonal
    g_l: jax.Array    # [W(g), K] landmark gradient
    cost: jax.Array   # robust cost at the linearization point


def _linearize(vp: _VirtualProblem, poses: SE3, lam_v, cam: Camera,
               huber_delta) -> _Linearization:
    """BLOCKWISE normal-equation build, scatter-free.

    The full camera-row Jacobian Jfull [W, K, 2, 6W] is never
    materialized (it is 14x larger than its nonzeros and dominates HBM
    traffic under stream-batch vmap): every product against it is
    assembled blockwise from its structure — the observer 2x6 block lives
    at column w, the anchor block at column a(w,k), zeros elsewhere — so
    the largest tensors in the build are [W, K, W] / [W, W, 6, 6]
    einsums.  Validated equal to the dense formulation to 2e-13 in f64.
    """
    W, K = vp.valid.shape
    C = 6 * W
    HI = jax.lax.Precision.HIGHEST
    r, J, z = _residuals_jacobians(vp, poses, lam_v, cam, with_jac=True)

    r2 = jnp.sum(r * r, axis=-1)                          # [W, K]
    w = jnp.where(vp.valid, _huber_w(r2, huber_delta), 0.0)
    cost = jnp.sum(jnp.where(vp.valid, _huber_rho(r2, huber_delta), 0.0))

    J_o = J[:, :, :, :6]                                  # [W, K, 2, 6]
    J_a = J[:, :, :, 6:12]
    J_l = J[:, :, :, 12]                                  # [W, K, 2]

    # gauge fixing: zero constant blocks (reference optimizer.cpp:235-247)
    J_o = jnp.where(vp.constant[:, None, None, None], 0.0, J_o)
    J_a = jnp.where(vp.a_const[:, :, None, None], 0.0, J_a)

    wJ_o = J_o * w[:, :, None, None]
    wJ_a = J_a * w[:, :, None, None]
    A = vp.A1hot                                          # [W, K, W]
    eyeW = jnp.eye(W, dtype=J.dtype)

    # ---- H_cc blockwise [W, W, 6, 6]: observer-observer on the diagonal,
    # observer-anchor at (w, a), anchor-anchor on the (a, a) diagonal ----
    Hoo = jnp.einsum("wkri,wkrj->wij", wJ_o, J_o, precision=HI)
    Hoa = jnp.einsum("wkri,wkrj,wka->waij", wJ_o, J_a, A, precision=HI)
    Haa = jnp.einsum("wkri,wkrj,wka->aij", wJ_a, J_a, A, precision=HI)
    Hblk = (eyeW[:, :, None, None] * (Hoo + Haa)[:, None]
            + Hoa + jnp.swapaxes(jnp.swapaxes(Hoa, 0, 1), 2, 3))
    H_cc = Hblk.transpose(0, 2, 1, 3).reshape(C, C)

    g_blk = (jnp.einsum("wkri,wkr->wi", wJ_o, r, precision=HI)
             + jnp.einsum("wkri,wkr,wka->ai", wJ_a, r, A, precision=HI))
    g_c = g_blk.reshape(C)

    # ---- landmark couplings over virtual landmarks (g, k): the H_cl row
    # of vlm (g,k) is E[g,x,k]·u[x,k] at column x plus va[g,k] at the
    # (shared) anchor column ----
    wJl = J_l * w[:, :, None]                             # [W, K, 2]
    u = jnp.einsum("wkr,wkri->wki", wJl, J_o, precision=HI)
    v = jnp.einsum("wkr,wkri->wki", wJl, J_a, precision=HI)
    D = jnp.einsum("gwk,wk->gk", vp.E, w * jnp.sum(J_l * J_l, -1))
    g_l = jnp.einsum("gwk,wk->gk", vp.E, jnp.sum(wJl * r, -1))
    va = jnp.einsum("gwk,wki->gki", vp.E, v, precision=HI)  # [g, K, 6]
    return _Linearization(H_cc, g_c, u, va, D, g_l, cost)


def _solve_lm(vp: _VirtualProblem, lin: _Linearization, lam_lm):
    """Damped Schur solve from carried normal-equation blocks.

    Returns (delta_pose [W, 6], delta_lam_v [W, K]).
    """
    W, K = vp.valid.shape
    C = 6 * W
    HI = jax.lax.Precision.HIGHEST
    eyeW = jnp.eye(W, dtype=lin.H_cc.dtype)
    Av = vp.A1hot
    u, va, D, g_l = lin.u, lin.va, lin.D, lin.g_l

    # ---- LM damping ----
    diag = jnp.diagonal(lin.H_cc)
    H_cc = lin.H_cc + jnp.diag(lam_lm * diag.clip(1e-8))
    D_damped = D * (1.0 + lam_lm)

    lm_active = vp.is_rep & (D > 1e-12)
    D_safe = jnp.where(lm_active, D_damped, 1.0)
    invD = jnp.where(lm_active, 1.0 / D_safe, 0.0)        # [g, k]

    # ---- Schur correction M = H_clᵀ D⁻¹ H_cl, blockwise ----
    Ed = vp.E * invD[:, None, :]                          # [g, w, k]
    G = jnp.einsum("gxk,gyk->xyk", Ed, vp.E, precision=HI)
    T_uu = jnp.einsum("xyk,xki,ykj->xyij", G, u, u, precision=HI)
    F = jnp.einsum("gxk,gky,gkj->xkyj", Ed, Av, va, precision=HI)
    T_uv = jnp.einsum("xkyj,xki->xyij", F, u, precision=HI)
    T_vv = jnp.einsum("gkx,gk,gki,gkj->xij", Av, invD, va, va, precision=HI)
    M = (T_uu + T_uv + jnp.swapaxes(jnp.swapaxes(T_uv, 0, 1), 2, 3)
         + eyeW[:, :, None, None] * T_vv[:, None])
    S = H_cc - M.transpose(0, 2, 1, 3).reshape(C, C)

    gld = g_l * invD                                      # [g, k]
    hts = (jnp.einsum("gxk,gk,xki->xi", vp.E, gld, u, precision=HI)
           + jnp.einsum("gkx,gk,gki->xi", Av, gld, va, precision=HI))
    g_s = lin.g_c - hts.reshape(C)

    # mask constant/dead keyframes: identity rows/cols, zero gradient
    free = (vp.kf_valid & ~vp.constant)
    free6 = jnp.repeat(free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 1e-9, 1.0))
    g_s = jnp.where(free6, g_s, 0.0)

    # S is symmetric positive definite by construction (Gauss-Newton
    # normal equations + LM damping + identity rows) → Cholesky, which
    # is substantially faster than LU on TPU for the batched 180×180
    # solves this amounts to under stream-vmap
    chol = jax.lax.linalg.cholesky(0.5 * (S + S.T))
    ok = jnp.all(jnp.isfinite(chol))
    y = jax.scipy.linalg.solve_triangular(chol, g_s, lower=True)
    delta_c = -jax.scipy.linalg.solve_triangular(chol, y, lower=True,
                                                 trans=1)
    # fall back to zero step on a (numerically) indefinite system — the
    # LM loop then rejects and raises damping
    delta_c = jnp.where(ok & jnp.isfinite(delta_c), delta_c, 0.0)
    delta_c = jnp.where(free6, delta_c, 0.0)
    dC = delta_c.reshape(W, 6)

    # back-substitute: delta_l = -(g_l + H_cl @ delta_c) / D
    hdc = (jnp.einsum("gxk,xki,xi->gk", vp.E, u, dC, precision=HI)
           + jnp.einsum("gki,gkx,xi->gk", va, Av, dC, precision=HI))
    delta_l = -(g_l + hdc) * invD
    delta_l = jnp.where(lm_active, delta_l, 0.0)
    return dC, delta_l


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
    W, K = prob.obs_lm.shape

    def lm_phase(vp: _VirtualProblem, delta_huber, n_iters, poses, lam_v):
        """Branch-free accept/reject LM.  Each iteration: one fused
        linearize+solve (XLA keeps the jacfwd intermediates feeding the
        normal-equation einsums in registers — carrying the blocks across
        iterations for a 'deferred accept' scheme was measured SLOWER:
        the [6W,6W]+[W,K,6] carry selects break that fusion), plus one
        jacobian-free residual pass for the trial cost."""

        def cost_only(poses, lam_v):
            r, _ = _residuals_fast(vp, poses, lam_v, cam)
            r2 = jnp.sum(r * r, axis=-1)
            return jnp.sum(jnp.where(vp.valid,
                                     _huber_rho(r2, delta_huber), 0.0))

        def step(carry, _):
            poses, lam_v, lam_lm, cost = carry
            lin = _linearize(vp, poses, lam_v, cam, delta_huber)
            dc, dl = _solve_lm(vp, lin, lam_lm)
            new_poses = SE3.exp(dc).compose(SE3(poses.q, poses.t)).normalize()
            new_lam_v = lam_v + dl
            new_cost = cost_only(new_poses, new_lam_v)
            accept = new_cost < cost
            poses = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                                 new_poses, poses)
            lam_v = jnp.where(accept, new_lam_v, lam_v)
            cost = jnp.where(accept, new_cost, cost)
            lam_lm = jnp.where(accept, lam_lm * 0.33, lam_lm * 10.0)
            lam_lm = lam_lm.clip(1e-8, 1e8)
            return (poses, lam_v, lam_lm, cost), None

        cost0 = cost_only(poses, lam_v)
        (poses, lam_v, _, cost), _ = jax.lax.scan(
            step, (poses, lam_v, jnp.asarray(1e-4, lam_v.dtype), cost0),
            None, length=n_iters)
        return poses, lam_v, cost

    vp = _build_virtual(prob, cam)

    # phase 1: Huber
    poses1, lam_v1, _ = lm_phase(vp, huber_delta, iters,
                                 prob.poses, vp.lam_v)

    # prune: chi2 or non-positive depth in the observer frame
    r, z = _residuals_fast(vp, poses1, lam_v1, cam)
    r2 = jnp.sum(r * r, axis=-1)
    lam_obs1 = jnp.einsum("gwk,gk->wk", vp.E, lam_v1)
    keep = vp.valid & (r2 <= chi2_thresh) & (z > 0) & (lam_obs1 > 1e-6)

    # phase 2: L2 re-solve on inliers (reference's 1 ms refine pass —
    # fixed small iteration count here).  Rebuild membership on the
    # pruned mask so dropped observations leave their virtual landmark.
    vp2 = vp._replace(valid=keep)
    huge = jnp.asarray(1e9, prob.invdepth.dtype)  # Huber with huge delta == L2
    poses2, lam_v2, cost = lm_phase(vp2, huge, refine_iters, poses1, lam_v1)

    r, z = _residuals_fast(vp2, poses2, lam_v2, cam)
    r2 = jnp.sum(r * r, axis=-1)
    lam_obs2 = jnp.einsum("gwk,gk->wk", vp.E, lam_v2)
    inlier = vp.valid & (r2 <= chi2_thresh) & (z > 0) & (lam_obs2 > 1e-6)

    # write the virtual-landmark depths back to the pool: representatives
    # are unique per landmark (one masked scatter, outside all loops)
    from alvaar_tpu.worldmap.state import masked_scatter_set
    invdepth = masked_scatter_set(
        prob.invdepth, prob.obs_lm.reshape(-1), lam_v2.reshape(-1),
        vp.is_rep.reshape(-1))

    return BAResult(
        poses=SE3(poses2.q, poses2.t).normalize(),
        invdepth=invdepth,
        obs_inlier=inlier,
        cost=cost,
        num_obs=jnp.sum(inlier),
    )
