"""Two-view relative pose: batched 8-point essential matrix + RANSAC.

TPU-native replacement for the reference's bootstrap
``MultiViewGeometry::compute5ptEssentialMatrix`` (reference
src/slam/src/multi_view_geometry.cpp:225-320: OpenGV RANSAC over Nister's
5-point with 2x angular threshold, ≥10 inliers, translation normalized to
unit scale at visual_frontend.cpp:547).

Divergence (document-and-diverge): Nister's 5-point needs the roots of a
10th-degree polynomial — a nonsymmetric eigenproblem XLA cannot run on
TPU — so the minimal solver here is the 8-point algorithm (Hartley
normalized, batched SVD null vector), which is a single batched SVD and
maps perfectly onto the TPU.  RANSAC draws 8-point samples instead of 5;
with the same iteration budget this slightly lowers the outlier tolerance
per iteration but each hypothesis is far cheaper, and the bootstrap runs
once.  Candidate models are scored the way the reference's SAC problem
does: decompose E → 4 (R, t), triangulate every correspondence, gate on
positive depth in both views, and measure the angular reprojection error
``1 − cos θ`` in both views.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvaar_tpu.geom.lie import SE3, matrix_to_quat
from alvaar_tpu.geom.triangulation import triangulate_midpoint
from alvaar_tpu.solvers.ransac import sample_minimal


class RelativePoseResult(NamedTuple):
    pose: SE3            # T_c0_c1: pose of cam1 in cam0's frame, |t| = 1
    inliers: jax.Array   # [N] bool
    num_inliers: jax.Array
    success: jax.Array


def essential_from_8pt(f0, f1):
    """Least-squares essential matrix from ≥8 bearing pairs.

    f0, f1: [..., M, 3] unit bearings with f1ᵀ E f0 = 0.
    Returns E [..., 3, 3] projected onto the essential manifold.
    """
    A = jnp.einsum("...mi,...mj->...mij", f1, f0).reshape(f0.shape[:-2] + (f0.shape[-2], 9))
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    e = Vt[..., -1, :]
    E = e.reshape(e.shape[:-1] + (3, 3))
    # project: singular values → (1, 1, 0)
    U, _, Vt2 = jnp.linalg.svd(E)
    S = jnp.zeros_like(E).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    return U @ S @ Vt2


def decompose_essential(E):
    """E [..., 3, 3] → 4 candidate (R_10, t_10) with X_c1 = R X_c0 + t.

    Returns R [..., 4, 3, 3], t [..., 4, 3] (unit translation).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True).clip(1e-12)
    R4 = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    t4 = jnp.stack([t, -t, t, -t], axis=-2)
    return R4, t4


def _score_candidates(pose_01: SE3, f0, f1, thresh):
    """Angular two-view reprojection scoring for relative-pose candidates.

    pose_01 has leading candidate dims [C]; f0/f1 are [N, 3].
    Returns err [C, N] and pos-depth mask [C, N].
    """
    rel = SE3(pose_01.q[:, None, :], pose_01.t[:, None, :])
    X0 = triangulate_midpoint(rel, f0[None], f1[None])  # [C, N, 3] in cam0
    X1 = rel.inverse().apply(X0)
    d0 = X0[..., 2]
    d1 = X1[..., 2]
    n0 = X0 / jnp.linalg.norm(X0, axis=-1, keepdims=True).clip(1e-12)
    n1 = X1 / jnp.linalg.norm(X1, axis=-1, keepdims=True).clip(1e-12)
    e0 = 1.0 - jnp.sum(n0 * f0[None], axis=-1)
    e1 = 1.0 - jnp.sum(n1 * f1[None], axis=-1)
    err = e0 + e1
    posdepth = (d0 > 0) & (d1 > 0)
    return err, posdepth


def refine_relative_pose(pose_01: SE3, inliers, f0, f1, thresh, valid):
    """Least-squares E refit on an inlier set + re-decomposition (the
    'local optimization' step after RANSAC).  Rows outside the inlier
    set are zeroed — zero rows do not perturb the null space of the
    [N, 9] system.  Keeps the refit only if it scores at least as many
    inliers as the input pose AND the system has a UNIQUE null direction:
    a (near-)coplanar inlier set leaves a multi-dimensional family of
    essential matrices that all fit the inliers — a refit drawn from it
    passes the inlier guard with a wrong pose (the planar-degeneracy
    failure of all linear F/E estimators; the minimal 5-point solver
    handles planar scenes, so RANSAC's winner is kept in that case).
    Returns (pose_01, inliers, count)."""
    w = inliers.astype(f0.dtype)
    A = jnp.einsum("mi,mj->mij", f1 * w[:, None],
                   f0 * w[:, None]).reshape(-1, 9)
    svals = jnp.linalg.svd(A, compute_uv=False)
    # rank gap: the 8th singular value must stand clear of the null space
    well_posed = svals[7] > 1e-4 * svals[0].clip(1e-12)
    E = essential_from_8pt(f0 * w[:, None], f1 * w[:, None])
    R4, t4 = decompose_essential(E)                     # [4, 3, 3]
    pose_10 = SE3(matrix_to_quat(R4), t4)
    cand_01 = pose_10.inverse()
    err, posdepth = _score_candidates(cand_01, f0, f1, thresh)
    inl = (err < thresh) & posdepth & valid[None]
    counts = jnp.sum(inl, axis=-1)
    b = jnp.argmax(counts)

    err0, pos0 = _score_candidates(
        jax.tree.map(lambda x: x[None], pose_01), f0, f1, thresh)
    inl0 = (err0 < thresh) & pos0 & valid[None]
    n0 = jnp.sum(inl0[0])

    better = (counts[b] >= n0) & well_posed
    pose = jax.tree.map(
        lambda a, c: jnp.where(better, a[b], c), cand_01, pose_01)
    inliers = jnp.where(better, inl[b], inl0[0])
    num = jnp.where(better, counts[b], n0)
    return pose, inliers, num


def essential_ransac(key, f0, f1, valid, *, focal, iters: int = 100,
                     err_px: float = 3.0, min_inliers: int = 10
                     ) -> RelativePoseResult:
    """RANSAC relative pose from bearing correspondences.

    f0: bearings in the reference (older) frame, f1: in the current frame,
    both [N, 3].  Returns T_c0_c1 with unit-norm translation (monocular
    scale is arbitrary — reference visual_frontend.cpp:547).
    """
    idx, samp_ok = sample_minimal(key, valid, 8, iters)
    E = essential_from_8pt(f0[idx], f1[idx])           # [H, 3, 3]
    R4, t4 = decompose_essential(E)                    # [H, 4, ...]
    C = iters * 4
    R = R4.reshape(C, 3, 3)
    t = t4.reshape(C, 3)
    # candidate is T_c1_c0 (X_c1 = R X_c0 + t); we need T_c0_c1 = inverse
    pose_10 = SE3(matrix_to_quat(R), t)
    pose_01 = pose_10.inverse()

    # reference uses 2x the angular threshold for the 5-pt problem
    # (multi_view_geometry.cpp:263-280); our error sums both views, so the
    # same 2x factor applies naturally.
    thresh = 2.0 * (1.0 - jnp.cos(jnp.arctan(err_px / focal)))
    err, posdepth = _score_candidates(pose_01, f0, f1, thresh)
    inl = (err < thresh) & posdepth & valid[None]
    counts = jnp.sum(inl, axis=-1)
    cand_ok = jnp.repeat(samp_ok, 4)
    counts = jnp.where(cand_ok, counts, -1)
    best = jnp.argmax(counts)

    best_pose = jax.tree.map(lambda x: x[best], pose_01)
    inliers = inl[best]
    # local optimization: LSQ refit on the winning inlier set
    best_pose, inliers, num = refine_relative_pose(
        best_pose, inliers, f0, f1, thresh, valid)
    success = num >= min_inliers
    return RelativePoseResult(best_pose, inliers, num, success)
