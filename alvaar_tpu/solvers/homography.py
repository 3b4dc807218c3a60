"""Planar homography: batched 4-point DLT, RANSAC, and decomposition.

The reference bootstraps with the 5-point essential only (OV²SLAM
lineage; multi_view_geometry.cpp:225-320) and therefore inherits its
sensitivity when the init correspondences are dominated by one plane —
the essential family fits planar inlier sets with wrong poses.  This
module supplies the ORB-SLAM-style alternative model: estimate a
calibrated homography over the same correspondences and recover
(R, t, n) by the Faugeras SVD decomposition; the bootstrap can then
pick whichever model explains the scene better.

TPU structure: hypotheses-all-at-once 4-point DLT (batched [8, 9] SVD),
one-pass symmetric-transfer scoring, and a closed-form decomposition —
every candidate case is computed branch-free and gated by its
reconstruction residual ``‖H̃ − (R + t nᵀ)‖`` (wrong-case candidates
self-filter), so no eigensolver or per-candidate control flow is
needed.

Model convention: plane points satisfy nᵀX₀ = d in camera-0; the
calibrated homography (normalized image coordinates) is
``H ∝ R + (t/d) nᵀ`` with X₁ = R X₀ + t.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alvaar_tpu.geom.lie import SE3, matrix_to_quat
from alvaar_tpu.solvers.essential import (RelativePoseResult,
                                          _score_candidates)
from alvaar_tpu.solvers.ransac import sample_minimal


def _to_norm(f):
    """Unit bearings [..., 3] → normalized image coords [..., 2]."""
    z = jnp.where(jnp.abs(f[..., 2]) < 1e-9, 1e-9, f[..., 2])
    return f[..., :2] / z[..., None]


def homography_from_4pt(x0, x1, weights=None):
    """DLT homography from ≥4 normalized-coordinate pairs.

    x0, x1: [..., M, 2] with x1 ~ H x0; optional weights [..., M] zero
    out rows (masked least squares — unlike the essential DLT, the rows
    here carry constant entries, so masking must scale the ROWS, not the
    coordinates).  Returns H [..., 3, 3] with unit Frobenius norm."""
    z = jnp.zeros_like(x0[..., 0])
    o = jnp.ones_like(z)
    r1 = jnp.stack([x0[..., 0], x0[..., 1], o, z, z, z,
                    -x1[..., 0] * x0[..., 0], -x1[..., 0] * x0[..., 1],
                    -x1[..., 0]], axis=-1)
    r2 = jnp.stack([z, z, z, x0[..., 0], x0[..., 1], o,
                    -x1[..., 1] * x0[..., 0], -x1[..., 1] * x0[..., 1],
                    -x1[..., 1]], axis=-1)
    if weights is not None:
        r1 = r1 * weights[..., None]
        r2 = r2 * weights[..., None]
    A = jnp.concatenate([r1, r2], axis=-2)                # [..., 2M, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    h = Vt[..., -1, :]
    H = h.reshape(h.shape[:-1] + (3, 3))
    return H / jnp.linalg.norm(H, axis=(-2, -1), keepdims=True).clip(1e-12)


def _transfer_err(H, x0, x1):
    """One-way transfer error |proj(H x0) − x1| in normalized coords."""
    X = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    y = jnp.einsum("...ij,...nj->...ni", H, X)
    z = jnp.where(jnp.abs(y[..., 2]) < 1e-9, 1e-9, y[..., 2])
    return jnp.linalg.norm(y[..., :2] / z[..., None] - x1, axis=-1)


def decompose_homography(H):
    """Faugeras SVD decomposition of a calibrated homography.

    H [..., 3, 3] → (R [..., 8, 3, 3], t [..., 8, 3], n [..., 8, 3],
    ok [..., 8]): all 8 candidate (rotation, translation/d, plane
    normal) triples with ``ok`` true where the candidate reproduces
    ``H̃ = R + t nᵀ`` (sign-resolved) to tolerance — the tolerance gate
    replaces case analysis and silently drops the degenerate/invalid
    branches (e.g., pure rotation, where t ≈ 0 and any n fits)."""
    U, D, Vt = jnp.linalg.svd(H)
    detUV = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = D[..., 0], D[..., 1], D[..., 2]
    d2s = jnp.where(d2 < 1e-12, 1e-12, d2)

    denom = (d1 ** 2 - d3 ** 2)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    x1v = jnp.sqrt(jnp.clip((d1 ** 2 - d2 ** 2) / denom, 0.0, None))
    x3v = jnp.sqrt(jnp.clip((d2 ** 2 - d3 ** 2) / denom, 0.0, None))

    outs_R, outs_t, outs_n = [], [], []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            a, b = e1 * x1v, e3 * x3v
            # case d' = +d2 (proper)
            s_t = (d1 - d3) * a * b / d2s
            c_t = (d1 * b ** 2 + d3 * a ** 2) / d2s
            Rp = jnp.zeros(H.shape[:-2] + (3, 3), H.dtype)
            Rp = Rp.at[..., 0, 0].set(c_t).at[..., 0, 2].set(-s_t)
            Rp = Rp.at[..., 1, 1].set(1.0)
            Rp = Rp.at[..., 2, 0].set(s_t).at[..., 2, 2].set(c_t)
            tp = jnp.stack([(d1 - d3) * a,
                            jnp.zeros_like(a),
                            -(d1 - d3) * b], axis=-1) / d2s
            npv = jnp.stack([a, jnp.zeros_like(a), b], axis=-1)
            outs_R.append(Rp)
            outs_t.append(tp)
            outs_n.append(npv)

    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            a, b = e1 * x1v, e3 * x3v
            # case d' = −d2 (reflection): R' has det −1 pre-correction
            s_p = (d1 + d3) * a * b / d2s
            c_p = (d3 * a ** 2 - d1 * b ** 2) / d2s
            Rp = jnp.zeros(H.shape[:-2] + (3, 3), H.dtype)
            Rp = Rp.at[..., 0, 0].set(c_p).at[..., 0, 2].set(s_p)
            Rp = Rp.at[..., 1, 1].set(-1.0)
            Rp = Rp.at[..., 2, 0].set(s_p).at[..., 2, 2].set(-c_p)
            tp = jnp.stack([(d1 + d3) * a,
                            jnp.zeros_like(a),
                            (d1 + d3) * b], axis=-1) / d2s
            npv = jnp.stack([a, jnp.zeros_like(a), b], axis=-1)
            outs_R.append(Rp)
            outs_t.append(tp)
            outs_n.append(npv)

    Rc = jnp.stack(outs_R, axis=-3)                       # [..., 8, 3, 3]
    tc = jnp.stack(outs_t, axis=-2)                       # [..., 8, 3]
    nc = jnp.stack(outs_n, axis=-2)

    # rotate back out of the SVD frame; fix improper U/V
    U8 = U[..., None, :, :]
    Vt8 = Vt[..., None, :, :]
    s = detUV[..., None, None, None]
    R = s * (U8 @ Rc @ Vt8)
    t = jnp.einsum("...ij,...cj->...ci", U, tc) * detUV[..., None]
    n = jnp.einsum("...ji,...cj->...ci", Vt, nc)

    # self-filter: the candidate must reproduce H̃ = ±H/d2
    Ht = H[..., None, :, :] / d2s[..., None, None, None]
    recon = R + t[..., :, None] * n[..., None, :]
    err_p = jnp.linalg.norm(recon - Ht, axis=(-2, -1))
    err_m = jnp.linalg.norm(recon + Ht, axis=(-2, -1))
    ok = jnp.minimum(err_p, err_m) < 1e-3

    # orient the normal toward camera 0 (n·e3 > 0 convention: plane in
    # front means nᵀX > 0 for X with positive depth)
    flip = (n[..., 2] < 0)
    n = jnp.where(flip[..., None], -n, n)
    t = jnp.where(flip[..., None], -t, t)
    return R, t, n, ok


def homography_ransac(key, f0, f1, valid, *, focal, iters: int = 100,
                      err_px: float = 3.0, min_inliers: int = 10
                      ) -> tuple[RelativePoseResult, jax.Array]:
    """RANSAC planar relative pose from bearing correspondences.

    Returns (RelativePoseResult with T_c0_c1, score) where score is the
    best homography's inlier count — comparable against the essential
    path's count for ORB-SLAM-style model selection."""
    x0 = _to_norm(f0)
    x1 = _to_norm(f1)
    idx, samp_ok = sample_minimal(key, valid, 4, iters)
    H = homography_from_4pt(x0[idx], x1[idx])             # [Hyp, 3, 3]

    # symmetric transfer error, pixels
    Hi = jnp.linalg.inv(H + 1e-12 * jnp.eye(3, dtype=H.dtype))
    err = (_transfer_err(H, x0[None], x1[None])
           + _transfer_err(Hi, x1[None], x0[None])) * focal * 0.5
    h_inl = (err < err_px) & valid[None]
    h_counts = jnp.sum(h_inl, axis=-1)
    h_counts = jnp.where(samp_ok, h_counts, -1)
    best_h = jnp.argmax(h_counts)

    # refit on the best inlier set (row-weighted least squares)
    H_best = homography_from_4pt(x0, x1,
                                 weights=h_inl[best_h].astype(x0.dtype))

    R8, t8, n8, ok8 = decompose_homography(H_best)        # [8, ...]
    tn = jnp.linalg.norm(t8, axis=-1)
    t8u = t8 / jnp.where(tn < 1e-9, 1.0, tn)[..., None]
    pose_10 = SE3(matrix_to_quat(R8), t8u)
    pose_01 = pose_10.inverse()

    thresh = 2.0 * (1.0 - jnp.cos(jnp.arctan(err_px / focal)))
    err_c, posdepth = _score_candidates(pose_01, f0, f1, thresh)
    inl = (err_c < thresh) & posdepth & valid[None]
    counts = jnp.where(ok8 & (tn > 1e-6), jnp.sum(inl, axis=-1), -1)
    b = jnp.argmax(counts)

    best_pose = jax.tree.map(lambda x: x[b], pose_01)
    inliers = inl[b]
    num = jnp.sum(inliers)
    success = (num >= min_inliers) & (counts[b] > 0)
    return (RelativePoseResult(best_pose, inliers, num, success),
            h_counts[best_h])
