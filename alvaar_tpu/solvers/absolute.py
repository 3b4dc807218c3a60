"""Absolute-pose robust estimation: batched P3P + LMedS.

TPU-native replacement for the reference's ``MultiViewGeometry::p3pRansac``
(reference src/slam/src/multi_view_geometry.cpp:61-102): LMedS (the plain
RANSAC line is commented out in the reference) over Kneip P3P with the
angular reprojection metric ``1 − cos θ``, threshold
``1 − cos(atan(err_px / focal))`` (multi_view_geometry.cpp:75), followed by
an inlier refit.  Here: H minimal samples → 4H closed-form Grunert P3P
candidates → [4H, N] angular scoring in one pass → masked-median LMedS
selection.  The nonlinear inlier refit is the motion-only PnP solver
(solvers/pnp.py), mirroring how the reference follows p3p with ceresPnP.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvaar_tpu.geom.lie import SE3
from alvaar_tpu.solvers.p3p import p3p_grunert
from alvaar_tpu.solvers.ransac import (
    masked_quantile,
    sample_minimal,
    select_best_by_median,
)


class AbsolutePoseResult(NamedTuple):
    pose: SE3            # T_c_w (camera-from-world)
    inliers: jax.Array   # [N] bool
    num_inliers: jax.Array
    success: jax.Array   # bool


def angular_error(pose_cw: SE3, bearings, points_w):
    """1 − cos between observed bearings and predicted point directions.

    pose_cw may carry leading candidate dims; bearings/points are [N, 3].
    Returns [..., N].
    """
    Xc = pose_cw.apply(points_w)  # broadcast: [..., N, 3]
    Xn = Xc / jnp.linalg.norm(Xc, axis=-1, keepdims=True).clip(1e-12)
    cosang = jnp.sum(Xn * bearings, axis=-1)
    return 1.0 - cosang


def p3p_lmeds(key, bearings, points_w, valid, *, focal, iters: int = 100,
              err_px: float = 3.0, min_inliers: int = 5) -> AbsolutePoseResult:
    """LMedS-over-P3P absolute pose.

    Args:
      bearings: [N, 3] unit bearings (current frame).
      points_w: [N, 3] associated 3D map points (world).
      valid: [N] bool.
      focal: focal length (for the pixel→angular threshold map).
    """
    n = bearings.shape[0]
    idx, samp_ok = sample_minimal(key, valid, 3, iters)   # [H, 3]
    f_s = bearings[idx]          # [H, 3, 3]
    P_s = points_w[idx]          # [H, 3, 3]
    pose_c, cand_ok = p3p_grunert(f_s, P_s)               # [H, 4]
    cand_ok = cand_ok & samp_ok[:, None]

    # flatten candidates: [C=4H]
    C = iters * 4
    pose_flat = jax.tree.map(lambda x: x.reshape((C,) + x.shape[2:]), pose_c)
    cand_ok = cand_ok.reshape(C)

    errs = angular_error(
        SE3(pose_flat.q[:, None, :], pose_flat.t[:, None, :]),
        bearings[None], points_w[None])          # [C, N]
    med = masked_quantile(errs, valid[None], 0.5)  # [C]
    best, best_med = select_best_by_median(med, cand_ok)

    thresh = 1.0 - jnp.cos(jnp.arctan(err_px / focal))
    best_pose = jax.tree.map(lambda x: x[best], pose_flat)
    best_errs = errs[best]
    inliers = (best_errs < thresh) & valid
    num = jnp.sum(inliers)
    success = (num >= min_inliers) & cand_ok[best]
    return AbsolutePoseResult(best_pose, inliers, num, success)
