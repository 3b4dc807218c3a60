"""Horizontal-plane detection by batched 3-point RANSAC over map points.

TPU-native equivalent of the reference's ``System::processPlane``
(reference src/slam/src/system.cpp:177-342):

  * sample 3 points per iteration → plane by cross product (the reference
    fits by SVD of [X|1]; for 3 points the cross product is the same
    plane, closed form),
  * horizontality gate: normal within ``max_tilt_deg`` of the +z axis
    (system.cpp:228-235; 5° default),
  * score = 20th-percentile |point-plane distance| (system.cpp:244-252),
  * inliers = distance < 1.4 × best score, require ≥ min_points
    (system.cpp:256-269),
  * refit on inliers: centroid + smallest-eigenvector normal (the
    reference's SVD refit, system.cpp:280-301 — here an eigh of the 3x3
    scatter, which TPU supports natively),
  * normal oriented toward the camera (system.cpp:304-317),
  * pose assembly: rotation taking +z ("up") to the plane normal, origin
    at the inlier centroid (system.cpp:323-339 via Rodrigues).

All iterations run at once: [H, N] distance matrix, masked quantile, argmin.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvaar_tpu.geom.lie import SE3, matrix_to_quat, so3_exp
from alvaar_tpu.solvers.ransac import masked_quantile, sample_minimal


class PlaneResult(NamedTuple):
    pose: SE3           # plane-to-world: rotation aligning +z to normal, t = centroid
    normal: jax.Array   # [3]
    success: jax.Array


def _rotation_from_up_to(n):
    """Rotation taking +z to unit normal n (Rodrigues of up x n,
    reference system.cpp:323-339)."""
    up = jnp.asarray([0.0, 0.0, 1.0], n.dtype)
    axis = jnp.cross(up, n)
    s = jnp.linalg.norm(axis)
    c = jnp.dot(up, n)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.where(s < 1e-9, 1.0, s)
    phi = jnp.where(s < 1e-9, jnp.zeros(3, n.dtype), axis * angle)
    return so3_exp(phi)


def find_plane_ransac(key, points_w, valid, cam_center_w, *, iters: int = 250,
                      min_points: int = 32, max_tilt_deg: float = 5.0,
                      inlier_scale: float = 1.4) -> PlaneResult:
    """Detect a dominant horizontal plane among 3D map points.

    Args:
      points_w: [N, 3] world points (the currently observed 3D map points,
        reference map_manager.cpp:340 getCurrentFrameMapPoints).
      valid: [N] bool.
      cam_center_w: [3] current camera center (to orient the normal).
    """
    n_pts = jnp.sum(valid)
    idx, samp_ok = sample_minimal(key, valid, 3, iters)   # [H, 3]
    p = points_w[idx]                                     # [H, 3, 3]
    v1 = p[:, 1] - p[:, 0]
    v2 = p[:, 2] - p[:, 0]
    normal = jnp.cross(v1, v2)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    degenerate = nn[:, 0] < 1e-9
    normal = normal / jnp.where(nn < 1e-9, 1.0, nn)
    # orient all hypotheses +z for the tilt gate
    normal = normal * jnp.sign(normal[:, 2:3] + 1e-12)

    cos_max = jnp.cos(jnp.deg2rad(max_tilt_deg))
    horizontal = normal[:, 2] >= cos_max

    d = -jnp.sum(normal * p[:, 0], axis=-1)               # plane offset
    dist = jnp.abs(points_w @ normal.T + d[None, :]).T    # [H, N]
    score = masked_quantile(dist, valid[None], 0.2)       # 20th percentile

    cand_ok = samp_ok & horizontal & ~degenerate
    score = jnp.where(cand_ok, score, jnp.inf)
    best = jnp.argmin(score)
    best_score = score[best]

    inliers = (dist[best] < inlier_scale * best_score) & valid
    num_inl = jnp.sum(inliers)

    # SVD refit on inliers (masked): centroid + smallest eigenvector
    w = inliers.astype(points_w.dtype)[:, None]
    centroid = jnp.sum(points_w * w, axis=0) / jnp.sum(w).clip(1.0)
    centered = (points_w - centroid) * w
    cov = centered.T @ centered
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    n_refit = eigvecs[:, 0]                               # smallest eigenvalue

    # orient normal toward the camera (reference system.cpp:304-317)
    to_cam = cam_center_w - centroid
    n_refit = n_refit * jnp.sign(jnp.dot(n_refit, to_cam) + 1e-12)

    q = _rotation_from_up_to(n_refit)
    pose = SE3(q, centroid)
    success = (n_pts >= min_points) & (num_inl >= min_points) & cand_ok[best]
    return PlaneResult(pose=pose, normal=n_refit, success=success)
