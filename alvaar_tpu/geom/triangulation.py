"""Midpoint two-view triangulation — batched.

TPU-native equivalent of OpenGV's ``triangulation::triangulate2`` (reference
src/libs/opengv/src/triangulation/methods.cpp:66-90), the method the mapper
uses for temporal triangulation (reference src/slam/src/mapper.cpp:144-291
and multi_view_geometry.cpp:12-22).

Given two unit bearing vectors f0 (in cam0) and f1 (in cam1) and the relative
pose (R01, t01) of cam1 in cam0's frame, find the 3D point (in cam0) midway
between the two closest points of the two rays.  Fully vectorized over
leading batch dims: the reference triangulates one point per call inside a
loop; here N points are one einsum pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from alvaar_tpu.geom.lie import SE3


def triangulate_midpoint(rel_pose_01: SE3, f0, f1):
    """Midpoint triangulation.

    Args:
      rel_pose_01: pose of cam1 expressed in cam0 (T_c0_c1) — batched or not.
      f0: [..., 3] unit bearings in cam0.
      f1: [..., 3] unit bearings in cam1.

    Returns:
      points [..., 3] in cam0 frame.
    """
    t = jnp.broadcast_to(rel_pose_01.t,
                         jnp.broadcast_shapes(rel_pose_01.t.shape, f0.shape))
    f1_w = rel_pose_01.rotate(f1)  # bearing of cam1 rotated into cam0

    # Solve [f0, -f1_w] [l0, l1]^T ≈ t   (2x2 normal equations, closed form)
    b0 = jnp.sum(f0 * t, axis=-1)
    b1 = jnp.sum(f1_w * t, axis=-1)
    a00 = jnp.sum(f0 * f0, axis=-1)
    a01 = -jnp.sum(f0 * f1_w, axis=-1)
    a11 = jnp.sum(f1_w * f1_w, axis=-1)
    # A = [[a00, a01], [a01(=a10), a11]]... careful: A = J^T J with
    # J = [f0, -f1_w]: A00=f0·f0, A01=-f0·f1w, A11=f1w·f1w; rhs = J^T t
    det = a00 * a11 - a01 * a01
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    l0 = (a11 * b0 - a01 * (-b1)) / det
    l1 = (a00 * (-b1) - a01 * b0) / det
    p0 = f0 * l0[..., None]
    p1 = t + f1_w * l1[..., None]
    return 0.5 * (p0 + p1)


def triangulation_depths(rel_pose_01: SE3, f0, f1):
    """Return (point_cam0, depth0, depth1) — depths used for the positive-
    depth gate in temporal triangulation (reference mapper.cpp:216-240)."""
    x0 = triangulate_midpoint(rel_pose_01, f0, f1)
    x1 = rel_pose_01.inverse().apply(x0)
    return x0, x0[..., 2], x1[..., 2]
