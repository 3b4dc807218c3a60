"""Batched P3P: absolute pose from 3 bearing-point correspondences.

TPU-native replacement for OpenGV's ``absolute_pose::p3p_kneip``
(reference src/libs/opengv/src/absolute_pose/methods.cpp:133), used by the
visual frontend's recovery path (reference src/slam/src/
multi_view_geometry.cpp:61-79 p3pRansac over KNEIP).

Clean-room formulation: Grunert's distance-based P3P (the classical
law-of-cosines system; see Haralick et al.'s review).  The quartic
coefficients and the linear back-substitution below were machine-derived
with sympy from

    F1 = b²(u² + v² − 2uv·cosα) − a²(1 + v² − 2v·cosβ) = 0
    F2 = c²(u² + v² − 2uv·cosα) − a²(1 + u² − 2u·cosγ) = 0

(u = s2/s1, v = s3/s1, a=|P2P3|, b=|P1P3|, c=|P1P2|, cosα = f2·f3,
cosβ = f1·f3, cosγ = f1·f2) by resultant elimination of u; the common a⁴
factor is dropped.  Each real root yields ray depths, camera-frame points,
and a rigid alignment (Kabsch) to the world points.

Everything is batched over hypotheses: ``vmap(p3p)`` gives the
hypothesize-all-at-once RANSAC kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from alvaar_tpu.geom.lie import SE3, matrix_to_quat
from alvaar_tpu.solvers.quartic import solve_quartic_real

_EPS = 1e-10


def _kabsch(P, X, w=None):
    """Rigid alignment X ≈ R @ P + t over the last-but-one axis.

    P, X: [..., N, 3].  Returns (R [..., 3, 3], t [..., 3]).
    """
    if w is None:
        Pc = P.mean(axis=-2, keepdims=True)
        Xc = X.mean(axis=-2, keepdims=True)
    else:
        wn = w[..., None] / w.sum(axis=-1, keepdims=True)[..., None].clip(_EPS)
        Pc = (P * wn).sum(axis=-2, keepdims=True)
        Xc = (X * wn).sum(axis=-2, keepdims=True)
    Pd = P - Pc
    Xd = X - Xc
    if w is not None:
        Pd = Pd * w[..., None]
    C = jnp.einsum("...ni,...nj->...ij", Xd, Pd)  # [..., 3, 3]
    U, _, Vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.zeros_like(C).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(det)
    R = U @ D @ Vt
    t = Xc[..., 0, :] - jnp.einsum("...ij,...j->...i", R, Pc[..., 0, :])
    return R, t


def p3p_grunert(f, P):
    """Solve P3P for one (or a batch of) minimal sample(s).

    Args:
      f: [..., 3, 3] unit bearing vectors (camera frame), rows f1,f2,f3.
      P: [..., 3, 3] world points, rows P1,P2,P3.

    Returns:
      pose: SE3 with batch shape [..., 4] — up to 4 camera-from-world
        (T_c_w) candidates: X_cam = R @ X_world + t.
      valid: [..., 4] bool.
    """
    P1, P2, P3 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
    f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]

    a2 = jnp.sum((P2 - P3) ** 2, axis=-1)
    b2 = jnp.sum((P1 - P3) ** 2, axis=-1)
    c2 = jnp.sum((P1 - P2) ** 2, axis=-1)
    ca = jnp.sum(f2 * f3, axis=-1)
    cb = jnp.sum(f1 * f3, axis=-1)
    cg = jnp.sum(f1 * f2, axis=-1)

    ca2, cb2, cg2 = ca * ca, cb * cb, cg * cg

    # sympy-derived quartic in v = s3/s1 (common a2**2 factor dropped)
    A4 = (a2 ** 2 - 2 * a2 * b2 - 2 * a2 * c2 + b2 ** 2
          - 4 * b2 * c2 * ca2 + 2 * b2 * c2 + c2 ** 2)
    A3 = -4.0 * (a2 ** 2 * cb - a2 * b2 * ca * cg - a2 * b2 * cb
                 - 2 * a2 * c2 * cb + b2 ** 2 * ca * cg
                 - 2 * b2 * c2 * ca2 * cb - b2 * c2 * ca * cg
                 + b2 * c2 * cb + c2 ** 2 * cb)
    A2 = 2.0 * (2 * a2 ** 2 * cb2 + a2 ** 2 - 4 * a2 * b2 * ca * cb * cg
                - 2 * a2 * b2 * cg2 - 4 * a2 * c2 * cb2 - 2 * a2 * c2
                + 2 * b2 ** 2 * ca2 + 2 * b2 ** 2 * cg2 - b2 ** 2
                - 2 * b2 * c2 * ca2 - 4 * b2 * c2 * ca * cb * cg
                + 2 * c2 ** 2 * cb2 + c2 ** 2)
    A1 = -4.0 * (a2 ** 2 * cb - a2 * b2 * ca * cg - 2 * a2 * b2 * cb * cg2
                 + a2 * b2 * cb - 2 * a2 * c2 * cb + b2 ** 2 * ca * cg
                 - b2 * c2 * ca * cg - b2 * c2 * cb + c2 ** 2 * cb)
    A0 = (a2 ** 2 - 4 * a2 * b2 * cg2 + 2 * a2 * b2 - 2 * a2 * c2
          + b2 ** 2 - 2 * b2 * c2 + c2 ** 2)

    v, v_ok = solve_quartic_real(A4, A3, A2, A1, A0)  # [..., 4]

    # back-substitution (sympy-derived, linear in u):
    #   2 b2 (ca v − cg) u + (−2 a2 cb v + a2 v² + a2 − b2 v² + b2
    #                          + 2 c2 cb v − c2 v² − c2) = 0
    a2e, b2e, c2e = a2[..., None], b2[..., None], c2[..., None]
    cae, cbe, cge = ca[..., None], cb[..., None], cg[..., None]
    lin_a = 2.0 * b2e * (cae * v - cge)
    lin_b = (-2.0 * a2e * cbe * v + a2e * v ** 2 + a2e - b2e * v ** 2 + b2e
             + 2.0 * c2e * cbe * v - c2e * v ** 2 - c2e)
    lin_ok = jnp.abs(lin_a) > _EPS
    u = -lin_b / jnp.where(lin_ok, lin_a, 1.0)

    den = 1.0 + v ** 2 - 2.0 * v * cbe
    den_ok = den > _EPS
    s1 = jnp.sqrt(b2e / jnp.where(den_ok, den, 1.0))
    s2 = u * s1
    s3 = v * s1
    depth_ok = (s1 > 0) & (s2 > 0) & (s3 > 0)

    # camera-frame points per candidate: [..., 4, 3, 3]
    Xc = jnp.stack(
        [s1[..., None] * f1[..., None, :],
         s2[..., None] * f2[..., None, :],
         s3[..., None] * f3[..., None, :]], axis=-2)
    Pw = jnp.broadcast_to(P[..., None, :, :], Xc.shape)

    R, t = _kabsch(Pw, Xc)
    valid = v_ok & lin_ok & den_ok & depth_ok
    return SE3(matrix_to_quat(R), t), valid
