"""SO(3)/SE(3) Lie groups on quaternions — pure-function, batched, differentiable.

TPU-native replacement for the reference's Sophus usage (reference
src/libs/Sophus/sophus/{so3,se3}.hpp: exp/log/compose/inverse).  Unlike
Sophus' scalar C++ objects, every function here broadcasts over arbitrary
leading batch dimensions and is safe under ``jit``/``vmap``/``grad`` —
small-angle branches are implemented with Taylor-series ``jnp.where``
switches (no data-dependent control flow).

Conventions:
  * quaternions are ``[..., 4]`` arrays ordered (w, x, y, z), unit norm;
  * SE(3) tangent vectors are ``[..., 6]`` ordered (rho, phi) =
    (translational, rotational), matching Sophus:
    ``exp([rho, phi]) = (R = exp(phi), t = V(phi) @ rho)``;
  * ``SE3`` is a NamedTuple pytree ``(q, t)``; ``X_w = R @ X_c + t`` when the
    pose is world-from-camera (Twc).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


# --------------------------------------------------------------------------
# Quaternions
# --------------------------------------------------------------------------

def quat_identity(batch_shape=(), dtype=jnp.float32):
    q = jnp.zeros(batch_shape + (4,), dtype)
    return q.at[..., 0].set(1.0)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_mul(a, b):
    """Hamilton product a ⊗ b, batched."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4].

    Uses the 15-mul form v + 2*cross(q_vec, cross(q_vec, v) + w*v).
    """
    qv = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv + w * v)
    return v + 2.0 * uuv


def quat_to_matrix(q):
    """Unit quaternion [..., 4] → rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """Rotation matrix [..., 3, 3] → unit quaternion [..., 4] (w>=0).

    Branch-free Shepperd's method: compute all four candidate quaternions
    and select by the largest diagonal combination (jnp.where-based, so it
    vmaps and differentiates away from the branch boundaries).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def stack4(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # candidates, each scaled by 4*component^2 trick
    qw = stack4(1 + tr, m21 - m12, m02 - m20, m10 - m01)
    qx = stack4(m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20)
    qy = stack4(m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21)
    qz = stack4(m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22)

    vals = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                      1 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(vals, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4cand, 4comp]
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# --------------------------------------------------------------------------
# SO(3)
# --------------------------------------------------------------------------

def so3_hat(w):
    """[..., 3] → skew-symmetric [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    m = jnp.stack([z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_exp(phi):
    """Axis-angle [..., 3] → unit quaternion [..., 4] (Taylor-safe).

    The small-angle switch uses *safe denominators* (``jnp.where`` on both
    sides) so gradients never see 0/0 — plain where-switches still propagate
    NaN from the untaken branch under autodiff.
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = 0.5 * theta
    # sin(t/2)/t: Taylor 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * phi], axis=-1)


def so3_log(q):
    """Unit quaternion [..., 4] → axis-angle [..., 3] (Taylor-safe)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # enforce w>=0 → theta in [0, pi]
    w = q[..., :1].clip(-1.0, 1.0)
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = vn2 < 1e-8
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))
    theta = 2.0 * jnp.arctan2(vn, w)
    # small angle: phi = 2 v / w * (1 - vn2/(3 w^2))
    k = jnp.where(small, 2.0 / w.clip(_EPS) * (1.0 - vn2 / (3.0 * (w * w).clip(_EPS))),
                  theta / vn)
    return k * v


def _so3_left_jacobian(phi):
    """V(phi) [..., 3, 3] such that exp_se3([rho,phi]).t = V @ rho."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = so3_hat(phi)
    KK = K @ K
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / theta2_safe)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2_safe * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * KK


def _so3_left_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = so3_hat(phi)
    KK = K @ K
    half = 0.5 * theta
    # c = (1 - theta/2 * cot(theta/2)) / theta^2 ; Taylor 1/12 + t^2/720
    sin_half = jnp.sin(half)
    sin_half = jnp.where(jnp.abs(sin_half) < _EPS, _EPS, sin_half)
    cot = jnp.cos(half) / sin_half
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 - half * cot) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + c * KK


# --------------------------------------------------------------------------
# SE(3)
# --------------------------------------------------------------------------

class SE3(NamedTuple):
    """Rigid transform as (unit quaternion, translation) — a JAX pytree.

    ``apply``: x ↦ R x + t.  Batched over leading dims of both fields.
    """

    q: jax.Array  # [..., 4] (w, x, y, z)
    t: jax.Array  # [..., 3]

    # -- constructors ------------------------------------------------------
    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        return SE3(quat_identity(batch_shape, dtype),
                   jnp.zeros(batch_shape + (3,), dtype))

    @staticmethod
    def from_matrix(T) -> "SE3":
        return SE3(matrix_to_quat(T[..., :3, :3]), T[..., :3, 3])

    @staticmethod
    def exp(xi) -> "SE3":
        """Tangent [..., 6] (rho, phi) → SE3."""
        rho, phi = xi[..., :3], xi[..., 3:]
        q = so3_exp(phi)
        V = _so3_left_jacobian(phi)
        t = jnp.einsum("...ij,...j->...i", V, rho)
        return SE3(q, t)

    # -- group ops ---------------------------------------------------------
    def log(self):
        phi = so3_log(self.q)
        Vinv = _so3_left_jacobian_inv(phi)
        rho = jnp.einsum("...ij,...j->...i", Vinv, self.t)
        return jnp.concatenate([rho, phi], axis=-1)

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other (apply other first)."""
        return SE3(quat_normalize(quat_mul(self.q, other.q)),
                   quat_rotate(self.q, other.t) + self.t)

    def inverse(self) -> "SE3":
        qi = quat_conj(self.q)
        return SE3(qi, -quat_rotate(qi, self.t))

    def apply(self, x):
        """Transform points x [..., 3]."""
        return quat_rotate(self.q, x) + self.t

    def rotate(self, x):
        return quat_rotate(self.q, x)

    def matrix(self):
        """[..., 4, 4] homogeneous matrix."""
        R = quat_to_matrix(self.q)
        batch = self.q.shape[:-1]
        T = jnp.zeros(batch + (4, 4), self.q.dtype)
        T = T.at[..., :3, :3].set(R)
        T = T.at[..., :3, 3].set(self.t)
        return T.at[..., 3, 3].set(1.0)

    def retract(self, xi) -> "SE3":
        """Left-multiplicative update ``Exp(xi) ∘ self`` — the BA/PnP
        parameter-update rule (reference ceres_parametrization.hpp:220-255
        uses the same left convention)."""
        return SE3.exp(xi).compose(self)

    def normalize(self) -> "SE3":
        return SE3(quat_normalize(self.q), self.t)
