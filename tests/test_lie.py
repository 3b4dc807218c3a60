"""Group-axiom property tests for SO(3)/SE(3) (Sophus test pattern,
reference src/libs/Sophus/test/core/test_{so3,se3}.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alvaar_tpu.geom import (
    SE3,
    matrix_to_quat,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    so3_exp,
    so3_log,
)

ATOL = 1e-5


def random_se3(rng, n=()):
    phi = rng.normal(size=n + (3,)) * 1.5
    t = rng.normal(size=n + (3,))
    return SE3(so3_exp(jnp.asarray(phi, jnp.float32)), jnp.asarray(t, jnp.float32))


class TestQuat:
    def test_rotate_matches_matrix(self, rng):
        q = quat_normalize(jnp.asarray(rng.normal(size=(64, 4)), jnp.float32))
        v = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        R = quat_to_matrix(q)
        np.testing.assert_allclose(
            quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=ATOL
        )

    def test_matrix_roundtrip(self, rng):
        q = quat_normalize(jnp.asarray(rng.normal(size=(128, 4)), jnp.float32))
        q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
        q2 = matrix_to_quat(quat_to_matrix(q))
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_mul_is_composition(self, rng):
        a = quat_normalize(jnp.asarray(rng.normal(size=(32, 4)), jnp.float32))
        b = quat_normalize(jnp.asarray(rng.normal(size=(32, 4)), jnp.float32))
        v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        np.testing.assert_allclose(
            quat_rotate(quat_mul(a, b), v), quat_rotate(a, quat_rotate(b, v)),
            atol=ATOL,
        )


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        phi = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
        phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True).clip(1e-6)
        scale = jnp.asarray(rng.uniform(0, 3.0, size=(256, 1)), jnp.float32)
        phi = phi * scale
        np.testing.assert_allclose(so3_log(so3_exp(phi)), phi, atol=1e-4)

    def test_small_angle(self):
        phi = jnp.asarray([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]], jnp.float32)
        q = so3_exp(phi)
        assert jnp.all(jnp.isfinite(q))
        np.testing.assert_allclose(so3_log(q), phi, atol=1e-7)

    def test_exp_is_rotation(self, rng):
        phi = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        R = quat_to_matrix(so3_exp(phi))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=ATOL)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(32), atol=ATOL)


class TestSE3:
    def test_identity(self, rng):
        T = random_se3(rng, (8,))
        I = SE3.identity((8,))
        for S in (T.compose(I), I.compose(T)):
            np.testing.assert_allclose(S.q, T.q, atol=ATOL)
            np.testing.assert_allclose(S.t, T.t, atol=ATOL)

    def test_inverse(self, rng):
        T = random_se3(rng, (8,))
        S = T.compose(T.inverse())
        np.testing.assert_allclose(jnp.abs(S.q[:, 0]), jnp.ones(8), atol=ATOL)
        np.testing.assert_allclose(S.t, jnp.zeros((8, 3)), atol=ATOL)

    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(64, 6)), jnp.float32)
        # log() returns the principal branch, so keep |phi| < pi
        phi = xi[:, 3:]
        phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True).clip(1.0) * 0.9 * np.pi
        xi = jnp.concatenate([xi[:, :3], phi], axis=-1)
        np.testing.assert_allclose(SE3.exp(xi).log(), xi, atol=1e-3, rtol=1e-3)

    def test_associativity_on_points(self, rng):
        A, B = random_se3(rng, (16,)), random_se3(rng, (16,))
        x = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        np.testing.assert_allclose(
            A.compose(B).apply(x), A.apply(B.apply(x)), atol=1e-4
        )

    def test_matrix_consistency(self, rng):
        T = random_se3(rng, (8,))
        x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        xh = jnp.concatenate([x, jnp.ones((8, 1))], axis=-1)
        np.testing.assert_allclose(
            T.apply(x), jnp.einsum("nij,nj->ni", T.matrix(), xh)[:, :3], atol=1e-4
        )
        T2 = SE3.from_matrix(T.matrix())
        np.testing.assert_allclose(T2.apply(x), T.apply(x), atol=1e-4)

    def test_retract_zero(self, rng):
        T = random_se3(rng, (4,))
        S = T.retract(jnp.zeros((4, 6)))
        np.testing.assert_allclose(S.apply(jnp.ones((4, 3))),
                                   T.apply(jnp.ones((4, 3))), atol=ATOL)

    def test_jit_grad(self, rng):
        T = random_se3(rng, ())

        def loss(xi):
            return jnp.sum(T.retract(xi).apply(jnp.ones(3)) ** 2)

        g = jax.jit(jax.grad(loss))(jnp.zeros(6))
        assert g.shape == (6,) and bool(jnp.all(jnp.isfinite(g)))
