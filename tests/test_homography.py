"""Planar homography solver tests: DLT exactness, Faugeras decomposition
recovery, RANSAC under outliers (the ORB-SLAM-style planar bootstrap
model the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alvaar_tpu.geom.lie import SE3, so3_exp
from alvaar_tpu.solvers.homography import (decompose_homography,
                                           homography_from_4pt,
                                           homography_ransac, _to_norm)


def make_planar_pair(rng, n, outlier_frac=0.0, noise=0.0):
    """Points on the plane n·X = d seen from two cameras."""
    nrm = np.array([0.15, -0.1, 1.0])
    nrm = nrm / np.linalg.norm(nrm)
    d = 5.0
    # sample points on the plane
    xy = rng.uniform(-2.5, 2.5, (n, 2))
    X0 = np.stack([xy[:, 0], xy[:, 1],
                   (d - nrm[0] * xy[:, 0] - nrm[1] * xy[:, 1]) / nrm[2]], 1)
    axis = rng.normal(size=3); axis /= np.linalg.norm(axis)
    pose10 = SE3(so3_exp(jnp.asarray(axis * 0.12, jnp.float32)),
                 jnp.asarray([0.4, -0.1, 0.08], jnp.float32))
    X1 = np.asarray(pose10.apply(jnp.asarray(X0, jnp.float32)))
    f0 = X0 / np.linalg.norm(X0, axis=-1, keepdims=True)
    f1 = X1 / np.linalg.norm(X1, axis=-1, keepdims=True)
    if noise > 0:
        f0 = f0 + rng.normal(0, noise, f0.shape)
        f1 = f1 + rng.normal(0, noise, f1.shape)
        f0 /= np.linalg.norm(f0, axis=-1, keepdims=True)
        f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    n_out = int(outlier_frac * n)
    if n_out:
        bad = rng.normal(size=(n_out, 3))
        f1[:n_out] = np.abs(bad[:, 2:]) / np.linalg.norm(bad, axis=-1,
                                                         keepdims=True) * 0 \
            + bad / np.linalg.norm(bad, axis=-1, keepdims=True)
    return (jnp.asarray(f0, jnp.float32), jnp.asarray(f1, jnp.float32),
            pose10, nrm, d)


class TestDLT:
    def test_exact_on_minimal_sample(self, rng):
        f0, f1, pose10, nrm, d = make_planar_pair(rng, 4)
        H = homography_from_4pt(_to_norm(f0)[None], _to_norm(f1)[None])[0]
        x0, x1 = np.asarray(_to_norm(f0)), np.asarray(_to_norm(f1))
        X = np.concatenate([x0, np.ones((4, 1))], 1)
        y = (np.asarray(H) @ X.T).T
        err = np.abs(y[:, :2] / y[:, 2:] - x1).max()
        assert err < 1e-4, f"transfer err {err:.2e}"


class TestDecomposition:
    def test_recovers_pose_and_plane(self, rng):
        f0, f1, pose10, nrm, d = make_planar_pair(rng, 24)
        H = homography_from_4pt(_to_norm(f0)[None], _to_norm(f1)[None])[0]
        R8, t8, n8, ok8 = decompose_homography(H[None])
        R8, t8, n8, ok8 = (np.asarray(v[0]) for v in (R8, t8, n8, ok8))
        assert ok8.any(), "no candidate reproduced H"
        from alvaar_tpu.geom.lie import quat_to_matrix
        R_true = np.asarray(quat_to_matrix(pose10.q))
        t_true = np.asarray(pose10.t)
        t_true_u = t_true / np.linalg.norm(t_true)
        best_rot, best_t, best_n = 1e9, 1e9, 1e9
        for c in range(8):
            if not ok8[c]:
                continue
            dR = R8[c].T @ R_true
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2,
                                               -1, 1)))
            tc = t8[c] / max(np.linalg.norm(t8[c]), 1e-12)
            terr = np.degrees(np.arccos(np.clip(abs(np.dot(tc, t_true_u)),
                                                -1, 1)))
            nerr = np.degrees(np.arccos(np.clip(abs(np.dot(n8[c], nrm)),
                                                -1, 1)))
            if ang < best_rot:
                best_rot, best_t, best_n = ang, terr, nerr
        assert best_rot < 0.5, f"rotation err {best_rot:.2f} deg"
        assert best_t < 1.0, f"translation dir err {best_t:.2f} deg"
        assert best_n < 1.0, f"plane normal err {best_n:.2f} deg"


class TestRansac:
    @pytest.mark.parametrize("outlier_frac", [0.0, 0.4])
    def test_planar_recovery(self, rng, outlier_frac):
        f0, f1, pose10, nrm, d = make_planar_pair(
            rng, 60, outlier_frac=outlier_frac, noise=4e-4)
        res, score = homography_ransac(
            jax.random.PRNGKey(0), f0, f1, jnp.ones(60, bool),
            focal=500.0, iters=80)
        assert bool(res.success)
        t_est = np.asarray(res.pose.inverse().t)
        t_est = t_est / np.linalg.norm(t_est)
        t_true = np.asarray(pose10.t)
        t_true = t_true / np.linalg.norm(t_true)
        assert abs(float(np.dot(t_est, t_true))) > 0.98
        assert int(score) >= 0.8 * (1 - outlier_frac) * 60
