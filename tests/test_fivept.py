"""Nister five-point solver tests (reference OpenGV fivept_nister via
multi_view_geometry.cpp:263-280) — exactness on minimal noise-free
samples, RANSAC recovery at bootstrap outlier rates, and superiority over
the 8-point path at high outlier fractions (the OpenGV test pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alvaar_tpu.geom.lie import SE3
from alvaar_tpu.solvers.essential import essential_ransac
from alvaar_tpu.solvers.fivept import (essential_from_5pt,
                                       essential_ransac_5pt)


def make_pair(rng, n, outlier_frac=0.0, noise=0.0):
    """Two views of random points; returns bearings + relative pose
    T_c1_c0 ground truth (X_c1 = R X_c0 + t)."""
    X0 = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
    axis = rng.normal(size=3)
    axis = axis / np.linalg.norm(axis)
    ang = 0.15
    phi = jnp.asarray(axis * ang, jnp.float32)
    t = jnp.asarray([0.5, 0.1, -0.05], jnp.float32)
    from alvaar_tpu.geom.lie import so3_exp
    pose10 = SE3(so3_exp(phi), t)
    X1 = np.asarray(pose10.apply(jnp.asarray(X0)))
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
        f1[:n_out] = bad / np.linalg.norm(bad, axis=-1, keepdims=True)
    return (jnp.asarray(f0, jnp.float32), jnp.asarray(f1, jnp.float32),
            pose10)


def epipolar_residual(E, f0, f1):
    return np.abs(np.einsum("ni,ij,nj->n", np.asarray(f1), np.asarray(E),
                            np.asarray(f0)))


class TestMinimalSolver:
    def test_exact_on_noise_free_sample(self, rng):
        f0, f1, _ = make_pair(rng, 5)
        E, mask = essential_from_5pt(f0[None], f1[None])
        E, mask = np.asarray(E[0]), np.asarray(mask[0])
        assert mask.any(), "no real roots found"
        # at least one candidate satisfies all five epipolar constraints
        errs = [epipolar_residual(E[i], f0, f1).max()
                for i in range(len(mask)) if mask[i]]
        assert min(errs) < 1e-4, f"best residual {min(errs):.2e}"

    def test_recovers_true_essential(self, rng):
        f0, f1, pose10 = make_pair(rng, 5)
        R = np.asarray(__import__("alvaar_tpu.geom.lie", fromlist=["quat_to_matrix"]
                                  ).quat_to_matrix(pose10.q))
        t = np.asarray(pose10.t)
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]])
        E_true = tx @ R
        E_true /= np.linalg.norm(E_true)
        E, mask = essential_from_5pt(f0[None], f1[None])
        E, mask = np.asarray(E[0]), np.asarray(mask[0])
        best = min(
            min(np.abs(E[i] - E_true).max(), np.abs(E[i] + E_true).max())
            for i in range(len(mask)) if mask[i])
        assert best < 1e-3, f"E distance {best:.2e}"


class TestRansac5pt:
    @pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.5])
    def test_recovery_under_outliers(self, rng, outlier_frac):
        f0, f1, pose10 = make_pair(rng, 60, outlier_frac=outlier_frac,
                                   noise=5e-4)
        res = essential_ransac_5pt(
            jax.random.PRNGKey(0), f0, f1, jnp.ones(60, bool),
            focal=500.0, iters=100)
        assert bool(res.success)
        # returned pose is T_c0_c1; compare translation direction
        t_est = np.asarray(res.pose.inverse().t)
        t_est = t_est / np.linalg.norm(t_est)
        t_true = np.asarray(pose10.t)
        t_true = t_true / np.linalg.norm(t_true)
        assert abs(float(np.dot(t_est, t_true))) > 0.98
        n_inl_true = int((1 - outlier_frac) * 60)
        assert int(res.num_inliers) >= 0.8 * n_inl_true

    def test_beats_8pt_at_high_outliers(self, rng):
        """With a small iteration budget at 50% outliers, 5-point samples
        succeed far more often than 8-point ones (the motivation for
        Nister at bootstrap, VERDICT missing item 5)."""
        wins5 = wins8 = 0
        for seed in range(6):
            r = np.random.default_rng(100 + seed)
            f0, f1, pose10 = make_pair(r, 60, outlier_frac=0.5, noise=5e-4)
            key = jax.random.PRNGKey(seed)
            r5 = essential_ransac_5pt(key, f0, f1, jnp.ones(60, bool),
                                      focal=500.0, iters=40)
            r8 = essential_ransac(key, f0, f1, jnp.ones(60, bool),
                                  focal=500.0, iters=40)
            t_true = np.asarray(pose10.t)
            t_true = t_true / np.linalg.norm(t_true)

            def good(res):
                if not bool(res.success):
                    return False
                t = np.asarray(res.pose.inverse().t)
                t = t / max(np.linalg.norm(t), 1e-12)
                return abs(float(np.dot(t, t_true))) > 0.98

            wins5 += good(r5)
            wins8 += good(r8)
        # 40 iters at 50% outliers: P(≥1 clean sample) ≈ 0.72 for 5-pt
        # vs ≈ 0.14 for 8-pt — the per-iteration tolerance gap that
        # motivates Nister at bootstrap
        assert wins5 >= wins8, f"5pt {wins5}/6 vs 8pt {wins8}/6"
        assert wins5 >= 3, f"5pt recovered only {wins5}/6"
