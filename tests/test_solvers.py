"""Synthetic-scene tests for the minimal solvers and robust estimators
(OpenGV test pattern, reference src/libs/opengv/test/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alvaar_tpu.geom import SE3, Camera
from alvaar_tpu.solvers.absolute import p3p_lmeds
from alvaar_tpu.solvers.essential import essential_ransac
from alvaar_tpu.solvers.p3p import p3p_grunert
from alvaar_tpu.solvers.plane import find_plane_ransac
from alvaar_tpu.solvers.pnp import pnp_refine
from alvaar_tpu.solvers.quartic import solve_quartic_real
from tests.synthetic_scene import (
    add_outliers,
    observe,
    pose_error,
    random_pose,
    scene_points,
)

CAM = Camera.create(500.0, 500.0, 320.0, 240.0)


class TestQuartic:
    def test_known_roots(self):
        # (x-1)(x-2)(x+3)(x-0.5) expanded
        r = np.array([1.0, 2.0, -3.0, 0.5])
        c = np.poly(r)
        roots, valid = solve_quartic_real(*[jnp.asarray(x, jnp.float32) for x in c])
        got = np.sort(np.asarray(roots)[np.asarray(valid)])
        np.testing.assert_allclose(got, np.sort(r), atol=1e-3)

    def test_two_real_roots(self):
        # (x^2+1)(x-1)(x+2) → roots 1, -2
        c = np.poly([1j, -1j, 1.0, -2.0]).real
        roots, valid = solve_quartic_real(*[jnp.asarray(x, jnp.float32) for x in c])
        got = np.sort(np.asarray(roots)[np.asarray(valid)])
        np.testing.assert_allclose(got, [-2.0, 1.0], atol=1e-3)

    def test_biquadratic(self):
        # x^4 - 5x^2 + 4 → ±1, ±2
        roots, valid = solve_quartic_real(
            *[jnp.asarray(x, jnp.float32) for x in [1, 0, -5, 0, 4]])
        got = np.sort(np.asarray(roots)[np.asarray(valid)])
        np.testing.assert_allclose(got, [-2, -1, 1, 2], atol=1e-3)

    def test_batched(self, rng):
        roots_np = rng.uniform(-3, 3, size=(32, 4))
        coeffs = np.stack([np.poly(r) for r in roots_np])
        roots, valid = solve_quartic_real(
            *[jnp.asarray(coeffs[:, i], jnp.float32) for i in range(5)])
        assert bool(jnp.all(valid))
        got = np.sort(np.asarray(roots), axis=1)
        np.testing.assert_allclose(got, np.sort(roots_np, axis=1), atol=5e-2)


class TestP3P:
    def test_exact_recovery(self, rng):
        for trial in range(5):
            pose = random_pose(rng)
            P = scene_points(rng, 3)
            _, f, _ = observe(pose, CAM, P)
            cands, valid = p3p_grunert(f, P)
            best = None
            for i in range(4):
                if not bool(valid[i]):
                    continue
                cand = jax.tree.map(lambda x: x[i], cands)
                ang, dt = pose_error(cand, pose)
                if best is None or ang + dt < best:
                    best = ang + dt
            assert best is not None and best < 0.05, f"trial {trial}: {best}"

    def test_batched_hypotheses(self, rng):
        pose = random_pose(rng)
        P = scene_points(rng, 64)
        _, f, _ = observe(pose, CAM, P)
        idx = jnp.asarray(rng.choice(64, size=(16, 3), replace=True))
        cands, valid = p3p_grunert(f[idx], P[idx])
        assert cands.q.shape == (16, 4, 4) and valid.shape == (16, 4)
        assert int(valid.sum()) > 16  # most samples give solutions


class TestAbsolutePose:
    def test_p3p_lmeds_with_outliers(self, rng):
        pose = random_pose(rng)
        P = scene_points(rng, 128)
        px, f, _ = observe(pose, CAM, P, noise_px=0.3, rng=rng)
        px_o, is_out = add_outliers(rng, px, 0.3)
        f_o = CAM.bearing(px_o)
        res = p3p_lmeds(jax.random.PRNGKey(0), f_o, P, jnp.ones(128, bool),
                        focal=500.0, iters=100)
        assert bool(res.success)
        ang, dt = pose_error(res.pose, pose)
        assert ang < 1.0 and dt < 0.1
        # inliers mostly exclude the planted outliers
        inl = np.asarray(res.inliers)
        assert (inl & is_out).sum() <= 2
        assert inl.sum() > 60

    def test_insufficient_points(self, rng):
        P = scene_points(rng, 16)
        f = jnp.zeros((16, 3)).at[:, 2].set(1.0)
        valid = jnp.zeros(16, bool).at[:2].set(True)  # only 2 valid
        res = p3p_lmeds(jax.random.PRNGKey(0), f, P, valid, focal=500.0)
        assert not bool(res.success)


class TestPnP:
    def test_refines_noisy_pose(self, rng):
        pose = random_pose(rng)
        P = scene_points(rng, 96)
        px, _, _ = observe(pose, CAM, P, noise_px=0.2, rng=rng)
        pose0 = pose.retract(jnp.asarray(rng.normal(size=6) * 0.03, jnp.float32))
        res = pnp_refine(pose0, CAM, P, px, jnp.ones(96, bool), iters=5)
        ang, dt = pose_error(res.pose, pose)
        assert ang < 0.2 and dt < 0.02
        assert int(res.num_inliers) > 90

    def test_outlier_pruning(self, rng):
        pose = random_pose(rng)
        P = scene_points(rng, 96)
        px, _, _ = observe(pose, CAM, P, noise_px=0.2, rng=rng)
        px_o, is_out = add_outliers(rng, px, 0.25)
        pose0 = pose.retract(jnp.asarray(rng.normal(size=6) * 0.02, jnp.float32))
        res = pnp_refine(pose0, CAM, P, px_o, jnp.ones(96, bool), iters=5)
        ang, dt = pose_error(res.pose, pose)
        assert ang < 0.5 and dt < 0.05
        assert (np.asarray(res.inliers) & is_out).sum() <= 1

    def test_respects_valid_mask(self, rng):
        pose = random_pose(rng)
        P = scene_points(rng, 64)
        px, _, _ = observe(pose, CAM, P)
        # poison the masked-out half; result must be unaffected
        px = px.at[32:].add(500.0)
        valid = jnp.arange(64) < 32
        res = pnp_refine(pose.retract(jnp.full(6, 0.01)), CAM, P, px, valid)
        ang, dt = pose_error(res.pose, pose)
        assert ang < 0.1 and dt < 0.01
        assert not bool(jnp.any(res.inliers & ~valid))


class TestEssential:
    def test_bootstrap_recovery(self, rng):
        pose1 = random_pose(rng, rot_scale=0.1, t_scale=0.0)
        pose1 = SE3(pose1.q, jnp.asarray([0.5, 0.1, 0.05]))  # T_c0_c1... see below
        # cam0 at identity; cam1 at pose1 (world = cam0 frame)
        P = scene_points(rng, 160)
        _, f0, _ = observe(SE3.identity(), CAM, P)
        _, f1, _ = observe(pose1.inverse(), CAM, P, noise_px=0.3, rng=rng)
        res = essential_ransac(jax.random.PRNGKey(1), f0, f1,
                               jnp.ones(160, bool), focal=500.0, iters=100)
        assert bool(res.success)
        # translation direction matches up to scale
        t_est = np.asarray(res.pose.t)
        t_gt = np.asarray(pose1.t) / np.linalg.norm(np.asarray(pose1.t))
        assert abs(abs(t_est @ t_gt) - 1.0) < 0.02
        ang, _ = pose_error(SE3(res.pose.q, jnp.zeros(3)),
                            SE3(pose1.q, jnp.zeros(3)))
        assert ang < 1.0
        assert int(res.num_inliers) > 120

    def test_with_outliers(self, rng):
        t_gt = jnp.asarray([0.4, 0.0, 0.1])
        pose1 = SE3(SE3.identity().q, t_gt)
        P = scene_points(rng, 160)
        px0, f0, _ = observe(SE3.identity(), CAM, P)
        px1, f1, _ = observe(pose1.inverse(), CAM, P, noise_px=0.3, rng=rng)
        px1o, is_out = add_outliers(rng, px1, 0.2)
        f1o = CAM.bearing(px1o)
        res = essential_ransac(jax.random.PRNGKey(2), f0, f1o,
                               jnp.ones(160, bool), focal=500.0, iters=200)
        assert bool(res.success)
        t_est = np.asarray(res.pose.t)
        t_dir = np.asarray(t_gt / jnp.linalg.norm(t_gt))
        assert abs(abs(t_est @ t_dir) - 1.0) < 0.05
        assert (np.asarray(res.inliers) & is_out).sum() <= 3


class TestPlane:
    def test_finds_horizontal_plane(self, rng):
        # horizontal plane at z=2 with vertical clutter
        n_plane, n_noise = 96, 32
        plane_pts = np.concatenate([
            rng.uniform(-3, 3, size=(n_plane, 2)),
            2.0 + rng.normal(size=(n_plane, 1)) * 0.01], axis=1)
        noise_pts = rng.uniform([-3, -3, 0], [3, 3, 6], size=(n_noise, 3))
        pts = jnp.asarray(np.concatenate([plane_pts, noise_pts]), jnp.float32)
        cam_c = jnp.asarray([0.0, 0.0, 5.0])
        res = find_plane_ransac(jax.random.PRNGKey(0), pts,
                                jnp.ones(128, bool), cam_c, iters=250)
        assert bool(res.success)
        n = np.asarray(res.normal)
        assert abs(abs(n[2]) - 1.0) < 0.01       # horizontal
        assert abs(float(res.pose.t[2]) - 2.0) < 0.05  # at z=2
        assert n[2] > 0                          # toward camera (above)

    def test_rejects_tilted_plane(self, rng):
        # plane tilted 30 degrees — outside the 5-degree gate
        n = 96
        xy = rng.uniform(-3, 3, size=(n, 2))
        z = 2.0 + xy[:, 0] * np.tan(np.deg2rad(30))
        pts = jnp.asarray(np.stack([xy[:, 0], xy[:, 1], z], axis=1), jnp.float32)
        res = find_plane_ransac(jax.random.PRNGKey(0), pts,
                                jnp.ones(n, bool), jnp.asarray([0.0, 0, 5.0]),
                                iters=250)
        assert not bool(res.success)

    def test_too_few_points(self, rng):
        pts = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        valid = jnp.arange(64) < 10
        res = find_plane_ransac(jax.random.PRNGKey(0), pts, valid,
                                jnp.zeros(3), iters=50)
        assert not bool(res.success)
