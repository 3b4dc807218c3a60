"""Local BA tests: synthetic window with ground truth (Ceres BA-test
pattern, reference src/libs/ceres-solver bundle_adjustment_test_util.h)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvaar_tpu.geom import SE3, Camera, so3_exp
from alvaar_tpu.solvers.ba import BAProblem, BAResult, local_ba
from tests.synthetic_scene import pose_error

CAM = Camera.create(500.0, 500.0, 320.0, 240.0)
W, L, K = 8, 128, 96


def build_problem(rng, pose_noise=0.02, depth_noise=0.05, px_noise=0.3,
                  outlier_frac=0.0):
    """Synthetic forward-moving window; returns (problem, gt_poses, gt_invd)."""
    # ground-truth camera ring: forward motion with slight rotation
    qs, ts = [], []
    for k in range(W):
        phi = np.array([0.01, 0.02, 0.005]) * k
        c = np.array([0.15 * k, 0.01 * k, 0.0])  # camera center in world
        q = so3_exp(jnp.asarray(phi, jnp.float32))
        # T_cw: X_c = R (X_w - c)
        R_t = SE3(q, jnp.zeros(3))
        t = -R_t.rotate(jnp.asarray(c, jnp.float32))
        qs.append(q)
        ts.append(t)
    gt_poses = SE3(jnp.stack(qs), jnp.stack(ts))

    pts_w = jnp.asarray(
        np.stack([rng.uniform(-3, 4, L), rng.uniform(-2, 2, L),
                  rng.uniform(4, 9, L)], axis=1), jnp.float32)

    # anchors: first half anchored at kf0, rest spread over the window
    anchor_kf = jnp.asarray(rng.integers(0, W // 2, size=L), jnp.int32)
    T_a = jax.tree.map(lambda x: x[anchor_kf], gt_poses)
    X_a = T_a.apply(pts_w)
    gt_invd = 1.0 / X_a[:, 2]
    anchor_mxy = X_a[:, :2] / X_a[:, 2:3]

    # observations: every keyframe observes the first K landmarks
    obs_lm = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (W, K))
    Xc = jax.vmap(lambda q, t: SE3(q, t).apply(pts_w[:K]))(gt_poses.q, gt_poses.t)
    px = jax.vmap(lambda xc: CAM.project(xc))(Xc)
    px = px + jnp.asarray(rng.normal(size=px.shape) * px_noise, jnp.float32)
    obs_valid = (Xc[..., 2] > 0.1)
    if outlier_frac > 0:
        m = rng.random((W, K)) < outlier_frac
        px = jnp.where(jnp.asarray(m)[..., None],
                       px + jnp.asarray(rng.uniform(20, 80, px.shape) *
                                        rng.choice([-1, 1], px.shape), jnp.float32),
                       px)

    # perturb non-constant poses + all depths
    constant = jnp.zeros(W, bool).at[0].set(True).at[1].set(True)
    noise = jnp.asarray(rng.normal(size=(W, 6)) * pose_noise, jnp.float32)
    noise = jnp.where(constant[:, None], 0.0, noise)
    init_poses = SE3.exp(noise).compose(gt_poses)
    init_invd = gt_invd * jnp.asarray(
        1.0 + rng.normal(size=L) * depth_noise, jnp.float32)

    prob = BAProblem(
        poses=init_poses, kf_valid=jnp.ones(W, bool), constant=constant,
        anchor_kf=anchor_kf, anchor_mxy=anchor_mxy, invdepth=init_invd,
        lm_valid=jnp.ones(L, bool), obs_lm=obs_lm, obs_px=px,
        obs_valid=obs_valid)
    return prob, gt_poses, gt_invd


def max_pose_err(poses: SE3, gt: SE3, skip=2):
    errs = []
    for k in range(skip, W):
        a = jax.tree.map(lambda x: x[k], poses)
        b = jax.tree.map(lambda x: x[k], gt)
        ang, dt = pose_error(a, b)
        errs.append((ang, dt))
    return max(e[0] for e in errs), max(e[1] for e in errs)


class TestLocalBA:
    def test_converges_to_ground_truth(self, rng):
        prob, gt_poses, gt_invd = build_problem(rng)
        res = local_ba(prob, CAM, iters=6, refine_iters=2)
        ang0, dt0 = max_pose_err(prob.poses, gt_poses)
        ang, dt = max_pose_err(res.poses, gt_poses)
        assert ang < 0.1 and dt < 0.01, (ang0, dt0, ang, dt)
        # depths recovered (only landmarks that are observed: first K)
        rel = np.abs(np.asarray(res.invdepth[:K] / gt_invd[:K]) - 1.0)
        assert np.median(rel) < 0.01

    def test_outlier_pruning(self, rng):
        prob, gt_poses, gt_invd = build_problem(rng, outlier_frac=0.15)
        res = local_ba(prob, CAM, iters=6, refine_iters=2)
        ang, dt = max_pose_err(res.poses, gt_poses)
        assert ang < 0.3 and dt < 0.03
        # pruned roughly the planted fraction
        frac_in = float(res.obs_inlier.sum() / prob.obs_valid.sum())
        assert 0.7 < frac_in < 0.95

    def test_constant_poses_untouched(self, rng):
        prob, gt_poses, _ = build_problem(rng)
        res = local_ba(prob, CAM, iters=4, refine_iters=1)
        for k in range(2):
            a = jax.tree.map(lambda x: x[k], res.poses)
            b = jax.tree.map(lambda x: x[k], prob.poses)
            ang, dt = pose_error(a, b)
            assert ang < 1e-4 and dt < 1e-6

    def test_invalid_landmarks_ignored(self, rng):
        prob, gt_poses, _ = build_problem(rng)
        # poison landmarks beyond K (unobserved) and mark half of them invalid
        bad_invd = prob.invdepth.at[K:].set(-5.0)
        lm_valid = prob.lm_valid.at[K + 16:].set(False)
        prob2 = prob._replace(invdepth=bad_invd, lm_valid=lm_valid)
        res = local_ba(prob2, CAM, iters=4, refine_iters=1)
        ang, dt = max_pose_err(res.poses, gt_poses)
        assert ang < 0.1 and dt < 0.01
        # untouched slots unchanged
        np.testing.assert_allclose(res.invdepth[K:], bad_invd[K:], atol=1e-6)

    def test_dead_keyframes_ignored(self, rng):
        prob, gt_poses, _ = build_problem(rng)
        kf_valid = prob.kf_valid.at[W - 1].set(False)
        obs_valid = prob.obs_valid.at[W - 1].set(False)
        res = local_ba(prob._replace(kf_valid=kf_valid, obs_valid=obs_valid),
                       CAM, iters=4, refine_iters=1)
        ang, dt = max_pose_err(res.poses, gt_poses, skip=2)
        # live poses still converge (ignore the dead one)
        errs = []
        for k in range(2, W - 1):
            a = jax.tree.map(lambda x: x[k], res.poses)
            b = jax.tree.map(lambda x: x[k], gt_poses)
            errs.append(pose_error(a, b))
        assert max(e[0] for e in errs) < 0.1


class TestResidualParity:
    def test_soa_residuals_match_vmapped_path(self, rng):
        """_residuals_fast (SoA component planes, the per-LM-iteration
        trial-cost pass) must agree with the autodiff path's
        with_jac=False residuals away from the z≈0 clamp."""
        from alvaar_tpu.solvers.ba import (_build_virtual, _residuals_fast,
                                           _residuals_jacobians)
        prob, _, _ = build_problem(rng)
        with jax.default_matmul_precision("float32"):
            vp = _build_virtual(prob, CAM)
            r0, _, z0 = jax.jit(lambda: _residuals_jacobians(
                vp, prob.poses, vp.lam_v, CAM, False))()
            r1, z1 = jax.jit(lambda: _residuals_fast(
                vp, prob.poses, vp.lam_v, CAM))()
        m = np.asarray(vp.valid) & (np.asarray(z0) > 0.5)
        assert m.sum() > 100
        np.testing.assert_allclose(np.asarray(r0)[m], np.asarray(r1)[m],
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(z0)[m], np.asarray(z1)[m],
                                   rtol=1e-5)
