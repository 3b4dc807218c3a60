"""Ceres-oracle validation of the local-BA solver and its gauge policy.

The reference's local BA is Ceres LM over SE3 pose blocks + anchored
inverse-depth landmarks (reference src/slam/src/optimizer.cpp:20-262).
Our solver (solvers/ba.py) re-derives the same problem as a scatter-free
masked LM on TPU.  These tests feed the IDENTICAL problem — same
parameterization, same Huber loss, same constant-pose flags — to the
natively-built Ceres 2.0 (tools/ref_native/build.sh + build_oracle.sh)
and check:

  1. solution quality: our robust cost is within 10% of fully-converged
     Ceres on a mid-run window;
  2. solution agreement: free poses land where Ceres puts them;
  3. the bootstrap gauge policy (second-oldest pose FREE while only two
     keyframes live — the documented divergence in
     worldmap/keyframe.py:build_ba_problem) is Ceres-sane: Ceres given
     the same free/constant flags converges to the same corrected pose,
     i.e. the policy's fix of skewed bootstraps is a property of the
     problem, not an artifact of our solver.

Skipped when the oracle binary is absent (build it once with
tools/ref_native/build.sh && tools/ref_native/build_oracle.sh).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "ref_native"))

import oracle_io  # noqa: E402

from alvaar_tpu import AlvaAR, SlamConfig  # noqa: E402
from alvaar_tpu.solvers.ba import (  # noqa: E402
    _build_virtual,
    _huber_rho,
    _residuals_jacobians,
    local_ba,
)
from alvaar_tpu.worldmap.keyframe import build_ba_problem  # noqa: E402
from tests.render_scene import TwoPlaneScene, trajectory  # noqa: E402

pytestmark = pytest.mark.skipif(
    not oracle_io.oracle_available(),
    reason="ba_oracle binary not built (tools/ref_native/build_oracle.sh)")

CFG = SlamConfig(width=320, height=240, cell_size=24, window_size=10,
                 max_landmarks=512, ransac_iters=50, ba_iters=4,
                 init_parallax_px=25.0, kf_parallax_px=12.0)


def robust_cost(prob, cam, delta):
    """Huber cost over all valid observations (matches ba_oracle output)."""
    import jax.numpy as jnp
    vp = _build_virtual(prob, cam)
    r, _, _ = _residuals_jacobians(vp, prob.poses, vp.lam_v, cam,
                                   with_jac=False)
    r2 = jnp.sum(r * r, axis=-1)
    return float(jnp.sum(jnp.where(vp.valid, _huber_rho(r2, delta), 0.0)))


def capture_states(n_frames, seed=3):
    """Run the synthetic e2e; return (state at 2 live keyframes, final
    state, camera)."""
    rng = np.random.default_rng(seed)
    scene = TwoPlaneScene(rng, width=320, height=240, fov=60.0)
    gt = trajectory(n_frames, step=0.04)
    slam = AlvaAR(320, 240, fov=60.0, config=CFG)
    boot_state = None
    for i in range(n_frames):
        slam.find_camera_pose(scene.render(gt[i]))
        n_live = int(np.asarray(slam.state.kf_valid).sum())
        if boot_state is None and n_live == 2:
            boot_state = slam.state
    return boot_state, slam.state, slam.camera


@pytest.fixture(scope="module")
def states():
    return capture_states(16)


def _apply_oracle(prob, q, t, ilam):
    """BAProblem with the oracle's solution substituted."""
    import jax.numpy as jnp
    from alvaar_tpu.geom.lie import SE3
    invd = np.asarray(prob.invdepth).copy()
    for lm, v in ilam.items():
        invd[lm] = v
    poses = SE3(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))
    return prob._replace(poses=poses.normalize(),
                         invdepth=jnp.asarray(invd, jnp.float32))


def solve_both(state, cam, tmp_path, tag, ceres_iters=30):
    prob = build_ba_problem(state, CFG)
    n_obs = int(np.asarray(prob.obs_valid).sum())
    assert n_obs > 50, f"{tag}: degenerate problem ({n_obs} obs)"

    ours = local_ba(prob, cam, iters=CFG.ba_iters, refine_iters=2,
                    huber_delta=CFG.huber_thresh)

    f = str(tmp_path / f"{tag}.txt")
    oracle_io.export_problem(prob, cam, CFG.huber_thresh, ceres_iters, f)
    cost_c, q_c, t_c, ilam_c = oracle_io.run_oracle(f)

    prob_ours = prob._replace(poses=ours.poses, invdepth=ours.invdepth)
    prob_ceres = _apply_oracle(prob, q_c, t_c, ilam_c)
    delta = CFG.huber_thresh
    return (prob, ours, robust_cost(prob_ours, cam, delta),
            robust_cost(prob_ceres, cam, delta), q_c, t_c)


class TestCeresOracle:
    def test_midrun_window_matches_ceres(self, states, tmp_path):
        _, final_state, cam = states
        prob, ours, cost_ours, cost_ceres, q_c, t_c = solve_both(
            final_state, cam, tmp_path, "midrun")

        # 1. solution quality: within 10% of converged Ceres (f32 vs f64,
        #    budgeted iterations vs convergence, split virtual landmarks)
        assert cost_ours <= 1.10 * cost_ceres + 1e-3, (
            f"our cost {cost_ours:.4f} vs ceres {cost_ceres:.4f}")

        # 2. free poses agree with Ceres
        kf_valid = np.asarray(prob.kf_valid)
        constant = np.asarray(prob.constant)
        ours_t = np.asarray(ours.poses.t)
        ours_q = np.asarray(ours.poses.q)
        scale = 1.0  # scene depth ~5 world units; tolerances absolute
        for w in range(len(kf_valid)):
            if not kf_valid[w] or constant[w]:
                continue
            dt = np.linalg.norm(ours_t[w] - t_c[w])
            dq = min(np.linalg.norm(ours_q[w] - q_c[w]),
                     np.linalg.norm(ours_q[w] + q_c[w]))
            ang = 2 * np.degrees(np.arcsin(np.clip(dq / 2, -1, 1)))
            assert dt <= 2e-3 * scale, f"kf {w}: |dt|={dt:.2e}"
            assert ang <= 0.1, f"kf {w}: rot diff {ang:.3f} deg"

    def test_bootstrap_gauge_policy_is_ceres_sane(self, states, tmp_path):
        boot_state, _, cam = states
        assert boot_state is not None, "never hit the 2-keyframe stage"
        prob, ours, cost_ours, cost_ceres, q_c, t_c = solve_both(
            boot_state, cam, tmp_path, "bootstrap")

        # the documented divergence must be in effect: exactly one free pose
        kf_valid = np.asarray(prob.kf_valid)
        constant = np.asarray(prob.constant)
        free = kf_valid & ~constant
        assert free.sum() == 1, f"expected 1 free pose, got {free.sum()}"
        w = int(np.argmax(free))

        # Ceres, given the same flags, accepts and refines that pose to
        # the same place our solver does
        assert cost_ours <= 1.10 * cost_ceres + 1e-3, (
            f"our cost {cost_ours:.4f} vs ceres {cost_ceres:.4f}")
        dt = np.linalg.norm(np.asarray(ours.poses.t)[w] - t_c[w])
        assert dt <= 2e-3, f"bootstrap free pose: |dt|={dt:.2e}"
