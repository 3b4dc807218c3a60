"""Long-loop end-to-end: closure detection + world correction on a
self-crossing trajectory (BASELINE config 3 behavior; the reference
vendors iBoW-LCD but never links it, so everything here exceeds parity)."""

import numpy as np
import pytest

from alvaar_tpu import AlvaAR, SlamConfig
from tests.render_scene import TwoPlaneScene, trajectory

# init_parallax scaled to the synthetic scene's depth (5-8 m planes →
# ~15 px parallax apex on this trajectory; the production 40 px default
# assumes the reference's close-range tabletop scenes).
#
# kf_parallax_px=6: keyframe cadence must give the loop detector enough
# database entries on this SHORT (89-frame) out-and-back.  When this
# test was written (round 2) the detector starved tracks faster and the
# engine made ~8 keyframes here; the round-3 adaptive detector keeps
# more 3D points alive, which correctly HALVED the default cadence
# (fewer keyframes is better, reference checkNewKeyframeRequired
# semantics) — leaving too few delay-eligible entries for a loop that
# spans only ~45 frames.  Densifying via the public deep-scene cadence
# knob restores the scenario's scale; production-scale loops (the
# bench's 120-frame multistream workload, delay=50) are unaffected.
CFG = SlamConfig(width=320, height=240, cell_size=24, window_size=10,
                 max_landmarks=512, ransac_iters=50, ba_iters=4,
                 init_parallax_px=12.0, kf_parallax_px=6.0)


def out_and_back(n_half, step=0.04):
    """Go right for n_half frames, come back to the start — exact
    revisits of early viewpoints at the end."""
    fwd = trajectory(n_half, step=step)
    back = fwd[::-1]
    return np.concatenate([fwd, back[1:]], axis=0)


@pytest.fixture(scope="module")
def loop_run():
    rng = np.random.default_rng(11)
    scene = TwoPlaneScene(rng, width=320, height=240, fov=60.0)
    gt = out_and_back(45)
    slam = AlvaAR(320, 240, fov=60.0, config=CFG,
                  enable_loop_closure=True, loop_delay=4)
    loops, poses, statuses = [], [], []
    for i in range(len(gt)):
        T = slam.find_camera_pose(scene.render(gt[i]))
        poses.append(T)
        statuses.append(slam.last_status)
        if slam.last_loop is not None:
            loops.append((i, int(slam.last_loop.match_kf_id),
                          slam.last_loop_correction is not None))
    return gt, slam, poses, statuses, loops


class TestLoopClosure:
    def test_still_tracking(self, loop_run):
        _, _, _, statuses, _ = loop_run
        assert statuses.count(1) > 40, f"tracking broke: {statuses}"

    def test_loop_detected_on_revisit(self, loop_run):
        gt, _, _, _, loops = loop_run
        assert loops, "no loop detected on an exact revisit trajectory"
        # detection must happen in the second (return) half
        assert any(i >= len(gt) // 2 for i, _, _ in loops)

    def test_correction_applied_and_bounds_terminal_drift(self, loop_run):
        gt, slam, poses, statuses, loops = loop_run
        assert any(corr for _, _, corr in loops), \
            "loop detected but no geometric correction applied"
        # After closure the final pose must be near the starting point
        # (the trajectory returns exactly to gt[0]).  Monocular scale is
        # arbitrary (this file's relocalize test already says so), so
        # the comparison must be scale-free: estimate the map→gt scale
        # from the tracked trajectory spans, then bound the terminal
        # error as a fraction of the track length.
        idx = [i for i, s in enumerate(statuses)
               if s == 1 and poses[i] is not None]
        est_t = np.stack([poses[i][:3, 3] for i in idx])
        gt_t = gt[idx][:, :3, 3]
        # Umeyama sim3 alignment (same convention as utils/parity.py)
        mu_e, mu_g = est_t.mean(0), gt_t.mean(0)
        e, g = est_t - mu_e, gt_t - mu_g
        cov = g.T @ e / len(e)
        U, S, Vt = np.linalg.svd(cov)
        D = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            D[2, 2] = -1
        R = U @ D @ Vt
        s = np.trace(np.diag(S) @ D) / max((e * e).sum() / len(e), 1e-12)
        aligned = s * e @ R.T + mu_g
        err = float(np.linalg.norm(aligned[-1] - gt_t[-1]))
        track_len = 2 * 45 * 0.04
        assert err < 0.05 * track_len, \
            f"terminal drift {err:.3f} m (sim3-aligned, map scale " \
            f"{1 / max(s, 1e-9):.2f}x gt) over {track_len:.1f} m track"

    def test_relocalize_from_cold_lost_state(self, loop_run):
        """Feed the engine into a lost state, then ask relocalize() with
        a revisited view: fresh-detection matching against the loop DB
        must recover a pose near the ground truth."""
        gt, slam, _, _, _ = loop_run
        rng = np.random.default_rng(11)
        scene = TwoPlaneScene(rng, width=320, height=240, fov=60.0)
        # kill tracking with textureless frames
        for _ in range(6):
            slam.find_camera_pose(np.full((240, 320), 127.0, np.float32))
        # show a view from a revisited point and relocalize against the DB
        revisit = 20
        slam.find_camera_pose(scene.render(gt[revisit]))
        T = slam.relocalize()
        assert T is not None, "relocalization failed on a revisited view"
        # compare against the engine's OWN pose estimate for that frame
        # (same map gauge — monocular scale is arbitrary vs ground truth)
        _, _, poses, statuses, _ = loop_run
        ref = next(poses[i] for i in range(revisit, revisit + 6)
                   if statuses[i] == 1 and poses[i] is not None)
        err = np.linalg.norm(T[:3, 3] - ref[:3, 3])
        # bound is scale-aware: err is in MAP units (arbitrary monocular
        # gauge, stated above), so normalize by the map's own span
        _, _, poses_all, statuses_all, _ = loop_run
        est = np.stack([poses_all[i][:3, 3]
                        for i in range(len(statuses_all))
                        if statuses_all[i] == 1 and poses_all[i] is not None])
        span = np.linalg.norm(est.max(0) - est.min(0))
        assert err < 0.05 * span, (
            f"relocalized {err:.3f} map-units from own estimate "
            f"(map span {span:.2f})")
