"""End-to-end golden-trajectory tests through the public AlvaAR API
(the automated equivalent of the reference's video.html manual check,
SURVEY §4)."""

import numpy as np
import pytest

from alvaar_tpu import AlvaAR, SlamConfig
from tests.render_scene import TwoPlaneScene, ate_rmse, trajectory

# small config so CPU test compiles/runs fast
CFG = SlamConfig(width=320, height=240, cell_size=24, window_size=10,
                 max_landmarks=512, ransac_iters=50, ba_iters=4,
                 init_parallax_px=25.0)


@pytest.fixture(scope="module")
def scene_and_run():
    rng = np.random.default_rng(42)
    scene = TwoPlaneScene(rng, width=320, height=240, fov=60.0)
    gt = trajectory(40, step=0.04)
    slam = AlvaAR(320, 240, fov=60.0, config=CFG)
    poses, statuses = [], []
    for i in range(len(gt)):
        img = scene.render(gt[i])
        T = slam.find_camera_pose(img)
        statuses.append(slam.last_status)
        poses.append(T)
    return scene, gt, slam, poses, statuses


class TestEndToEnd:
    def test_initializes(self, scene_and_run):
        _, _, _, poses, statuses = scene_and_run
        assert 1 in statuses, f"never started tracking: {statuses}"
        first_track = statuses.index(1)
        assert first_track < 25, f"init too slow: frame {first_track}"

    def test_no_resets(self, scene_and_run):
        _, _, _, _, statuses = scene_and_run
        assert 2 not in statuses, f"tracking reset occurred: {statuses}"

    def test_trajectory_accuracy(self, scene_and_run):
        _, gt, _, poses, statuses = scene_and_run
        idx = [i for i, s in enumerate(statuses) if s == 1 and poses[i] is not None]
        assert len(idx) >= 15
        est_t = np.stack([poses[i][:3, 3] for i in idx])
        gt_t = gt[idx][:, :3, 3]
        ate = ate_rmse(est_t, gt_t)
        track_len = np.linalg.norm(gt_t[-1] - gt_t[0])
        # the BASELINE 1%-class bar (measured ~0.45% on this seed after
        # the bootstrap refit + two-view BA landed; multi-seed spread in
        # tests/test_accuracy_sweep.py)
        assert ate < 0.01 * track_len, \
            f"ATE {ate:.4f} m over {track_len:.2f} m (≥1%)"

    def test_frame_points(self, scene_and_run):
        _, _, slam, _, _ = scene_and_run
        pts = slam.get_frame_points()
        assert pts.shape[0] > 20
        assert (pts[:, 0] >= 0).all() and (pts[:, 0] < 320).all()

    def test_reset_and_reinit(self, scene_and_run):
        scene, gt, slam, _, _ = scene_and_run
        slam.reset()
        assert slam.find_camera_pose(scene.render(gt[0])) is None  # frame 0 → status 3
        statuses = []
        for i in range(25):
            slam.find_camera_pose(scene.render(gt[i]))
            statuses.append(slam.last_status)
        assert 1 in statuses  # re-initialized after reset
