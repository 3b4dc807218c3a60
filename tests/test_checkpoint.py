"""Map save/load round-trip and resume-tracking tests (capability beyond
the reference, which loses its map on page reload — SURVEY §5)."""

import numpy as np
import pytest

from alvaar_tpu import AlvaAR, SlamConfig
from alvaar_tpu.io.checkpoint import load_map, save_map, saved_config
from tests.render_scene import TwoPlaneScene, trajectory

CFG = SlamConfig(width=320, height=240, cell_size=24, window_size=10,
                 max_landmarks=512, ransac_iters=50, ba_iters=4,
                 init_parallax_px=25.0)


@pytest.fixture(scope="module")
def tracked_slam():
    rng = np.random.default_rng(7)
    scene = TwoPlaneScene(rng, width=320, height=240, fov=60.0)
    gt = trajectory(30, step=0.04)
    slam = AlvaAR(320, 240, fov=60.0, config=CFG)
    for i in range(len(gt)):
        slam.find_camera_pose(scene.render(gt[i]))
    assert slam.last_status == 1, "harness never reached tracking"
    return scene, gt, slam


class TestCheckpoint:
    def test_roundtrip_exact(self, tracked_slam, tmp_path):
        _, _, slam = tracked_slam
        p = str(tmp_path / "map.npz")
        save_map(p, slam.state, slam.config)
        restored = load_map(p, slam.config)
        for a, b in zip(*map(lambda s: __import__("jax").tree.leaves(s),
                             (slam.state, restored))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_saved_config(self, tracked_slam, tmp_path):
        _, _, slam = tracked_slam
        p = str(tmp_path / "map.npz")
        save_map(p, slam.state, slam.config)
        assert saved_config(p) == slam.config

    def test_resume_tracking(self, tracked_slam, tmp_path):
        scene, gt, slam = tracked_slam
        p = str(tmp_path / "map.npz")
        save_map(p, slam.state, slam.config)

        # "restart": a fresh engine, state swapped in from disk
        slam2 = AlvaAR(320, 240, fov=60.0, config=CFG)
        slam2.state = load_map(p, CFG)
        gt2 = trajectory(40, step=0.04)
        statuses, poses = [], []
        for i in range(30, 40):
            T = slam2.find_camera_pose(scene.render(gt2[i]))
            statuses.append(slam2.last_status)
            poses.append(T)
        assert statuses.count(1) >= 8, f"resume failed: {statuses}"
        # pose continuity: first resumed pose is near the last saved one
        ref_t = np.asarray(slam.state.pose.inverse().t)
        got_t = poses[0][:3, 3]
        assert np.linalg.norm(got_t - ref_t) < 0.2

    def test_shape_mismatch_rejected(self, tracked_slam, tmp_path):
        _, _, slam = tracked_slam
        p = str(tmp_path / "map.npz")
        save_map(p, slam.state, slam.config)
        other = SlamConfig(width=640, height=480)
        with pytest.raises(ValueError, match="mismatch"):
            load_map(p, other)
