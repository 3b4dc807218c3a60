"""System-facade extras: presets, CLAHE path, plane iterations, wire
format."""

import dataclasses

import numpy as np
import pytest

import alvaar_tpu.config as cfgmod
from alvaar_tpu import AlvaAR, SlamConfig
from alvaar_tpu.system import pose_to_array
from tests.render_scene import TwoPlaneScene, trajectory


def small(base, **kw):
    return dataclasses.replace(
        base, width=192, height=128, cell_size=24, window_size=4,
        max_landmarks=128, ransac_iters=16, ba_iters=2, pyramid_levels=2,
        min_init_keypoints=8, init_parallax_px=12.0, **kw)


class TestPresets:
    @pytest.mark.parametrize("preset", [cfgmod.FAST, cfgmod.AVERAGE,
                                        cfgmod.ACCURATE])
    def test_presets_run(self, preset, rng):
        cfg = small(preset)
        slam = AlvaAR(192, 128, config=cfg)
        scene = TwoPlaneScene(rng, width=192, height=128, fov=60.0)
        gt = trajectory(3, step=0.05)
        for i in range(3):
            slam.find_camera_pose(scene.render(gt[i]))
        assert slam.last_status in (1, 2, 3)

    def test_clahe_path(self, rng):
        cfg = small(SlamConfig(), use_clahe=True)
        slam = AlvaAR(192, 128, config=cfg)
        scene = TwoPlaneScene(rng, width=192, height=128, fov=60.0)
        gt = trajectory(3, step=0.05)
        for i in range(3):
            slam.find_camera_pose(scene.render(gt[i]) * 0.3 + 80.0)  # low contrast
        assert slam.get_frame_points().shape[0] > 0


class TestWireFormat:
    def test_pose_to_array_column_major(self):
        T = np.arange(16, dtype=np.float32).reshape(4, 4)
        a = pose_to_array(T)
        # column-major: first 4 entries are the first COLUMN
        np.testing.assert_array_equal(a[:4], T[:, 0])
        assert a.shape == (16,)

    def test_find_plane_iteration_arg(self, rng):
        cfg = small(SlamConfig())
        slam = AlvaAR(192, 128, config=cfg)
        slam.find_camera_pose(
            np.asarray(rng.uniform(0, 255, (128, 192)), np.float32))
        # no 3D points yet → None, but both iteration counts must compile
        assert slam.find_plane(16) is None
        assert slam.find_plane(32) is None
        assert set(slam._find_plane_cache.keys()) == {16, 32}
