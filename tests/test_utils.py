"""Utility-layer tests: view/overlay helpers and the stage profiler."""

import numpy as np
import pytest

from alvaar_tpu.utils.view import draw_points, project_axes


class TestViewHelpers:
    def test_draw_points_burns_markers(self):
        img = draw_points(np.zeros((48, 64), np.float32),
                          [[10, 10], [60, 40]], radius=1)
        assert img[10, 10] == 255 and img[40, 60] == 255
        assert img[0, 0] == 0
        # out-of-bounds points are ignored
        img2 = draw_points(np.zeros((8, 8), np.float32), [[99, 99]])
        assert img2.max() == 0

    def test_project_axes_identity(self):
        px = project_axes(np.eye(4), 500.0, 500.0, 320.0, 240.0, scale=0.2)
        # world origin is behind an identity camera (z=0 clamps to eps);
        # the +z endpoint projects to the principal point
        assert px.shape == (4, 2)
        np.testing.assert_allclose(px[3], [320.0, 240.0], atol=1e-3)

    def test_render_map_writes_png(self, tmp_path):
        pytest.importorskip("matplotlib")
        from alvaar_tpu.utils.view import render_map
        p = str(tmp_path / "m.png")
        out = render_map(np.random.randn(50, 3),
                         np.random.uniform(0, 255, 50),
                         trajectory=[np.eye(4)], path=p)
        import os
        assert os.path.getsize(out) > 1000


class TestProfiler:
    def test_profile_step_reports_stages(self):
        import jax.numpy as jnp

        from alvaar_tpu.config import SlamConfig
        from alvaar_tpu.geom.camera import Camera
        from alvaar_tpu.utils.profiling import profile_step
        from alvaar_tpu.worldmap.state import init_map_state

        cfg = SlamConfig(width=128, height=96, cell_size=32, window_size=4,
                         max_landmarks=64, ransac_iters=8, ba_iters=1,
                         pyramid_levels=2, klt_iters=3,
                         use_five_point=False)
        cam = Camera.from_fov(cfg.width, cfg.height, 60.0)
        state = init_map_state(cfg)
        gray = jnp.zeros((cfg.height, cfg.width), jnp.float32)
        out = profile_step(state, gray, cam, cfg, reps=1)
        for k in ("preprocess", "track", "keyframe_pipeline", "finalize",
                  "full_step"):
            assert k in out and out[k] >= 0.0


class TestWindowedParity:
    """Per-segment parity analysis (utils/parity.windowed_parity) against
    the recorded reference-video goldens."""

    def _golden(self):
        from alvaar_tpu.utils.parity import load_golden
        g = load_golden("ref_video.npz")
        if g is None:
            pytest.skip("ref_video.npz golden absent")
        return g

    def test_reference_run_is_inside_its_own_envelope(self):
        from alvaar_tpu.utils.parity import windowed_parity
        g = self._golden()
        wp = windowed_parity(g["status"][0], g["poses"][0], "ref_video.npz")
        assert wp is not None and len(wp["windows"]) >= 5
        # run 0 scores ATE=0 against itself in every window
        assert wp["worst_ratio"] < 1e-6 and wp["inside_envelope"]

    def test_large_perturbation_leaves_envelope(self):
        from alvaar_tpu.utils.parity import windowed_parity
        g = self._golden()
        poses = np.array(g["poses"][0], np.float64)
        idx = np.where(np.asarray(g["status"][0]) == 1)[0]
        span = np.linalg.norm(poses[idx][:, :3, 3].max(0)
                              - poses[idx][:, :3, 3].min(0))
        rng = np.random.default_rng(0)
        poses[:, :3, 3] += rng.normal(scale=2.0 * span, size=(len(poses), 3))
        wp = windowed_parity(g["status"][0], poses, "ref_video.npz")
        assert wp is not None and not wp["inside_envelope"]
