"""Low-contrast tracking via the adaptive detector threshold.

The reference survives low-texture/low-light scenes by halving its
absolute Shi-Tomasi gate whenever detections fill <33% of the free cells
(reference src/slam/src/feature_extractor.cpp:136-145).  This drives the
engine over a heavily darkened synthetic sequence: at the stock initial
threshold (0.001 in cv::cornerMinEigenVal units) frame-0 detection is
starved, and only the fill-ratio adaptation recovers enough corners to
bootstrap and track."""

import numpy as np

from alvaar_tpu import AlvaAR, SlamConfig
from tests.render_scene import TwoPlaneScene, trajectory

CFG = SlamConfig(width=320, height=240, cell_size=24, window_size=10,
                 max_landmarks=512, ransac_iters=50, ba_iters=4,
                 init_parallax_px=25.0)

# contrast crush: full [0,255] range → ~8 gray levels around 100
SCALE, OFFSET = 0.03, 100.0


def darken(img):
    return (img.astype(np.float32) * SCALE + OFFSET).astype(np.float32)


class TestLowContrast:
    def test_initial_threshold_starves(self):
        """Sanity: at the stock threshold the darkened scene yields almost
        nothing — the scenario the adaptation exists for."""
        import jax.numpy as jnp
        from alvaar_tpu.ops.detect import detect_grid
        rng = np.random.default_rng(3)
        scene = TwoPlaneScene(rng, width=320, height=240, fov=60.0)
        gt = trajectory(2, step=0.04)
        img = darken(scene.render(gt[0]))
        det = detect_grid(jnp.asarray(img), jnp.zeros((0, 2)),
                          jnp.zeros(0, bool), cell=24, border=16,
                          quality=0.001)
        n_cells = det.valid.shape[0]
        assert int(det.valid.sum()) < 0.33 * n_cells
        assert float(det.new_quality) < 0.001  # adaptation kicked in

    def test_tracks_darkened_sequence(self):
        rng = np.random.default_rng(3)
        scene = TwoPlaneScene(rng, width=320, height=240, fov=60.0)
        gt = trajectory(40, step=0.04)
        slam = AlvaAR(320, 240, fov=60.0, config=CFG)
        statuses = []
        for i in range(len(gt)):
            slam.find_camera_pose(darken(scene.render(gt[i])))
            statuses.append(slam.last_status)
        assert 1 in statuses, f"never tracked: {statuses}"
        # adapted threshold must have dropped well below the initial gate
        assert float(slam.state.detect_quality) < 0.001
        # and once tracking, it keeps tracking (no resets after init)
        first = statuses.index(1)
        assert 2 not in statuses[first:], statuses
