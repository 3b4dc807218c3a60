"""SLAM configuration.

TPU-native equivalent of the reference's single ``State`` struct of tunables
(reference src/slam/src/state.hpp:29-78 and the FAST/AVERAGE/ACCURATE preset
table at state.hpp:9-17).  Unlike the reference — where State is a mutable
object threaded through every subsystem — this is a frozen, hashable
dataclass used as a *static* argument to ``jax.jit``: changing a field
recompiles the step function, which is the XLA-correct way to handle
"flags" that alter control flow or shapes.

Shape-determining fields (max_keypoints, max_landmarks, window size, …) are
derived once here; every downstream array in the state pytree has a static
shape computed from them.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    # ---- image geometry -------------------------------------------------
    width: int = 640
    height: int = 480
    # ROI border in pixels inside which keypoints are valid
    # (reference camera_calibration.cpp:20-22, border 20 at system.cpp:29).
    image_border: int = 20

    # ---- feature detection ----------------------------------------------
    # Grid cell size; one keypoint per cell max
    # (reference system.cpp:15 sets 40; state.cpp:8-11 derives the budget).
    cell_size: int = 40
    # Shi-Tomasi quality: INITIAL absolute min-eig threshold in
    # cv::cornerMinEigenVal 8-bit units (reference extractorMaxQuality_
    # init, state.hpp:59); adapted at runtime by cell fill ratio
    # (feature_extractor.cpp:136-145) — the live value is
    # MapState.detect_quality.
    detector_quality: float = 0.001
    # CLAHE off by default (reference system.cpp:17)
    use_clahe: bool = False
    clahe_clip: float = 3.0

    # ---- KLT tracking (reference state.hpp:47-58) ------------------------
    pyramid_levels: int = 3
    klt_window: int = 9          # 9x9 window
    # GN iteration budget per level.  The reference's 30
    # (state.hpp:47-58) is a MAX with per-point early exit; our unrolled
    # SIMD loop pays every iteration, with converged points frozen by the
    # eps test.  Measured on the golden sequences, iterations beyond 16
    # are frozen no-ops for every surviving track — trajectories are
    # bit-identical at 16 vs 30 (ATE 0.759 cm, 107/120 tracked, both) —
    # so 16 fixed matches the reference's EFFECTIVE behavior at ~55% of
    # the step cost; set 30 for strict budget parity.
    klt_iters: int = 16
    klt_eps: float = 0.01
    klt_err_max: float = 30.0    # max mean abs intensity residual
    klt_fb_dist: float = 0.5     # forward-backward round-trip gate, px
    klt_prior_levels: int = 1    # 3D points tracked from motion prior at 1 level
                                 # (reference visual_frontend.cpp:162-171)
    # Pyramid level KLT tracking runs at (0 = native resolution).  At HD
    # resolutions the patch-extraction cost scales with image area (the
    # one-hot MXU gathers contract against the full [H, W] image,
    # ops/image.py:133), so hd_serving tracks at level 1 (half-res):
    # a 4x area cut on every KLT extraction while detection and keypoint
    # coordinates stay native-resolution.  The KLT window then covers 2x
    # the native-pixel context, and the forward-backward gate (klt_fb_dist,
    # in tracking-level pixels) is correspondingly ~2x more lenient in
    # native pixels — acceptable at HD where each feature spans more
    # pixels to begin with.
    track_base_level: int = 0
    # Stage-2 KLT retry sub-batch (None = retry on all K slots).  The
    # full-pyramid stage-2 pass only matters for slots the motion-prior
    # stage could not serve (2D keypoints + stage-1 failures — the
    # reference's retry set is likewise failures-only,
    # visual_frontend.cpp:186-220); compacting them into a fixed smaller
    # slot count halves the lane footprint of the most expensive kernel.
    # When the demand exceeds the cap (bootstrap, post-keyframe detection
    # spikes) a runtime ``lax.cond`` falls back to the full-width pass —
    # a real branch in the single-stream program; the vmapped serving
    # path ignores the cap (a vmapped cond pays both sides).
    # Default K/4: golden-trajectory runs are BIT-IDENTICAL to the
    # uncapped pass (under-cap frames compute the same values, overflow
    # frames take the full-width branch) at ~7% higher single-stream fps
    # (355.6 -> 382.3 measured on v5e); None disables.
    klt_stage2_slots: int | None = 48

    # ---- robust estimation (reference state.hpp:68-69) -------------------
    ransac_iters: int = 100
    ransac_err_px: float = 3.0
    init_min_inliers: int = 10   # 5-pt essential gate (multi_view_geometry.cpp:283)
    use_five_point: bool = True  # Nister 5-pt minimal solver at bootstrap
                                 # (reference fivept_nister; False = 8-point)
    use_homography_init: bool = True  # ORB-SLAM-style H/E model selection
                                      # at bootstrap (beyond the reference's
                                      # essential-only init)
    p3p_min_inliers: int = 5     # p3p gate (visual_frontend.cpp:304-357)
    use_p3p: bool = True         # reference system.cpp:19

    # ---- solver budgets ---------------------------------------------------
    # Motion-only PnP LM iterations.  The reference caps at 5
    # (mvg.cpp:184).  Measured on v5e within one process: 4 iters is
    # +4% single-stream and +1% serving fps over 5 with IDENTICAL
    # accuracy everywhere (multistream B=16 median ATE 1.806 vs
    # 1.807 cm, single 0.760 vs 0.759 cm, same tracked counts); 3 iters
    # is faster still (+6%) but degrades the multistream median ATE
    # 1.81 -> 2.22 cm (recovery P3P re-convergence needs the 4th
    # iteration under the batched serving scheduler).  Set 5 for exact
    # reference-budget parity.
    pnp_iters: int = 4
    ba_iters: int = 5            # local BA LM iterations (optimizer.cpp:256)
    huber_thresh: float = math.sqrt(5.9915)  # chi2 95% 2-dof (mvg.cpp:160)
    ba_min_covisibility: int = 25            # constant-pose gate (optimizer.cpp:94)

    # ---- keyframe / map policy -------------------------------------------
    window_size: int = 30        # keyframe ring buffer (mapper.cpp:14-18)
    max_landmarks: int = 4096    # landmark pool size (fixed-shape)
    desc_bag_size: int = 6       # per-landmark descriptor bag (ring); the
                                 # representative is the bag medoid
                                 # (reference map_point.cpp:131-181)
    kf_filtering_ratio: float = 0.95  # redundancy filter (system.cpp:18)
    triang_max_reproj_px: float = 3.0  # temporal triangulation gate (mapper.cpp:230)
    match_nndr: float = 0.9        # Hamming best/second ratio (mapper.cpp:478)
    match_max_hamming: float = 51.2  # max descriptor distance for a match
                                     # (reference state.hpp:62: 0.2 * 256 bits)

    # ---- bootstrap gates (state.hpp:37, visual_frontend.cpp:56-60) --------
    init_parallax_px: float = 40.0
    # Keyframe-cadence parallax threshold; the reference reuses the
    # bootstrap constant (visual_frontend.cpp:587 minAvgRotationParallax_)
    # — None keeps that parity.  Deep scenes want a lower cadence gate
    # than the bootstrap-baseline gate (docs/ROADMAP.md accuracy notes).
    kf_parallax_px: float | None = None
    min_init_keypoints: int = 50
    max_pose_failures: int = 3

    # ---- plane detection (system.cpp:181,229,269) -------------------------
    plane_iters: int = 250
    plane_min_points: int = 32
    plane_max_tilt_deg: float = 5.0
    plane_inlier_scale: float = 1.4

    # ---- compute ------------------------------------------------------------
    dtype: str = "float32"
    # Fused Pallas LK kernel (ops/pallas/lk_kernel.py): blend + Hessian +
    # correlation volumes + GN + error in one Mosaic program with explicit
    # point-minor layout — ~4x faster than the XLA path at stream-batch 16.
    # Used when a TPU backend is present (pure-XLA fallback elsewhere).
    use_pallas: bool = True
    seed: int = 0                # deterministic PRNG (reference is nondeterministic,
                                 # system.cpp:210 std::random_device — we diverge)

    # ------------------------------------------------------------------
    @property
    def grid_cells(self) -> Tuple[int, int]:
        """(rows, cols) of the detection grid."""
        return (_cdiv(self.height, self.cell_size), _cdiv(self.width, self.cell_size))

    @property
    def max_keypoints(self) -> int:
        """Keypoint budget = number of grid cells (reference state.cpp:8-11)."""
        r, c = self.grid_cells
        return r * c

    @property
    def pyr_shapes(self) -> Tuple[Tuple[int, int], ...]:
        """Static (h, w) of each pyramid level."""
        shapes = []
        h, w = self.height, self.width
        for _ in range(self.pyramid_levels):
            shapes.append((h, w))
            h, w = (h + 1) // 2, (w + 1) // 2
        return tuple(shapes)


# Presets mirroring the reference table (state.hpp:9-17).
FAST = SlamConfig(cell_size=50, klt_iters=20, ransac_iters=50, ba_iters=3)
AVERAGE = SlamConfig()
ACCURATE = SlamConfig(cell_size=30, klt_iters=30, ransac_iters=200, ba_iters=10)


def hd_serving(width: int = 1920, height: int = 1080) -> SlamConfig:
    """High-resolution serving preset (BASELINE config 5): the grid cell
    scales with resolution so the FEATURE budget stays near the 640x480
    level (1920/96 x 1080/96 -> ~220 cells) instead of growing 6.75x
    with the pixel count — higher resolution buys keypoint precision and
    robustness, not more landmarks, and the per-stream KLT/BA/matching
    cost stays near the 480p cost.  (The reference's fixed 40 px cell is
    a 480p-era constant: state.cpp:8-11 derives the budget from the
    image size, so its CPU cost balloons at HD too.)  cell=96 measured
    vs 80 at 1080p B=4 on v5e: +18% aggregate fps AND slightly better
    ATE (0.527 vs 0.555 cm) at identical tracked counts."""
    cell = max(40, int(round(width / 20)))
    return SlamConfig(width=width, height=height, cell_size=cell,
                      track_base_level=1)
